"""Model-layer aux checks: elastic closed form, hyperelastic stress,
Hill frame-rotation invariance, yield-function oracles, NN modules.

Mirrors reference tests/models + tests/neural_networks intent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import tree_map

from cmad_tpu.models.effective_stress import (
    J2_effective_stress,
    barlat_effective_stress,
    hill_effective_stress,
    hosford_effective_stress,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.elastic_potential import (
    compressible_neohookean_potential,
    compute_cauchy_from_psi_b,
)
from cmad_tpu.models.elastic_stress import (
    compressible_neohookean_cauchy_stress,
)
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.verification.functions import (
    J2_yield,
    J2_yield_normal,
    hill_yield,
    hill_yield_normal,
    jax_hill_yield,
)

from tests.support.drivers import run_strain_controlled_history
from tests.support.problems import J2AnalyticalProblem, params_hyperelastic


def _random_sym(rng, scale=100.0):
    A = rng.normal(size=(3, 3)) * scale
    return 0.5 * (A + A.T)


def test_elastic_solve_matches_closed_form():
    params = Parameters({"elastic": {"E": 1000.0, "nu": 0.3}})
    model = Elastic(params)
    solve = make_newton_solve(model.residual_fun)
    F = jnp.eye(3) + 0.01 * jnp.asarray(
        np.random.RandomState(0).normal(size=(3, 3)))
    U = mp_U_from_F(F)
    U0 = mp_U_from_F(jnp.eye(3))
    xi = solve(model.init_xi(), model.init_xi(), params.values, U, U0)
    sigma = model.cauchy(xi, model.init_xi(), params.values, U, U0)
    sigma_cf = model.cauchy_closed_form(params.values, U, U0)
    assert np.allclose(np.asarray(sigma), np.asarray(sigma_cf), atol=1e-12)


def test_neohookean_stress_matches_potential_derivation():
    """The hand-written neo-Hookean Cauchy stress equals the AD-derived
    stress from its potential (grad of psi wrt invariants of b)."""
    params = params_hyperelastic([10.0, 3.0]).values
    F = jnp.eye(3) + 0.1 * jnp.asarray(
        np.random.RandomState(1).normal(size=(3, 3)))
    sigma_direct = compressible_neohookean_cauchy_stress(F, params)
    sigma_from_psi = compute_cauchy_from_psi_b(
        F, params, compressible_neohookean_potential)
    assert np.allclose(np.asarray(sigma_direct),
                       np.asarray(sigma_from_psi), atol=1e-10)


def test_hill_rotation_invariance():
    """A Hill model with a rotated material frame produces the rotated
    response: sigma(Q) == Q sigma(I) Q^T under the rotated drive."""
    problem = J2AnalyticalProblem(scale_params=False)
    mask = np.zeros((3, 3))
    mask[0, 0] = 1.0
    stress, strain, _ = problem.analytical_solution(mask, 0.1, 10)
    F = np.repeat(np.eye(3)[:, :, None], 11, axis=2)
    F[:, :, 1:] += strain

    # unrotated run
    model_I = SmallRateElasticPlastic(problem.hill_parameters)
    cauchy_I, _ = run_strain_controlled_history(model_I, F)

    # rotated material frame + rotated drive
    theta = 0.4
    Q = np.array([[np.cos(theta), -np.sin(theta), 0.0],
                  [np.sin(theta), np.cos(theta), 0.0],
                  [0.0, 0.0, 1.0]])
    params_Q = J2AnalyticalProblem(scale_params=False).hill_parameters
    params_Q.set_rotation_matrix(Q)
    model_Q = SmallRateElasticPlastic(params_Q)
    F_rot = np.einsum("ij,jkt,lk->ilt", Q, F, Q)
    cauchy_Q, _ = run_strain_controlled_history(model_Q, F_rot)

    expected = np.einsum("ij,jkt,lk->ilt", Q, cauchy_I, Q)
    assert np.abs(cauchy_Q - expected).max() < 1e-6 * np.abs(
        expected).max()


def test_yield_oracles_agree_with_jax_forms():
    rng = np.random.RandomState(2)
    for _ in range(5):
        s = _random_sym(rng)
        assert np.isclose(float(J2_effective_stress(jnp.asarray(s))),
                          J2_yield(s))
        n = J2_yield_normal(s)
        n_ad = np.asarray(jax.grad(J2_effective_stress)(jnp.asarray(s)))
        assert np.allclose(0.5 * (n_ad + n_ad.T), n, atol=1e-10)

        hill = (0.7, 0.5, 0.6, 1.4, 1.6, 1.5)
        params = {"effective stress": {"hill": dict(
            zip("FGHLMN", hill, strict=True))}}
        # jax form uses both mirror entries (L*(s12^2+s21^2) == 2L s12^2)
        assert np.isclose(
            float(hill_effective_stress(jnp.asarray(s), params)),
            hill_yield(s, hill))
        assert np.isclose(float(jax_hill_yield(jnp.asarray(s), hill)),
                          hill_yield(s, hill))
        n_hill = np.asarray(
            jax.grad(hill_effective_stress)(jnp.asarray(s), params))
        assert np.allclose(0.5 * (n_hill + n_hill.T),
                           hill_yield_normal(s, hill), atol=1e-10)


def test_hosford_limits():
    rng = np.random.RandomState(3)
    s = np.diag(rng.normal(size=3) * 100.0)
    params2 = {"effective stress": {"hosford": {"a": 2.0}}}
    phi2 = float(hosford_effective_stress(jnp.asarray(s), params2))
    assert np.isclose(phi2, J2_yield(s), rtol=1e-10)
    # large exponent approaches Tresca
    params_inf = {"effective stress": {"hosford": {"a": 200.0}}}
    phi_inf = float(hosford_effective_stress(jnp.asarray(s), params_inf))
    eigs = np.sort(np.diag(s))
    tresca = eigs[-1] - eigs[0]
    assert abs(phi_inf - tresca) / tresca < 0.02


def test_barlat_reduces_to_tresca_like_form():
    """With all transform coefficients 1 the two linear transforms equal
    the deviator, and the a=2 Barlat form reduces to von Mises."""
    coeffs = {k: 1.0 for k in (
        "sp_12", "sp_13", "sp_21", "sp_23", "sp_31", "sp_32",
        "sp_44", "sp_55", "sp_66",
        "dp_12", "dp_13", "dp_21", "dp_23", "dp_31", "dp_32",
        "dp_44", "dp_55", "dp_66")}
    coeffs["a"] = 2.0
    params = {"effective stress": {"barlat": coeffs}}
    rng = np.random.RandomState(4)
    s = _random_sym(rng)
    phi = float(barlat_effective_stress(jnp.asarray(s), params))
    # Yld2004-18p with identity transforms at a=2:
    # phi = sqrt(1/4 sum_ij (l_i - l_j)^2) over deviator eigenvalues
    # = sqrt(3/2)||dev|| * sqrt(...); check against direct eigen formula
    dev = s - np.trace(s) / 3.0 * np.eye(3)
    ev = np.linalg.eigvalsh(dev)
    expected = np.sqrt(0.25 * sum((a - b) ** 2
                                  for a in ev for b in ev))
    assert np.isclose(phi, expected, rtol=1e-8)


def test_simple_nn_and_icnn_shapes():
    from cmad_tpu.neural_networks.input_convex_neural_network import (
        AffineScaler,
        InputConvexNeuralNetwork,
    )
    from cmad_tpu.neural_networks.simple_neural_network import (
        SimpleNeuralNetwork,
    )

    nn = SimpleNeuralNetwork([6, 8, 1])
    x = jnp.asarray(np.random.RandomState(5).normal(size=6))
    out = nn.evaluate(x, nn.params)
    assert out.shape == (1,)
    # zero-centered: f(0) == 0
    assert np.isclose(float(nn.evaluate(jnp.zeros(6), nn.params)[0]), 0.0)

    samples = np.random.RandomState(6).normal(size=(100, 6))
    in_scaler = AffineScaler().fit(samples)
    out_scaler = AffineScaler().fit(
        np.random.RandomState(7).normal(size=(100, 1)))
    icnn = InputConvexNeuralNetwork([6, 8, 8, 1], in_scaler, out_scaler)
    params = {"x params": icnn.x_params, "z params": icnn.z_params}
    y1 = icnn.evaluate(x, params)
    assert y1.shape == (1,)
    # the symmetrized core is even in its (scaled) input and zero at 0
    from cmad_tpu.neural_networks.input_convex_neural_network import (
        input_symmetric_forward,
    )
    g1 = input_symmetric_forward(x, params)
    g2 = input_symmetric_forward(-x, params)
    assert np.isclose(float(g1[0]), float(g2[0]))
    assert np.isclose(
        float(input_symmetric_forward(jnp.zeros(6), params)[0]), 0.0)


def test_hybrid_hill_nn_effective_stress_runs():
    from cmad_tpu.models.effective_stress import (
        hybrid_hill_effective_stress,
    )
    from cmad_tpu.neural_networks.simple_neural_network import (
        SimpleNeuralNetwork,
        forward_with_offset,
    )
    from functools import partial

    nn = SimpleNeuralNetwork([6, 4, 1], input_scale=1e-2,
                             output_scale=10.0)
    nn_fun = partial(forward_with_offset, input_scale=1e-2,
                     output_scale=10.0)
    params = {"effective stress": {
        "hill": dict(zip("FGHLMN", [0.5] * 6, strict=True)),
        "neural network": nn.params}}
    s = jnp.asarray(_random_sym(np.random.RandomState(8)))
    phi = hybrid_hill_effective_stress(s, params, nn_fun)
    assert np.isfinite(float(phi))
    g = jax.grad(hybrid_hill_effective_stress)(s, params, nn_fun)
    assert np.all(np.isfinite(np.asarray(g)))
