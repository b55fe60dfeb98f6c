"""The reduced scalar Hill local solve matches the generic 7-dof
IFT-Newton kernel (states and tangents), for both model families,
including non-identity material rotations."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.ops.hill_return import hill_kind, make_hill_local_solve
from cmad_tpu.parameters.parameters import Parameters


def _params(R=None):
    return Parameters({
        "rotation matrix": np.eye(3) if R is None else R,
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hill": {
                "F": 0.45, "G": 0.55, "H": 0.5,
                "L": 1.4, "M": 1.7, "N": 1.55}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0,
                                                   "D": 20.0}}}}})


def _fields(grad_u):
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros(3, dtype=grad_u.dtype)},
        grad_fields={"u": grad_u})


def _batch(seed=0, B=64):
    rng = np.random.RandomState(seed)
    eps = rng.normal(0.0, 2.5e-3, size=(B, 3, 3))
    # scale half the batch below yield so both branches are exercised
    eps[: B // 2] *= 0.1
    return jnp.asarray(0.5 * (eps + np.transpose(eps, (0, 2, 1))))


def _compare(model, params, seeds=(0,)):
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_hill_local_solve(model, max_iters=40)

    def gen_point(xi_prev, gu, gu0):
        return generic(xi_prev, xi_prev, params.values,
                       _fields(gu), _fields(gu0))

    def red_point(xi_prev, gu, gu0):
        return reduced(xi_prev, xi_prev, params.values,
                       _fields(gu), _fields(gu0))

    for seed in seeds:
        grad_u = _batch(seed)
        gu0 = jnp.zeros_like(grad_u)
        xi_prev = jnp.zeros((grad_u.shape[0], model.num_dofs))
        xi_g = jax.vmap(gen_point)(xi_prev, grad_u, gu0)
        xi_r = jax.vmap(red_point)(xi_prev, grad_u, gu0)
        plastic = np.asarray(xi_g[:, 6]) > 0
        assert plastic.any() and (~plastic).any()
        np.testing.assert_allclose(np.asarray(xi_r), np.asarray(xi_g),
                                   rtol=1e-8, atol=2e-9)
        # second step from a plastic state
        xi_g2 = jax.vmap(gen_point)(xi_g, 1.5 * grad_u, grad_u)
        xi_r2 = jax.vmap(red_point)(xi_r, 1.5 * grad_u, grad_u)
        np.testing.assert_allclose(np.asarray(xi_r2),
                                   np.asarray(xi_g2),
                                   rtol=1e-8, atol=2e-9)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_reduced_matches_generic(cls):
    params = _params()
    model = cls(params)
    assert hill_kind(model) in ("rate", "total")
    _compare(model, params)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_reduced_matches_generic_rotated(cls):
    """Material rotations are supported (unlike the J2/Hosford
    specializations, which key on identity rotation)."""
    R = Rotation.from_euler("zyx", [0.4, -0.3, 0.7]).as_matrix()
    params = _params(R)
    model = cls(params)
    assert hill_kind(model) in ("rate", "total")
    _compare(model, params)


def test_reduced_tangents_match_generic():
    params = _params()
    model = SmallRateElasticPlastic(params)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_hill_local_solve(model, max_iters=40)

    gu = jnp.asarray(np.diag([3.0e-3, -1.0e-3, -0.5e-3])
                     + 0.4e-3 * (np.ones((3, 3)) - np.eye(3)))
    gu0 = jnp.zeros((3, 3))
    xi_prev = jnp.zeros(model.num_dofs)

    def gen_of_gu(g):
        return generic(xi_prev, xi_prev, params.values,
                       _fields(g), _fields(gu0))

    def red_of_gu(g):
        return reduced(xi_prev, xi_prev, params.values,
                       _fields(g), _fields(gu0))

    assert float(gen_of_gu(gu)[6]) > 0.0
    J_g = jax.jacfwd(gen_of_gu)(gu)
    J_r = jax.jacfwd(red_of_gu)(gu)
    np.testing.assert_allclose(np.asarray(J_r), np.asarray(J_g),
                               rtol=1e-6, atol=1e-9)

    # Hill-coefficient tangent (the calibration path)
    def of_F(solver):
        def f(F):
            p = params.values
            hill = {**p["plastic"]["effective stress"]["hill"], "F": F}
            p = {**p, "plastic": {**p["plastic"],
                                  "effective stress": {"hill": hill}}}
            return solver(xi_prev, xi_prev, p, _fields(gu),
                          _fields(gu0))
        return f

    gF = jax.jacfwd(of_F(generic))(0.45)
    rF = jax.jacfwd(of_F(reduced))(0.45)
    np.testing.assert_allclose(np.asarray(rF), np.asarray(gF),
                               rtol=1e-6, atol=1e-10)


def test_kind_gates():
    from cmad_tpu.models.deformation_types import DefType

    assert hill_kind(SmallRateElasticPlastic(_params())) == "rate"
    assert hill_kind(SmallElasticPlastic(_params())) == "total"
    m = SmallRateElasticPlastic(_params(),
                                def_type=DefType.UNIAXIAL_STRESS,
                                uniaxial_stress_idx=1)
    assert hill_kind(m) is None
