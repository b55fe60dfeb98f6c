"""Elastic stress forms, branch selection, and potential-derived stress.

Mirrors the reference's coverage of ``cmad/models/{elastic_stress,
elastic_potential,paths}.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.models.elastic_potential import (
    compressible_neohookean_potential,
    compute_cauchy_from_psi_b,
)
from cmad_tpu.models.elastic_stress import (
    compressible_neohookean_cauchy_stress,
    conventional_elastic_stress_fun,
    isotropic_linear_elastic_cauchy_stress,
    isotropic_linear_elastic_stress,
    two_mu_scale_factor,
)
from cmad_tpu.models.paths import cond_residual

PARAMS = {"elastic": {"E": 200e3, "nu": 0.3}}


def _rand_eps(scale=1e-3, seed=0):
    rng = np.random.RandomState(seed)
    e = rng.normal(0.0, scale, size=(3, 3))
    return jnp.asarray(0.5 * (e + e.T))


def test_linear_forms_agree_for_small_strain():
    """lambda/mu form (strain input) == kappa/mu split form (F input)."""
    eps = _rand_eps()
    s1 = isotropic_linear_elastic_stress(eps, PARAMS)
    s2 = isotropic_linear_elastic_cauchy_stress(jnp.eye(3) + eps, PARAMS)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-12, atol=1e-10)


def test_linear_uniaxial_modulus():
    """Pure uniaxial STRESS state: build eps with the analytic lateral
    contraction and check sigma_xx = E eps_xx, off-diagonals zero."""
    nu, E = 0.3, 200e3
    exx = 1e-3
    eps = jnp.diag(jnp.asarray([exx, -nu * exx, -nu * exx]))
    s = np.asarray(isotropic_linear_elastic_stress(eps, PARAMS))
    np.testing.assert_allclose(s[0, 0], E * exx, rtol=1e-12)
    np.testing.assert_allclose(s[1, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(s[2, 2], 0.0, atol=1e-9)


def test_neohookean_linearizes_to_linear_elasticity():
    """d sigma / d eps at F = I matches the linear-elastic tangent."""
    def nh(eps_flat):
        eps = eps_flat.reshape(3, 3)
        return compressible_neohookean_cauchy_stress(
            jnp.eye(3) + eps, PARAMS).reshape(-1)

    def lin(eps_flat):
        eps = eps_flat.reshape(3, 3)
        eps = 0.5 * (eps + eps.T)
        return isotropic_linear_elastic_stress(eps, PARAMS).reshape(-1)

    z = jnp.zeros(9)
    C_nh = np.asarray(jax.jacfwd(nh)(z))
    C_lin = np.asarray(jax.jacfwd(lin)(z))
    # symmetrize the NH tangent over the strain symmetry the linear
    # form applies internally
    C_nh_sym = 0.5 * (C_nh + C_nh.reshape(9, 3, 3).transpose(0, 2, 1)
                      .reshape(9, 9))
    np.testing.assert_allclose(C_nh_sym, C_lin,
                               rtol=1e-8, atol=1e-8 * np.abs(C_lin).max())


def test_potential_stress_matches_closed_form():
    """grad(psi)-derived stress == hand-derived neo-Hookean stress."""
    rng = np.random.RandomState(3)
    F = jnp.asarray(np.eye(3) + 0.05 * rng.normal(size=(3, 3)))
    params = {"elastic": {"kappa": 1000.0, "mu": 400.0}}
    s_pot = compute_cauchy_from_psi_b(
        F, params, compressible_neohookean_potential)
    s_closed = compressible_neohookean_cauchy_stress(F, params)
    np.testing.assert_allclose(np.asarray(s_pot), np.asarray(s_closed),
                               rtol=1e-9, atol=1e-9)


def test_conventional_dispatch_and_unknown_name():
    assert (conventional_elastic_stress_fun("isotropic_linear")
            is isotropic_linear_elastic_cauchy_stress)
    assert (conventional_elastic_stress_fun("neohookean")
            is compressible_neohookean_cauchy_stress)
    with pytest.raises(NotImplementedError, match="hencky"):
        conventional_elastic_stress_fun("hencky")


def test_two_mu_scale_factor():
    ec = ElasticConstants.from_params(PARAMS["elastic"])
    np.testing.assert_allclose(float(two_mu_scale_factor(PARAMS)),
                               2.0 * float(ec.mu))


# ----------------------------------------------------------------------
# branch selection
# ----------------------------------------------------------------------
def test_cond_residual_selects_branches():
    C_e, C_p = jnp.asarray([1.0, 2.0]), jnp.asarray([10.0, 20.0])
    tol = 1e-8
    np.testing.assert_allclose(
        np.asarray(cond_residual(jnp.asarray(1.0), C_e, C_p, tol)),
        [10.0, 20.0])   # yielding
    np.testing.assert_allclose(
        np.asarray(cond_residual(jnp.asarray(-1.0), C_e, C_p, tol)),
        [1.0, 2.0])     # elastic
    np.testing.assert_allclose(
        np.asarray(cond_residual(jnp.asarray(0.0), C_e, C_p, tol)),
        [10.0, 20.0])   # on the surface counts as plastic


def test_cond_residual_transposes_under_nested_ad():
    """grad-of-grad through the branch select must not raise (the reason
    it is jnp.where, not lax.cond)."""
    def loss(x):
        f = x - 1.0
        C_e, C_p = x * jnp.ones(2), (x ** 2) * jnp.ones(2)
        return jnp.sum(cond_residual(f, C_e, C_p, 1e-8) ** 2)

    g = jax.grad(loss)(2.0)
    h = jax.grad(jax.grad(loss))(2.0)
    # plastic branch: loss = 2 x^4 -> g = 8 x^3, h = 24 x^2
    np.testing.assert_allclose(float(g), 64.0, rtol=1e-12)
    np.testing.assert_allclose(float(h), 96.0, rtol=1e-12)
