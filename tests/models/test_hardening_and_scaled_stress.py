"""Hardening laws, scaled (degree-one homogenized) yield, global fields.

Mirrors the reference's coverage of ``cmad/models/hardening.py`` and
the scaled-effective-stress inner Newton
(``cmad/models/effective_stress.py:97-130``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.effective_stress import (
    J2_effective_stress,
    beta_initial_guess,
    beta_make_newton_solve,
    hosford_effective_stress,
    scaled_effective_stress,
)
from cmad_tpu.models.global_fields import GlobalFieldsAtPoint, mp_U_from_F
from cmad_tpu.models.hardening import (
    combined_hardening_fun,
    get_hardening_funs,
    linear_hardening,
    voce_hardening,
)


# ----------------------------------------------------------------------
# hardening
# ----------------------------------------------------------------------
def test_voce_saturates_and_linear_is_linear():
    a = jnp.asarray([0.0, 0.05, 10.0])
    v = np.asarray(voce_hardening(a, {"S": 200.0, "D": 20.0}))
    np.testing.assert_allclose(v[0], 0.0)
    np.testing.assert_allclose(v[2], 200.0, rtol=1e-10)  # saturation
    assert 0.0 < v[1] < 200.0

    lin = np.asarray(linear_hardening(a, {"K": 100.0}))
    np.testing.assert_allclose(lin, 100.0 * np.asarray(a))


def test_combined_hardening_sums_present_blocks():
    funs = get_hardening_funs()
    a = jnp.asarray(0.1)
    both = {"voce": {"S": 200.0, "D": 20.0}, "linear": {"K": 50.0}}
    total = float(combined_hardening_fun(a, both, funs))
    expect = float(voce_hardening(a, both["voce"])
                   + linear_hardening(a, both["linear"]))
    np.testing.assert_allclose(total, expect, rtol=1e-14)

    only_voce = {"voce": {"S": 200.0, "D": 20.0}}
    np.testing.assert_allclose(
        float(combined_hardening_fun(a, only_voce, funs)),
        float(voce_hardening(a, only_voce["voce"])), rtol=1e-14)


# ----------------------------------------------------------------------
# scaled effective stress (inner beta Newton)
# ----------------------------------------------------------------------
def _hosford_params(Y=200.0, a=8.0):
    return {"effective stress": {"hosford": {"a": a}},
            "flow stress": {"initial yield": {"Y": Y}}}


def _phi_hosford(cauchy, params):
    return hosford_effective_stress(cauchy, params)


def test_scaled_stress_is_degree_one_and_matches_on_surface():
    """phi_scaled is homogeneous of degree one, and equals Y exactly on
    the yield surface it defines."""
    params = _hosford_params()
    Y = params["flow stress"]["initial yield"]["Y"]
    update = beta_make_newton_solve(_phi_hosford, Y)

    rng = np.random.RandomState(0)
    s = rng.normal(size=(3, 3))
    cauchy = jnp.asarray(0.5 * (s + s.T) * 100.0)

    phi = float(scaled_effective_stress(cauchy, params, _phi_hosford,
                                        update))
    phi2 = float(scaled_effective_stress(2.0 * cauchy, params,
                                         _phi_hosford, update))
    np.testing.assert_allclose(phi2, 2.0 * phi, rtol=1e-9)

    # rescale the stress onto the surface: phi_scaled == Y there
    on_surface = cauchy * (Y / phi)
    phi_surf = float(scaled_effective_stress(on_surface, params,
                                             _phi_hosford, update))
    np.testing.assert_allclose(phi_surf, Y, rtol=1e-9)


def test_scaled_stress_zero_stress_sentinel():
    params = _hosford_params()
    Y = params["flow stress"]["initial yield"]["Y"]
    update = beta_make_newton_solve(_phi_hosford, Y)
    phi0 = float(scaled_effective_stress(jnp.zeros((3, 3)), params,
                                         _phi_hosford, update))
    np.testing.assert_allclose(phi0, 0.0, atol=1e-12)
    assert float(beta_initial_guess(jnp.zeros((3, 3)), Y)) == -1.0


def test_scaled_stress_is_differentiable():
    params = _hosford_params()
    Y = params["flow stress"]["initial yield"]["Y"]
    update = beta_make_newton_solve(_phi_hosford, Y)
    rng = np.random.RandomState(1)
    s = rng.normal(size=(3, 3))
    cauchy = jnp.asarray(0.5 * (s + s.T) * 50.0)

    g = jax.grad(lambda c: scaled_effective_stress(
        c, params, _phi_hosford, update))(cauchy)
    assert np.all(np.isfinite(np.asarray(g)))
    # degree-one homogeneity => Euler's identity: dphi : sigma = phi
    phi = float(scaled_effective_stress(cauchy, params, _phi_hosford,
                                        update))
    np.testing.assert_allclose(float(jnp.sum(g * cauchy)), phi, rtol=1e-7)


# ----------------------------------------------------------------------
# global fields
# ----------------------------------------------------------------------
def test_mp_U_from_F_batched():
    F = jnp.stack([jnp.eye(3), 2.0 * jnp.eye(3)])
    U = mp_U_from_F(F)
    assert U.fields["u"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(U.grad_fields["u"][0]),
                               np.zeros((3, 3)))
    np.testing.assert_allclose(np.asarray(U.grad_fields["u"][1]),
                               np.eye(3))


def test_global_fields_is_pytree():
    U = GlobalFieldsAtPoint(fields={"u": jnp.zeros(3)},
                            grad_fields={"u": jnp.eye(3)})
    leaves = jax.tree_util.tree_leaves(U)
    assert len(leaves) == 2
    U2 = jax.tree_util.tree_map(lambda x: 2.0 * x, U)
    np.testing.assert_allclose(np.asarray(U2.grad_fields["u"]),
                               2.0 * np.eye(3))
