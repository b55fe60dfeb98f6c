"""The principal-stress Hosford effective stress: frame invariance,
agreement with the diagonal form and von Mises oracles, and
degeneracy-safe AD gradients (the yield normal)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cmad_tpu.models.effective_stress import (
    J2_effective_stress,
    conventional_effective_stress_fun,
    hosford_effective_stress,
    hosford_principal_effective_stress,
)


def _plastic(a, name="hosford_principal"):
    return {"effective stress": {name: {"a": a}}}


def _random_sym(seed=0, n=32, scale=100.0):
    rng = np.random.RandomState(seed)
    t = rng.normal(0.0, scale, size=(n, 3, 3))
    return jnp.asarray(0.5 * (t + np.transpose(t, (0, 2, 1))))


def test_registered_in_dispatch_table():
    fn = conventional_effective_stress_fun("hosford_principal")
    assert fn is hosford_principal_effective_stress


@pytest.mark.parametrize("a", [2.0, 8.0, 100.0])
def test_matches_diagonal_form_on_diagonal_states(a):
    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.normal(0.0, 150.0, size=(64, 3)))
    S = jax.vmap(jnp.diag)(d)
    phi_p = hosford_principal_effective_stress(S, _plastic(a))
    phi_d = hosford_effective_stress(S, _plastic(a, "hosford"))
    np.testing.assert_allclose(np.asarray(phi_p), np.asarray(phi_d),
                               rtol=1e-12)


@pytest.mark.parametrize("a", [4.0, 100.0])
def test_frame_invariance(a):
    """phi(R S R^T) == phi(S) for random rotations — the property the
    reference's diagonal-only Hosford lacks."""
    S = _random_sym(seed=2, n=16)
    R = jnp.asarray(Rotation.random(16, random_state=3).as_matrix())
    S_rot = jnp.einsum("bij,bjk,blk->bil", R, S, R)
    phi = hosford_principal_effective_stress(S, _plastic(a))
    phi_rot = hosford_principal_effective_stress(S_rot, _plastic(a))
    np.testing.assert_allclose(np.asarray(phi_rot), np.asarray(phi),
                               rtol=1e-9)


def test_a2_reduces_to_von_mises():
    S = _random_sym(seed=4, n=32)
    phi = hosford_principal_effective_stress(S, _plastic(2.0))
    vm = J2_effective_stress(S)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(vm),
                               rtol=1e-10)


def test_pure_shear_closed_form():
    """Principal stresses (tau, 0, -tau): differences (tau, tau, 2 tau)
    give phi = tau * (0.5 * (2 + 2^a))^(1/a)."""
    tau, a = 37.0, 8.0
    S = jnp.asarray([[0.0, tau, 0.0], [tau, 0.0, 0.0], [0.0, 0.0, 0.0]])
    phi = float(hosford_principal_effective_stress(S, _plastic(a)))
    expected = tau * (0.5 * (2.0 + 2.0**a)) ** (1.0 / a)
    np.testing.assert_allclose(phi, expected, rtol=1e-12)


def test_large_exponent_approaches_tresca():
    """a -> inf is Tresca: phi -> s_max - s_min."""
    S = _random_sym(seed=5, n=16)
    phi = hosford_principal_effective_stress(S, _plastic(400.0))
    eigs = np.linalg.eigvalsh(np.asarray(S))
    tresca = eigs[:, 2] - eigs[:, 0]
    np.testing.assert_allclose(np.asarray(phi), tresca, rtol=2e-2)


@pytest.mark.parametrize("a", [8.0, 100.0])
def test_gradient_matches_fd_generic_state(a):
    def phi_of(S):
        return hosford_principal_effective_stress(S, _plastic(a))

    S = np.asarray(_random_sym(seed=6, n=1))[0]
    g = np.asarray(jax.grad(phi_of)(jnp.asarray(S)))
    h = 1e-6 * max(1.0, np.abs(S).max())
    for i in range(3):
        for j in range(3):
            dS = np.zeros((3, 3))
            dS[i, j] = h
            fd = (float(phi_of(jnp.asarray(S + dS)))
                  - float(phi_of(jnp.asarray(S - dS)))) / (2 * h)
            np.testing.assert_allclose(g[i, j], fd, rtol=5e-5, atol=1e-8)


def test_gradient_near_degenerate_pair():
    """FD agreement persists close to (but off) a repeated principal
    pair — the divided-difference regime."""
    a = 8.0

    def phi_of(S):
        return hosford_principal_effective_stress(S, _plastic(a))

    # uniaxial-like state with the repeated pair split by 1e-3
    base = np.diag([150.0, 1e-3, 0.0])
    R = Rotation.random(1, random_state=7).as_matrix()[0]
    S = R @ base @ R.T
    g = np.asarray(jax.grad(phi_of)(jnp.asarray(S)))
    h = 1e-7 * 150.0
    for i in range(3):
        for j in range(3):
            dS = np.zeros((3, 3))
            dS[i, j] = h
            fd = (float(phi_of(jnp.asarray(S + dS)))
                  - float(phi_of(jnp.asarray(S - dS)))) / (2 * h)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-3, atol=1e-7)


def test_gradient_finite_at_exact_degeneracies():
    """Exactly repeated pairs (uniaxial, equibiaxial) and the
    hydrostatic triple give finite gradients and values."""
    a = 100.0

    def phi_of(S):
        return hosford_principal_effective_stress(S, _plastic(a))

    R = Rotation.random(1, random_state=8).as_matrix()[0]
    # for a repeated pair the differences are (m, 0, m), so
    # phi = (0.5 (m^a + 0 + m^a))^(1/a) = m exactly
    for base, expect in [
        (np.diag([200.0, 0.0, 0.0]), 200.0),        # uniaxial: pair at 0
        (np.diag([120.0, 120.0, 0.0]), 120.0),      # equibiaxial pair
        (50.0 * np.eye(3), 0.0),                    # hydrostatic triple
    ]:
        S = jnp.asarray(R @ base @ R.T)
        phi = float(phi_of(S))
        np.testing.assert_allclose(phi, expect, rtol=1e-6, atol=1e-10)
        g = np.asarray(jax.grad(phi_of)(S))
        assert np.all(np.isfinite(g))
