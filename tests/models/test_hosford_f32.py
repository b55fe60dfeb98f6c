"""Hosford a=100 stays finite in float32 (max-diff rescale).

Regression: the earlier von-Mises rescale underflowed — for
shear-dominated states every diagonal-difference power collapsed to
exactly 0 in f32 and the outer ``0 ** (1/a)`` emitted NaN gradients,
poisoning whole batched return maps (observed as a diverged notch
solve on TPU). The max-diff rescale pins the largest ratio at 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.effective_stress import hosford_effective_stress

PARAMS = {"effective stress": {"hosford": {"a": 100.0}}}


def _phi32(s):
    return hosford_effective_stress(jnp.asarray(s, jnp.float32), PARAMS)


def test_shear_dominated_state_finite_in_f32():
    # equal diagonal, large shear: all diagonal diffs are ~0
    s = np.array([[2.0, 5.0, 1.0],
                  [5.0, 2.0, 0.5],
                  [1.0, 0.5, 2.0]])
    phi = _phi32(s)
    g = jax.jacrev(_phi32)(s)
    assert np.isfinite(float(phi))
    assert np.all(np.isfinite(np.asarray(g)))

    # tiny diagonal perturbation: value and gradient still finite
    s2 = s + np.diag([1e-4, -1e-4, 0.0])
    assert np.isfinite(float(_phi32(s2)))
    assert np.all(np.isfinite(np.asarray(jax.jacrev(_phi32)(s2))))


def test_f32_matches_f64_on_random_states():
    rng = np.random.RandomState(7)
    worst = 0.0
    for _ in range(20):
        s = rng.normal(0.0, 5.0, size=(3, 3))
        s = 0.5 * (s + s.T)
        p64 = float(hosford_effective_stress(jnp.asarray(s), PARAMS))
        p32 = float(_phi32(s))
        worst = max(worst, abs(p64 - p32) / max(abs(p64), 1e-30))
    assert worst < 1e-5


def test_hydrostatic_state_is_zero_with_finite_grad():
    s = 3.7 * np.eye(3)
    assert float(_phi32(s)) == 0.0
    assert np.all(np.isfinite(np.asarray(jax.jacrev(_phi32)(s))))


PARAMS_P = {"effective stress": {"hosford_principal": {"a": 100.0}}}


def _phi32_principal(s):
    from cmad_tpu.models.effective_stress import (
        hosford_principal_effective_stress,
    )
    return hosford_principal_effective_stress(
        jnp.asarray(s, jnp.float32), PARAMS_P)


def test_principal_form_finite_in_f32():
    """The frame-invariant form survives a=100 in f32 too — including
    shear-dominated and (near-)degenerate spectra, where the guarded
    Cardano eigenvalues and max-diff rescale both matter."""
    states = [
        np.array([[2.0, 5.0, 1.0],
                  [5.0, 2.0, 0.5],
                  [1.0, 0.5, 2.0]]),        # shear-dominated
        np.diag([200.0, 0.0, 0.0]),          # exact pair
        np.diag([120.0, 120.0 + 1e-4, 0.0]),  # near pair
        3.7 * np.eye(3),                      # triple
    ]
    for s in states:
        phi = _phi32_principal(s)
        g = jax.jacrev(_phi32_principal)(s)
        assert np.isfinite(float(phi))
        assert np.all(np.isfinite(np.asarray(g)))


def test_principal_f32_matches_f64_on_random_states():
    from cmad_tpu.models.effective_stress import (
        hosford_principal_effective_stress,
    )
    rng = np.random.RandomState(11)
    worst = 0.0
    for _ in range(20):
        s = rng.normal(0.0, 5.0, size=(3, 3))
        s = 0.5 * (s + s.T)
        p64 = float(hosford_principal_effective_stress(
            jnp.asarray(s), PARAMS_P))
        p32 = float(_phi32_principal(s))
        worst = max(worst, abs(p64 - p32) / max(abs(p64), 1e-30))
    assert worst < 5e-5
