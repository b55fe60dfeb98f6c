"""Armijo line search: acceptance, contraction, aux passthrough."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.util.line_search import (
    DEFAULT_LINE_SEARCH_SETTINGS,
    cubic_min,
    line_search,
    quad_min,
)


def test_full_step_accepted_on_quadratic():
    """For phi(a) = 0.5 (1 - a)^2 the full Newton step is exact and must
    be accepted immediately."""
    def eval_fn(alpha):
        r = 1.0 - alpha
        return 0.5 * r * r, None, r

    alpha, aux = line_search(eval_fn, 0.5, -1.0,
                             DEFAULT_LINE_SEARCH_SETTINGS, jnp.asarray(1.0))
    assert np.isclose(float(alpha), 1.0)
    assert np.isclose(float(aux), 0.0)


def test_contracts_on_overshoot():
    """phi(a) = 0.5 (1 - 3a)^2: the full step overshoots; the search must
    return a step with sufficient decrease."""
    def eval_fn(alpha):
        r = 1.0 - 3.0 * alpha
        return 0.5 * r * r, None, r

    settings = {**DEFAULT_LINE_SEARCH_SETTINGS, "max evals": 8}
    alpha, _ = line_search(eval_fn, 0.5, -1.0, settings, jnp.asarray(1.0))
    a = float(alpha)
    phi = 0.5 * (1.0 - 3.0 * a) ** 2
    assert phi <= 0.5 + 1e-4 * a * (-1.0)


def test_zero_evals_returns_full_step():
    def eval_fn(alpha):  # pragma: no cover - must not be called
        raise AssertionError("eval_fn called with max evals = 0")

    settings = {**DEFAULT_LINE_SEARCH_SETTINGS, "max evals": 0}
    alpha, aux = line_search(lambda a: (jnp.inf, None, a), 0.5, -1.0,
                             settings, jnp.asarray(7.0))
    assert np.isclose(float(alpha), 1.0)
    assert np.isclose(float(aux), 7.0)


def test_quad_min_exact():
    # phi(a) = (a - 0.3)^2 + c: phi0 = 0.09+c at a=0, dphi0 = -0.6
    phi0, dphi0 = 0.09, -0.6
    a, phi_a = 1.0, (1.0 - 0.3) ** 2
    assert np.isclose(float(quad_min(phi0, dphi0, a, phi_a)), 0.3)


def test_cubic_min_exact_on_quadratic():
    phi0, dphi0 = 0.09, -0.6
    a, phi_a = 1.0, (1.0 - 0.3) ** 2
    slope_a = 2.0 * (1.0 - 0.3)
    assert np.isclose(float(cubic_min(phi0, dphi0, a, phi_a, slope_a)), 0.3)


def test_nonmonotone_accepts_full_step_on_plateau():
    """When NO trial decreases the merit (nonsmooth plateau: phi rises
    slightly at every alpha), nonmonotone accepts the FULL step with the
    first probe's aux; the monotone default returns a damped best-merit
    trial."""
    def eval_fn(alpha):
        # phi increases mildly with alpha: best-merit is the smallest
        # alpha probed, Armijo never passes
        phi = 0.5 + 0.01 * alpha
        return jnp.asarray(phi), None, jnp.asarray(alpha)

    mono = {**DEFAULT_LINE_SEARCH_SETTINGS, "max evals": 4}
    a_m, aux_m = line_search(eval_fn, 0.5, -1.0, mono, jnp.asarray(-1.0))
    assert float(a_m) < 1.0  # damped: the smallest-phi (smallest-alpha) probe
    assert np.isclose(float(aux_m), float(a_m))

    nm = {**mono, "nonmonotone": True}
    a_n, aux_n = line_search(eval_fn, 0.5, -1.0, nm, jnp.asarray(-1.0))
    assert np.isclose(float(a_n), 1.0)
    assert np.isclose(float(aux_n), 1.0)  # the alpha=1 probe's aux


def test_nonmonotone_rejects_blowup_full_step():
    """A full step that blows the merit past 100x phi_0 must NOT be
    accepted; the lowest-merit trial wins as in the monotone policy."""
    def eval_fn(alpha):
        # alpha=1 diverges (phi = 1e4 * phi_0); contracted steps rise
        # mildly so nothing passes Armijo
        phi = jnp.where(alpha > 0.95, 5.0e3, 0.5 + 0.01 * alpha)
        return phi, None, jnp.asarray(alpha)

    nm = {**DEFAULT_LINE_SEARCH_SETTINGS, "max evals": 4,
          "nonmonotone": True}
    a, aux = line_search(eval_fn, 0.5, -1.0, nm, jnp.asarray(-1.0))
    assert float(a) < 1.0
    assert np.isclose(float(aux), float(a))


def test_nonmonotone_identical_when_armijo_passes():
    """On a well-behaved quadratic both policies accept the full step."""
    def eval_fn(alpha):
        r = 1.0 - alpha
        return 0.5 * r * r, None, r

    nm = {**DEFAULT_LINE_SEARCH_SETTINGS, "nonmonotone": True}
    alpha, aux = line_search(eval_fn, 0.5, -1.0, nm, jnp.asarray(1.0))
    assert np.isclose(float(alpha), 1.0)
    assert np.isclose(float(aux), 0.0)
