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
