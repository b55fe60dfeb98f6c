"""Branch-free backtracking Armijo line search (traceable).

Parity: reference ``cmad/util/line_search.py:95``. Shared by the FE global
Newton and the local constitutive Newton. The merit is
``phi(alpha) = 0.5 ||r(x + alpha dx)||^2``; a trial is accepted on the
Armijo condition ``phi <= phi0 + c1 * alpha * dphi0``. Rejected steps
contract to the minimizer of a two-point Hermite cubic (when the caller
supplies the trial slope) or a quadratic (when it does not), clipped to
``[min_factor, max_factor] * alpha``. Entirely ``lax.while_loop`` +
``jnp.where`` so it nests inside traced Newton solves; the enclosing
solves' custom_jvp rules keep AD from differentiating the iterates.
"""
from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

import jax.numpy as jnp
from jax import debug, lax, tree_util

from cmad_tpu.typing import PyTree, Scalar

DEFAULT_LINE_SEARCH_SETTINGS: dict[str, Any] = {
    "max evals": 4,
    "sufficient decrease": 1.0e-4,
    "min backtrack factor": 0.5,
    "max backtrack factor": 0.9,
    "nonmonotone": False,
    "print": False,
}


def cubic_min(phi_0, dphi_0, a, phi_a, slope_a):
    """Interior minimizer of the Hermite cubic through (0, phi_0, dphi_0)
    and (a, phi_a, slope_a); falls back to a/2 when degenerate."""
    d1 = dphi_0 + slope_a + 3.0 * (phi_0 - phi_a) / a
    radicand = d1 * d1 - dphi_0 * slope_a
    d2 = jnp.sqrt(jnp.maximum(radicand, 0.0))
    denom = slope_a - dphi_0 + 2.0 * d2
    alpha = a - a * (slope_a + d2 - d1) / jnp.where(denom == 0.0, 1.0, denom)
    bad = jnp.logical_or(radicand < 0.0, denom == 0.0)
    return jnp.where(bad, 0.5 * a, alpha)


def quad_min(phi_0, dphi_0, a, phi_a):
    """Minimizer of the quadratic through (0, phi_0, dphi_0) and
    (a, phi_a); falls back to a/2 when curvature vanishes."""
    denom = 2.0 * (phi_a - phi_0 - dphi_0 * a)
    alpha = -dphi_0 * a * a / jnp.where(denom == 0.0, 1.0, denom)
    return jnp.where(denom == 0.0, 0.5 * a, alpha)


def _where_tree(pred, a: PyTree, b: PyTree) -> PyTree:
    return tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def line_search(
        eval_fn: Callable[[Scalar], tuple[Scalar, Scalar | None, PyTree]],
        phi_0: Scalar,
        dphi_0: Scalar,
        settings: Mapping[str, Any],
        init_aux: PyTree,
) -> tuple[Scalar, PyTree]:
    """Returns ``(alpha, aux)`` where ``aux`` is whatever ``eval_fn``
    produced at the returned step (so callers can reuse e.g. the assembled
    residual/tangent instead of recomputing).

    ``eval_fn(alpha) -> (phi, slope_or_None, aux)``. With ``max evals = 0``
    the full step is returned untried. If no trial satisfies Armijo within
    the budget, the lowest-merit trial wins. Non-finite merits (diverged
    probes) halve the step.

    ``nonmonotone`` (default off) mirrors the host FE Newton's acceptance
    policy (``fem/nonlinear_solver.py`` host loop): when NO trial
    satisfies Armijo, accept the FULL step anyway — unless it blew the
    merit up past ``100 x phi_0`` (= 10x the residual norm), in which
    case fall back to the lowest-merit trial. The merit ``0.5 ||r||^2``
    is nonsmooth at the elastic/plastic switch and transiently INCREASES
    on the convergent Newton path; a damped best-merit step at that
    plateau slows convergence where the full step proceeds (measured on
    the Hosford notch — see benchmarks/notch_hosford/README.md). The
    probes still run, so a genuinely diverging step is still caught.
    """
    max_evals = settings["max evals"]
    c1 = settings["sufficient decrease"]
    f_lo = settings["min backtrack factor"]
    f_hi = settings["max backtrack factor"]
    nonmonotone = bool(settings.get("nonmonotone", False))

    def cond_fn(carry):
        n, _a, ok, _aux, _ba, _bp, _baux, _fp, _faux = carry
        return jnp.logical_and(n < max_evals, ~ok)

    def body_fn(carry):
        n, alpha, _ok, _aux, best_a, best_phi, best_aux, full_phi, \
            full_aux = carry
        phi, slope, aux = eval_fn(alpha)
        finite = jnp.isfinite(phi)

        is_first = n == 0  # the alpha = 1 (full-step) probe
        full_phi = jnp.where(is_first, phi, full_phi)
        full_aux = _where_tree(is_first, aux, full_aux)

        better = jnp.logical_and(finite, phi < best_phi)
        best_a = jnp.where(better, alpha, best_a)
        best_phi = jnp.where(better, phi, best_phi)
        best_aux = _where_tree(better, aux, best_aux)

        ok = jnp.logical_and(finite, phi <= phi_0 + c1 * alpha * dphi_0)

        if slope is None:
            model_min = quad_min(phi_0, dphi_0, alpha, phi)
        else:
            model_min = cubic_min(phi_0, dphi_0, alpha, phi, slope)
        contracted = jnp.clip(model_min, f_lo * alpha, f_hi * alpha)
        next_alpha = jnp.where(
            ok, alpha, jnp.where(finite, contracted, 0.5 * alpha))
        return (n + 1, next_alpha, ok, aux, best_a, best_phi, best_aux,
                full_phi, full_aux)

    one = jnp.asarray(1.0, dtype=jnp.asarray(phi_0).dtype)
    inf = jnp.asarray(jnp.inf, dtype=one.dtype)
    init = (jnp.asarray(0), one, jnp.asarray(False), init_aux,
            one, inf, init_aux, inf, init_aux)
    n, alpha, ok, aux, best_a, _bp, best_aux, full_phi, full_aux = \
        lax.while_loop(cond_fn, body_fn, init)

    if nonmonotone:
        accept_full = jnp.logical_and(jnp.isfinite(full_phi),
                                      full_phi <= 100.0 * phi_0)
        fallback_a = jnp.where(accept_full, one, best_a)
        fallback_aux = _where_tree(accept_full, full_aux, best_aux)
    else:
        fallback_a, fallback_aux = best_a, best_aux
    out_alpha = jnp.where(ok, alpha, fallback_a)
    out_aux = _where_tree(ok, aux, fallback_aux)
    if settings.get("print", False):
        debug.print(" > line search: alpha = {a:.3e} ({n} evals)",
                    a=out_alpha, n=n)
    return out_alpha, out_aux
