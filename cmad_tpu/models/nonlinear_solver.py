"""Local (material-point) Newton solvers with implicit-function AD.

Parity: reference ``cmad/models/nonlinear_solver.py:14,88,158`` — the core
AD trick of the whole framework. ``make_newton_solve`` wraps a damped
``lax.while_loop`` Newton in a ``custom_jvp`` whose rule implements the
implicit function theorem at the converged state:

    r(x*, args) = 0  =>  dx*/dargs = -(dr/dx)^{-1} (dr/dargs)

so gradients/HVPs/Hessians of anything downstream flow through converged
solves without differentiating the iteration. The rule itself is built from
differentiable ops, so it nests (forward-over-reverse Hessians work).

TPU-first notes:
- state is a flat jax array (cmad_tpu models use flat xi), so no
  ravel/unravel bookkeeping is needed in the hot loop;
- ``batched_newton_solve`` is a vmap of the solver: under vmap the
  ``while_loop`` becomes a masked all-lanes iteration, which is exactly the
  structure-of-arrays return-map kernel the FE COUPLED assembly needs.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_jvp, debug, jacfwd, jvp, vmap
from jax.flatten_util import ravel_pytree
from jax.lax import while_loop

from cmad_tpu import config
from cmad_tpu.ops.linalg import solve_dense
from cmad_tpu.typing import JaxArray
from cmad_tpu.util.line_search import DEFAULT_LINE_SEARCH_SETTINGS, line_search


def make_newton_solve(
        residual: Callable[..., JaxArray],
        max_iters: int = 10,
        abs_tol: float | None = None,
        rel_tol: float | None = None,
        print_local_convergence: bool = False,
        line_search_settings: dict[str, Any] | None = None,
) -> Callable[..., JaxArray]:
    """Traced Newton solve of ``residual(x, *args) = 0`` from guess ``x0``.

    Returns ``solve(x0, *args) -> x*``. ``x`` may be a flat jax array or any
    pytree (ravelled internally). The ``custom_jvp`` rule returns zero
    tangent w.r.t. the guess (the solution does not depend on it) and IFT
    tangents w.r.t. ``args``.
    """
    if abs_tol is None or rel_tol is None:
        d_abs, d_rel = config.newton_tols("mp_local")
        abs_tol = d_abs if abs_tol is None else abs_tol
        rel_tol = d_rel if rel_tol is None else rel_tol

    ls = {**DEFAULT_LINE_SEARCH_SETTINGS, **(line_search_settings or {})}

    @custom_jvp
    def solve(x0, *args):
        flat0, unravel = ravel_pytree(x0)

        def r_flat(xf):
            return ravel_pytree(residual(unravel(xf), *args))[0]

        r0 = r_flat(flat0)
        norm0 = jnp.linalg.norm(r0)

        def cond_fn(carry):
            it, x, r = carry
            norm = jnp.linalg.norm(r)
            done = jnp.logical_or(norm < abs_tol, norm / norm0 < rel_tol)
            return jnp.logical_and(it < max_iters, ~done)

        def body_fn(carry):
            it, x, r = carry
            if print_local_convergence:
                debug.print("  ({k}) abs ||C|| = {a:.6e} rel ||C|| = {r:.6e}",
                            k=it + 1, a=jnp.linalg.norm(r),
                            r=jnp.linalg.norm(r) / norm0)
            J = jacfwd(r_flat)(x)
            dx = solve_dense(J, r)

            def probe(alpha):
                r_trial = r_flat(x - alpha * dx)
                return 0.5 * (r_trial @ r_trial), None, r_trial

            alpha, r_next = line_search(
                probe, 0.5 * (r @ r), -(r @ r), ls, r)
            return it + 1, x - alpha * dx, r_next

        _, x_star, _ = while_loop(cond_fn, body_fn, (0, flat0, r0))
        return unravel(x_star)

    @solve.defjvp
    def solve_jvp(primals, tangents):
        x0, *args = primals
        _, *args_dot = tangents
        x_star = solve(x0, *args)
        flat_star, unravel = ravel_pytree(x_star)

        def r_of_x(xf):
            return ravel_pytree(residual(unravel(xf), *args))[0]

        def r_of_args(*a):
            return ravel_pytree(residual(x_star, *a))[0]

        A = jacfwd(r_of_x)(flat_star)
        # dr/dargs . args_dot at the solution; guess tangent contributes 0
        _, b = jvp(r_of_args, tuple(args), tuple(args_dot))
        x_dot = -solve_dense(A, b)
        return x_star, unravel(x_dot)

    return solve


def make_newton_solve_with_stats(
        residual: Callable[..., JaxArray],
        max_iters: int = 10,
        abs_tol: float | None = None,
        rel_tol: float | None = None,
        line_search_settings: dict[str, Any] | None = None,
) -> Callable[..., tuple[JaxArray, JaxArray, JaxArray]]:
    """Traced Newton returning ``(x*, iters, final_norm)``.

    Primal-only variant (no custom_jvp) so subcommands can log per-step
    solver diagnostics (solver.json) without a second pass. Do not
    differentiate through it — use :func:`make_newton_solve` for AD.
    """
    if abs_tol is None or rel_tol is None:
        d_abs, d_rel = config.newton_tols("mp_local")
        abs_tol = d_abs if abs_tol is None else abs_tol
        rel_tol = d_rel if rel_tol is None else rel_tol
    ls = {**DEFAULT_LINE_SEARCH_SETTINGS, **(line_search_settings or {})}

    def solve(x0, *args):
        flat0, unravel = ravel_pytree(x0)

        def r_flat(xf):
            return ravel_pytree(residual(unravel(xf), *args))[0]

        r0 = r_flat(flat0)
        norm0 = jnp.linalg.norm(r0)

        def cond_fn(carry):
            it, x, r = carry
            norm = jnp.linalg.norm(r)
            done = jnp.logical_or(norm < abs_tol, norm / norm0 < rel_tol)
            return jnp.logical_and(it < max_iters, ~done)

        def body_fn(carry):
            it, x, r = carry
            J = jacfwd(r_flat)(x)
            dx = solve_dense(J, r)

            def probe(alpha):
                r_trial = r_flat(x - alpha * dx)
                return 0.5 * (r_trial @ r_trial), None, r_trial

            alpha, r_next = line_search(probe, 0.5 * (r @ r), -(r @ r),
                                        ls, r)
            return it + 1, x - alpha * dx, r_next

        it, x_star, r_star = while_loop(cond_fn, body_fn, (0, flat0, r0))
        return unravel(x_star), it, jnp.linalg.norm(r_star)

    return solve


def batched_newton_solve(
        residual: Callable[..., JaxArray],
        x0_batch: JaxArray,
        *args_batch,
        in_axes=0,
        **newton_kwargs,
) -> JaxArray:
    """Structure-of-arrays Newton over a point batch.

    ``residual`` is the per-point residual; ``x0_batch`` is ``(B, n)``.
    Under vmap the while_loop runs until every lane converges with masked
    updates — the TPU-native equivalent of the reference's per-IP loop.
    """
    solver = make_newton_solve(residual, **newton_kwargs)
    if isinstance(in_axes, tuple):
        # in_axes covers *args_batch; the guess always batches on axis 0
        axes = (0, *in_axes)
    else:
        axes = (0,) + (in_axes,) * len(args_batch)
    return vmap(solver, in_axes=axes)(x0_batch, *args_batch)


def newton_solve(
        model, xi: JaxArray, xi_prev: JaxArray, params, U, U_prev,
        max_iters: int = 10,
        abs_tol: float | None = None,
        rel_tol: float | None = None,
        max_ls_evals: int = 0,
) -> tuple[JaxArray, int, float]:
    """Imperative host-side Newton on a model's flat state.

    Functional replacement for the reference's mutable seed/evaluate Newton
    (``cmad/models/nonlinear_solver.py:14-85``): takes explicit state,
    returns ``(xi_solved, iters, ||C||)`` for solver logging.
    """
    if abs_tol is None or rel_tol is None:
        d_abs, d_rel = config.newton_tols("mp_local")
        abs_tol = d_abs if abs_tol is None else abs_tol
        rel_tol = d_rel if rel_tol is None else rel_tol

    beta, eta = 1e-4, 0.5
    norm0 = 1.0
    norm = 0.0
    it = 0
    xi = jnp.asarray(xi)

    while it < max_iters:
        C = np.asarray(model.C(xi, xi_prev, params, U, U_prev))
        norm = float(np.linalg.norm(C))
        if it == 0:
            norm0 = norm if norm > 0.0 else 1.0
        if norm / norm0 < rel_tol or norm < abs_tol:
            break

        J = np.asarray(model.jac_xi(xi, xi_prev, params, U, U_prev))
        dxi = np.linalg.solve(J, -C)
        xi = xi + jnp.asarray(dxi)

        if max_ls_evals > 0:
            psi_0 = 0.5 * norm**2
            psi_deriv = -2.0 * psi_0
            alpha = 1.0
            C_j = np.asarray(model.C(xi, xi_prev, params, U, U_prev))
            psi_j = 0.5 * float(np.linalg.norm(C_j)) ** 2
            evals = 1
            while psi_j >= (1.0 - 2.0 * beta * alpha) * psi_0 \
                    and evals < max_ls_evals:
                alpha_prev = alpha
                denom = 2.0 * (psi_j - psi_0 - alpha * psi_deriv)
                alpha = max(eta * alpha, -(alpha**2 * psi_deriv) / denom)
                xi = xi + jnp.asarray((alpha - alpha_prev) * dxi)
                C_j = np.asarray(model.C(xi, xi_prev, params, U, U_prev))
                psi_j = 0.5 * float(np.linalg.norm(C_j)) ** 2
                evals += 1
        it += 1

    return xi, it, norm
