"""Global FE Newton with implicit-function AD.

Parity: reference ``cmad/fem/nonlinear_solver.py:46-542``. The forward
iteration is a ``lax.while_loop`` (assemble -> embedded-BC enforce ->
linear-solver dispatch -> optional cubic line search reusing the trial
assembly); AD over the converged ``(U*, xi*)`` comes from a ``custom_jvp``
implementing the FE-level implicit function theorem

    U*_dot = -K^{-1} (dr/dp . p_dot)   at U*,

solved through the same linear-solver dispatch so the K-side cotangent
flows via the solver's custom_linear_solve rules; xi*_dot follows by
chained jvp of the assembly's xi output.
"""
from __future__ import annotations

from collections.abc import Mapping
from functools import partial
from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from cmad_tpu import config
from cmad_tpu.fem.assembly import assemble_global
from cmad_tpu.fem.fe_problem import FEProblem
from cmad_tpu.fem.kernel_arrays import FEKernelArrays
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _embedded_bc_enforce,
    _embedded_residual,
    jax_block_gmres,
    jax_cg,
    jax_gmres,
    scipy_lu,
)
from cmad_tpu.typing import JaxArray, Params, Scalar
from cmad_tpu.util.line_search import DEFAULT_LINE_SEARCH_SETTINGS, line_search


# FE global Newton defaults to the NON-MONOTONE acceptance policy: the
# merit ||r|| transiently increases at elastic/plastic switches on the
# convergent path (see the host-loop comment below and
# benchmarks/notch_hosford/README.md); a monotone best-merit fallback
# takes damped steps exactly there. The MP local Newton keeps the
# monotone default (DEFAULT_LINE_SEARCH_SETTINGS).
FE_LINE_SEARCH_DEFAULTS: dict[str, Any] = {
    **DEFAULT_LINE_SEARCH_SETTINGS, "nonmonotone": True,
}


def default_nonlinear_settings() -> dict[str, Any]:
    abs_tol, rel_tol = config.newton_tols("fe_global")
    return {"max iters": 20, "abs tol": abs_tol, "rel tol": rel_tol,
            "print convergence": False,
            "line search": FE_LINE_SEARCH_DEFAULTS}


DEFAULT_LINEAR_SOLVER_SETTINGS: dict[str, Any] = {
    "type": "direct", "rtol": 1.0e-10, "max iters": None, "restart": 20,
    "preconditioner": {"type": "jacobi"},
}


class _FrozenDict(tuple):
    """Hashable dict carrier for custom_jvp nondiff_argnums."""


def freeze_settings(value: Any) -> Any:
    if isinstance(value, Mapping):
        return _FrozenDict((k, freeze_settings(v))
                           for k, v in sorted(value.items()))
    if isinstance(value, list):
        return tuple(freeze_settings(v) for v in value)
    return value


def thaw_settings(value: Any) -> Any:
    if isinstance(value, _FrozenDict):
        return {k: thaw_settings(v) for k, v in value}
    if isinstance(value, tuple):
        return [thaw_settings(v) for v in value]
    return value


def get_two_level_pattern(fe_problem: FEProblem,
                          target_nodes_per_aggregate: int = 48):
    """Build (once per problem, host-side static) and cache the
    aggregation prolongator for the two-level arm — rigid-body slots
    for the single displacement field, RBM+constant-pressure for the
    mixed u-p layout."""
    cached = getattr(fe_problem, "_two_level_pattern", None)
    if cached is not None and cached[0] == target_nodes_per_aggregate:
        return cached[1]
    from cmad_tpu.fem.two_level import (
        build_two_level_pattern,
        build_two_level_pattern_mixed,
    )

    comps = [int(c) for c in fe_problem.dof_map.num_dofs_per_basis_fn]
    if comps == [3]:
        builder = build_two_level_pattern
    elif comps == [3, 1]:
        builder = build_two_level_pattern_mixed
    else:
        raise ValueError(
            "two_level preconditioner supports the u (3/node) or "
            f"u+p (3,1/node) layouts; got components {comps}")
    pattern = builder(
        np.asarray(fe_problem.mesh.nodes, dtype=np.float64),
        np.asarray(fe_problem.kernel_arrays.prescribed_indices),
        fe_problem.dof_map.num_total_dofs,
        target_nodes_per_aggregate=target_nodes_per_aggregate)
    from cmad_tpu.fem.two_level import attach_coarse_scatter
    sp = fe_problem.kernel_arrays.embedded_sparsity
    pattern = attach_coarse_scatter(pattern, np.asarray(sp.indptr),
                                    np.asarray(sp.col_indices))
    object.__setattr__(fe_problem, "_two_level_pattern",
                       (target_nodes_per_aggregate, pattern))
    return pattern


def solve_linear(K_data: JaxArray, fe_problem: FEProblem,
                 fe_arrays: FEKernelArrays, rhs: JaxArray,
                 settings: dict[str, Any],
                 rtol_override: JaxArray | None = None) -> JaxArray:
    """Dispatch on settings['type'] (direct | cg | gmres) and the
    preconditioner spec (jacobi | block). ``rtol_override`` (traced)
    replaces the static rtol for the iterative arms — the hook for
    inexact-Newton forcing terms.

    ``equilibrate`` (default 'auto': on for mixed multi-field layouts):
    symmetric diagonal equilibration as a change of variables around
    ANY arm. Mixed u-p plastic tangents carry cond ~ 3.5e12 from the
    ~1e12 diagonal spread between pressure-stabilization and E-scaled
    displacement rows — unsolvable in f32 by any method (even SuperLU
    attained 0.55 relative residual); equilibrated the measured cond is
    ~1.6e2 and ordinary f32 Krylov converges. This is an accuracy
    transformation, not preconditioning: in floating point it raises
    the attainable accuracy, which an (exact-arithmetic-equivalent)
    Jacobi preconditioner cannot.
    """
    sparsity = fe_arrays.embedded_sparsity
    kind = settings["type"]

    equil = settings.get("equilibrate", "auto")
    if equil == "auto":
        equil = fe_arrays.block_sparsity is not None
    row_scale = None
    s_eq = None
    if equil:
        from cmad_tpu.fem.sparse_solve import equilibrate_data

        K_data, s_eq = equilibrate_data(K_data, sparsity)
        rhs = s_eq * rhs
        row_scale = 1.0 / s_eq  # coarse-basis correction for two_level

    def _finish(x):
        return s_eq * x if s_eq is not None else x

    if kind == "direct":
        return _finish(scipy_lu(K_data, sparsity, rhs))

    rtol = settings["rtol"] if rtol_override is None else rtol_override
    precon_spec = settings.get("preconditioner", {"type": "jacobi"})
    precon = precon_spec["type"]

    if settings.get("solve dtype") == "mixed":
        # f64 iterative refinement around an f32 inner Krylov solve —
        # the TPU arm for reference-grade (f64) linear-solve accuracy
        # at f32 SpMV cost. No-op unless x64 is enabled.
        from cmad_tpu.fem.sparse_solve import jax_cg_mixed, jax_gmres_mixed

        pattern = None
        if precon == "two_level":
            pattern = get_two_level_pattern(
                fe_problem, precon_spec.get("aggregate nodes", 48))
        if kind == "cg":
            return _finish(jax_cg_mixed(
                K_data, sparsity, rhs, rtol=rtol,
                max_iters=settings["max iters"], precon=precon,
                pattern=pattern, degree=precon_spec.get("degree", 3),
                row_scale=row_scale))
        if kind == "gmres":
            return _finish(jax_gmres_mixed(
                K_data, sparsity, rhs, pattern=pattern, rtol=rtol,
                max_iters=settings["max iters"],
                restart=settings["restart"], row_scale=row_scale))
        raise ValueError(
            f"solve dtype 'mixed' supports cg/gmres, not {kind!r}")

    if kind == "cg":
        if precon == "jacobi":
            return _finish(jax_cg(K_data, sparsity, rhs, rtol=rtol,
                                  max_iters=settings["max iters"]))
        if precon == "chebyshev":
            from cmad_tpu.fem.sparse_solve import jax_cg_chebyshev
            return _finish(jax_cg_chebyshev(
                K_data, sparsity, rhs, rtol=rtol,
                max_iters=settings["max iters"],
                degree=precon_spec.get("degree", 3)))
        if precon == "two_level":
            from cmad_tpu.fem.sparse_solve import jax_cg_two_level
            pattern = get_two_level_pattern(
                fe_problem,
                precon_spec.get("aggregate nodes", 48))
            return _finish(jax_cg_two_level(
                K_data, sparsity, rhs, pattern, rtol=rtol,
                max_iters=settings["max iters"], row_scale=row_scale))
        raise ValueError(
            f"unknown cg preconditioner {precon!r}; this build supports "
            "'jacobi', 'chebyshev', and 'two_level' (no pyamg — use "
            "gmres + block for mixed-field preconditioning)")
    if kind == "gmres":
        if precon == "jacobi":
            return _finish(jax_gmres(K_data, sparsity, rhs, rtol=rtol,
                                     max_iters=settings["max iters"],
                                     restart=settings["restart"]))
        if precon == "two_level":
            from cmad_tpu.fem.sparse_solve import jax_gmres_two_level
            pattern = get_two_level_pattern(
                fe_problem, precon_spec.get("aggregate nodes", 48))
            return _finish(jax_gmres_two_level(
                K_data, sparsity, rhs, pattern, rtol=rtol,
                max_iters=settings["max iters"],
                restart=settings["restart"], row_scale=row_scale,
                smoother=precon_spec.get("smoother", "auto")))
        if precon == "block":
            if fe_arrays.block_sparsity is None:
                raise ValueError(
                    "block preconditioner requires > 1 residual block")
            return _finish(jax_block_gmres(
                K_data, sparsity, rhs, fe_arrays.block_sparsity,
                coupling=precon_spec.get("coupling", "lower"),
                diagonal_block=precon_spec.get("diagonal_block",
                                               "assembled"),
                inner=precon_spec.get("inner", "jacobi"),
                degree=precon_spec.get("degree"),
                rtol=rtol, max_iters=settings["max iters"],
                restart=settings["restart"]))
        raise ValueError(
            f"unknown gmres preconditioner {precon!r}; expected 'jacobi' "
            "or 'block'")
    raise ValueError(
        f"unknown linear solver type {kind!r}; expected 'direct', 'cg', "
        "or 'gmres'")


def _fe_newton_primal(fe_problem, fe_arrays, params_by_block, U_prev,
                      xi_prev_by_block, t, nls, lss):
    max_iters = nls["max iters"]
    abs_tol, rel_tol = nls["abs tol"], nls["rel tol"]
    ls = {**FE_LINE_SEARCH_DEFAULTS, **nls.get("line search", {})}
    ls_max_evals = ls["max evals"]

    presc_idx = fe_arrays.prescribed_indices
    presc_vals = jnp.asarray(fe_problem.dof_map.evaluate_prescribed_values(
        fe_arrays.dbc_arrays, t))
    sparsity = fe_arrays.embedded_sparsity

    def assemble_enforced(U):
        K_bcoo, R, xi = assemble_global(
            fe_problem, fe_arrays, params_by_block, U, U_prev, t,
            xi_prev_by_block=xi_prev_by_block)
        K_data, K_ii = _embedded_bc_enforce(K_bcoo, presc_idx)
        r = _embedded_residual(R, K_bcoo, U, presc_idx, presc_vals, K_ii)
        return r, K_data, xi

    r0, K0, xi0 = assemble_enforced(U_prev)
    R0 = jnp.maximum(jnp.linalg.norm(r0), abs_tol)

    def print_line(k, r):
        if nls["print convergence"]:
            norm = jnp.linalg.norm(r)
            jax.debug.print(" > ({k}) Newton: abs ||R|| = {a:.6e} "
                            "rel ||R|| = {rel:.6e}",
                            k=k, a=norm, rel=norm / R0)

    print_line(1, r0)

    def cond(state):
        i, r, _K, _U, _xi, _np = state
        norm = jnp.linalg.norm(r)
        return (i < max_iters) & (norm >= abs_tol) & (norm >= rel_tol * R0)

    adaptive = bool(lss.get("adaptive rtol", False)) \
        and lss["type"] in ("cg", "gmres")

    def body(state):
        i, r, K_data, U, xi, norm_prev = state
        norm = jnp.linalg.norm(r)
        rtol_k = None
        if adaptive:
            # Eisenstat-Walker choice 2 forcing term: the inner solve's
            # tolerance follows the observed Newton contraction
            # (gamma (||r_k|| / ||r_{k-1}||)^2), so early iterations
            # solve loosely and the endgame tightens to the floor
            rtol_k = jnp.clip(0.9 * (norm / norm_prev) ** 2,
                              lss["rtol"], 1e-2)
        dU = solve_linear(K_data, fe_problem, fe_arrays, -r, lss,
                          rtol_override=rtol_k)
        if ls_max_evals > 0:
            r_sq = r @ r

            def probe(alpha):
                r_t, K_t, xi_t = assemble_enforced(U + alpha * dU)
                _, matvec = _bcsr_operator(K_t, sparsity)
                return (0.5 * (r_t @ r_t), r_t @ matvec(dU),
                        (r_t, K_t, xi_t))

            alpha, (r_new, K_new, xi_new) = line_search(
                probe, 0.5 * r_sq, -r_sq, ls, (r, K_data, xi))
            U_new = U + alpha * dU
        else:
            U_new = U + dU
            r_new, K_new, xi_new = assemble_enforced(U_new)
        print_line(i + 2, r_new)
        return (i + 1, r_new, K_new, U_new, xi_new, norm)

    _, _, _, U_star, xi_star, _ = lax.while_loop(
        cond, body, (0, r0, K0, U_prev, xi0,
                     10.0 * jnp.linalg.norm(r0)))
    return U_star, xi_star


def _fe_newton_chunk(fe_problem, fe_arrays, params_by_block, U_prev,
                     xi_prev_by_block, t, nls, lss, U_start, R0_in,
                     max_chunk_iters: int):
    """AT MOST ``max_chunk_iters`` Newton iterations in ONE device
    program, resumable: iterate from ``U_start`` (mid-solve state)
    while the step history stays anchored at ``(U_prev, xi_prev)``.
    ``R0_in <= 0`` means "first chunk of the step" — the step-initial
    residual scale is computed here and returned for later chunks.

    Exists for duration-limited device links
    (``benchmarks/tunnel_repro/``: the remote worker kills any single
    execution past ~50 s): the stepped driver re-dispatches chunks
    until converged, paying ceil(iters/K) dispatches per step instead
    of the host loop's one per iteration, with every program bounded.
    The math per iteration (embedded assembly, adaptive-rtol solve,
    line search) is identical to :func:`_fe_newton_primal`; xi needs no
    threading between chunks because each assembly recomputes it from
    ``(U, U_prev, xi_prev)``.

    Returns ``(U, xi, ||r||, R0)``.
    """
    abs_tol, rel_tol = nls["abs tol"], nls["rel tol"]
    ls = {**FE_LINE_SEARCH_DEFAULTS, **nls.get("line search", {})}
    ls_max_evals = ls["max evals"]

    presc_idx = fe_arrays.prescribed_indices
    presc_vals = jnp.asarray(fe_problem.dof_map.evaluate_prescribed_values(
        fe_arrays.dbc_arrays, t))
    sparsity = fe_arrays.embedded_sparsity

    def assemble_enforced(U):
        K_bcoo, R, xi = assemble_global(
            fe_problem, fe_arrays, params_by_block, U, U_prev, t,
            xi_prev_by_block=xi_prev_by_block)
        K_data, K_ii = _embedded_bc_enforce(K_bcoo, presc_idx)
        r = _embedded_residual(R, K_bcoo, U, presc_idx, presc_vals, K_ii)
        return r, K_data, xi

    r0, K0, xi0 = assemble_enforced(U_start)
    R0 = jnp.where(R0_in > 0, R0_in,
                   jnp.maximum(jnp.linalg.norm(r0), abs_tol))

    def cond(state):
        i, r, _K, _U, _xi, _np = state
        norm = jnp.linalg.norm(r)
        return ((i < max_chunk_iters) & (norm >= abs_tol)
                & (norm >= rel_tol * R0))

    adaptive = bool(lss.get("adaptive rtol", False)) \
        and lss["type"] in ("cg", "gmres")

    def body(state):
        i, r, K_data, U, xi, norm_prev = state
        norm = jnp.linalg.norm(r)
        rtol_k = None
        if adaptive:
            rtol_k = jnp.clip(0.9 * (norm / norm_prev) ** 2,
                              lss["rtol"], 1e-2)
        dU = solve_linear(K_data, fe_problem, fe_arrays, -r, lss,
                          rtol_override=rtol_k)
        if ls_max_evals > 0:
            r_sq = r @ r

            def probe(alpha):
                r_t, K_t, xi_t = assemble_enforced(U + alpha * dU)
                _, matvec = _bcsr_operator(K_t, sparsity)
                return (0.5 * (r_t @ r_t), r_t @ matvec(dU),
                        (r_t, K_t, xi_t))

            alpha, (r_new, K_new, xi_new) = line_search(
                probe, 0.5 * r_sq, -r_sq, ls, (r, K_data, xi))
            U_new = U + alpha * dU
        else:
            U_new = U + dU
            r_new, K_new, xi_new = assemble_enforced(U_new)
        return (i + 1, r_new, K_new, U_new, xi_new, norm)

    # norm_prev seeds the Eisenstat-Walker term; across chunk
    # boundaries the restart loses one step of contraction history,
    # which only loosens the FIRST inner rtol of the chunk (safe)
    _, r_star, _, U_star, xi_star, _ = lax.while_loop(
        cond, body, (0, r0, K0, U_start, xi0,
                     10.0 * jnp.linalg.norm(r0)))
    return U_star, xi_star, jnp.linalg.norm(r_star), R0


def fe_newton_solve(fe_problem: FEProblem,
                    params_by_block: Mapping[str, Params],
                    U_prev, xi_prev_by_block=None, t: float = 0.0,
                    nonlinear_solver_settings: dict | None = None,
                    linear_solver_settings: dict | None = None):
    """Public quasi-static Newton driver; see module docstring.

    Initial iterate is U_prev (warm start); the current-step boundary
    targets enter through the embedded residual's coupling term.
    Returns (U_star, xi_star_by_block).
    """
    nls = {**default_nonlinear_settings(),
           **(nonlinear_solver_settings or {})}
    lss = {**DEFAULT_LINEAR_SOLVER_SETTINGS,
           **(linear_solver_settings or {})}
    dtype = config.real_dtype()
    U_prev = jnp.asarray(U_prev, dtype=dtype)
    xi_prev = ({k: jnp.asarray(v) for k, v in xi_prev_by_block.items()}
               if xi_prev_by_block else {})
    return _fe_newton_solve_ad(
        fe_problem, fe_problem.kernel_arrays, params_by_block, U_prev,
        xi_prev, t, freeze_settings(nls), freeze_settings(lss))


@partial(jax.custom_jvp, nondiff_argnums=(0, 6, 7))
def _fe_newton_solve_ad(fe_problem, fe_arrays, params_by_block, U_prev,
                        xi_prev_by_block, t, nls_frozen, lss_frozen):
    return _fe_newton_primal(
        fe_problem, fe_arrays, params_by_block, U_prev, xi_prev_by_block,
        t, thaw_settings(nls_frozen), thaw_settings(lss_frozen))


def _ift_tangents(fe_problem, fe_arrays, lss, U_star,
                  params_by_block, U_prev, xi_prev_by_block, t, p_dot):
    """IFT tangents of the converged FE Newton at ``U_star``:
    differentiate the embedded residual at the fixed point, solve
    K dU* = -dR, and push through the per-IP local solves for dxi*.
    Shared by the solve-from-scratch rule and the stored-solution
    pass-through (``_fe_solution_at_ad``)."""
    presc_idx = fe_arrays.prescribed_indices

    def r_of_p(params_, Up_, xp_, t_):
        pv = jnp.asarray(fe_problem.dof_map.evaluate_prescribed_values(
            fe_arrays.dbc_arrays, t_))
        K_bcoo, R, _ = assemble_global(
            fe_problem, fe_arrays, params_, U_star, Up_, t_,
            xi_prev_by_block=xp_)
        _, K_ii = _embedded_bc_enforce(K_bcoo, presc_idx)
        return _embedded_residual(R, K_bcoo, U_star, presc_idx, pv, K_ii)

    _, Rp_dot = jax.jvp(r_of_p,
                        (params_by_block, U_prev, xi_prev_by_block, t),
                        p_dot)

    K_bcoo, _, _ = assemble_global(
        fe_problem, fe_arrays, params_by_block, U_star, U_prev, t,
        xi_prev_by_block=xi_prev_by_block)
    K_data, _ = _embedded_bc_enforce(K_bcoo, presc_idx)
    U_star_dot = solve_linear(K_data, fe_problem, fe_arrays, -Rp_dot, lss)

    def xi_of(U_, params_, Up_, xp_, t_):
        _, _, xi = assemble_global(
            fe_problem, fe_arrays, params_, U_, Up_, t_,
            xi_prev_by_block=xp_)
        return xi

    _, xi_star_dot = jax.jvp(
        xi_of, (U_star, params_by_block, U_prev, xi_prev_by_block, t),
        (U_star_dot, *p_dot))
    return U_star_dot, xi_star_dot


@_fe_newton_solve_ad.defjvp
def _fe_newton_solve_ad_jvp(fe_problem, nls_frozen, lss_frozen, primals,
                            tangents):
    fe_arrays, params_by_block, U_prev, xi_prev_by_block, t = primals
    p_dot = tangents[1:]
    lss = thaw_settings(lss_frozen)

    U_star, xi_star = _fe_newton_solve_ad(
        fe_problem, fe_arrays, params_by_block, U_prev, xi_prev_by_block,
        t, nls_frozen, lss_frozen)
    U_star_dot, xi_star_dot = _ift_tangents(
        fe_problem, fe_arrays, lss, U_star, params_by_block, U_prev,
        xi_prev_by_block, t, p_dot)
    return (U_star, xi_star), (U_star_dot, xi_star_dot)


@partial(jax.custom_jvp, nondiff_argnums=(0, 6, 7))
def _fe_solution_at_ad(fe_problem, fe_arrays, params_by_block, U_prev,
                       xi_prev_by_block, t, nls_frozen, lss_frozen,
                       U_star):
    """The converged FE Newton step AS IF solved, given its known
    solution ``U_star``: the primal skips the Newton loop entirely
    (one local-solve pass recovers xi* at U*), while differentiation
    applies the SAME IFT rule as ``_fe_newton_solve_ad`` — so a
    reverse pass over a stored trajectory costs ~one Newton iteration
    (assembly + transpose solve) instead of a full re-solve. ``U_star``
    is treated as data: its tangent is ignored (the IFT already
    accounts for the solution's dependence on the inputs).

    Used by the stepped adjoint (``fem/stepped_adjoint.py``); parity
    with the re-solving path is asserted in
    ``tests/fem/test_stepped_adjoint.py``."""
    del nls_frozen, lss_frozen
    _, _, xi_solved = assemble_global(
        fe_problem, fe_arrays, params_by_block, U_star, U_prev, t,
        xi_prev_by_block=xi_prev_by_block)
    return U_star, xi_solved


@_fe_solution_at_ad.defjvp
def _fe_solution_at_ad_jvp(fe_problem, nls_frozen, lss_frozen, primals,
                           tangents):
    fe_arrays, params_by_block, U_prev, xi_prev_by_block, t, U_star = \
        primals
    # unpack by name so a signature change fails loudly instead of
    # silently mis-slicing the tangent tuple: U_star is data (its
    # tangent is dropped — the IFT already accounts for the solution's
    # dependence on the inputs), fe_arrays is geometry
    (_fe_arrays_dot, params_dot, U_prev_dot, xi_prev_dot, t_dot,
     _U_star_dot) = tangents
    p_dot = (params_dot, U_prev_dot, xi_prev_dot, t_dot)
    lss = thaw_settings(lss_frozen)

    U_out, xi_star = _fe_solution_at_ad(
        fe_problem, fe_arrays, params_by_block, U_prev, xi_prev_by_block,
        t, nls_frozen, lss_frozen, U_star)
    U_star_dot, xi_star_dot = _ift_tangents(
        fe_problem, fe_arrays, lss, U_star, params_by_block, U_prev,
        xi_prev_by_block, t, p_dot)
    return (U_out, xi_star), (U_star_dot, xi_star_dot)


def fe_newton_solve_host(fe_problem: FEProblem,
                         params_by_block: Mapping[str, Params],
                         U_prev, xi_prev_by_block=None, t: float = 0.0,
                         nonlinear_solver_settings: dict | None = None,
                         linear_solver_settings: dict | None = None,
                         _jit_cache: dict | None = None):
    """Host-driven FE Newton: one device dispatch per assemble and per
    linear solve, with a host synchronization between iterations.

    Primal-only counterpart of :func:`fe_newton_solve` for environments
    where a single long device program is fragile (remote-attached
    accelerators can kill sustained multi-minute programs) and for
    reference-parity imperative solver logging: returns
    ``(U*, xi*, iters, final_norm)``.

    Pass a persistent ``_jit_cache`` dict across calls (e.g. per time
    loop) so the assemble/solve closures compile once.
    """
    nls = {**default_nonlinear_settings(),
           **(nonlinear_solver_settings or {})}
    lss = {**DEFAULT_LINEAR_SOLVER_SETTINGS,
           **(linear_solver_settings or {})}
    dtype = config.real_dtype()
    U = jnp.asarray(U_prev, dtype=dtype)
    U_prev = U
    xi_prev = ({k: jnp.asarray(v) for k, v in xi_prev_by_block.items()}
               if xi_prev_by_block else {})

    presc_idx = fe_problem.kernel_arrays.prescribed_indices
    presc_vals = jnp.asarray(fe_problem.dof_map.evaluate_prescribed_values(
        fe_problem.kernel_arrays.dbc_arrays, t))

    cache = _jit_cache if _jit_cache is not None else {}
    if "assemble" not in cache:
        def assemble(fe_arrays, params, U, U_prev, xi_prev, t, pv):
            K_bcoo, R, xi = assemble_global(
                fe_problem, fe_arrays, params, U, U_prev, t,
                xi_prev_by_block=xi_prev)
            K_data, K_ii = _embedded_bc_enforce(K_bcoo, presc_idx)
            r = _embedded_residual(R, K_bcoo, U, presc_idx, pv, K_ii)
            return r, K_data, xi

        lss_frozen = freeze_settings(lss)

        def solve_and_probe(K_data, fe_arrays, r, rtol_k, U, params,
                            U_prev, xi_prev, t, pv):
            """One device program per Newton iteration in the fast path:
            linear solve + attained-quality matvec + the full-step
            (alpha=1) trial assembly, fused so a remote-attached device
            pays ONE host round-trip instead of two. The accepted
            trial's (r, K, xi) seed the next iteration, so no separate
            assemble dispatch is needed unless the line search
            backtracks."""
            dU = solve_linear(K_data, fe_problem, fe_arrays, -r,
                              thaw_settings(lss_frozen),
                              rtol_override=rtol_k)
            # attained linear quality (one extra matvec): surfaced so a
            # cap-truncated Krylov solve can never pass silently
            _, matvec = _bcsr_operator(
                K_data, fe_problem.kernel_arrays.embedded_sparsity)
            attained = (jnp.linalg.norm(matvec(dU) + r)
                        / jnp.maximum(jnp.linalg.norm(r),
                                      jnp.finfo(r.dtype).tiny))
            U_trial = U + dU
            r_t, K_t, xi_t = assemble(fe_arrays, params, U_trial,
                                      U_prev, xi_prev, t, pv)
            return (dU, attained, U_trial, r_t, K_t, xi_t,
                    jnp.linalg.norm(r_t))

        cache["assemble"] = jax.jit(assemble)
        cache["solve_and_probe"] = jax.jit(solve_and_probe)

    fe_arrays = fe_problem.kernel_arrays
    r, K_data, xi = cache["assemble"](fe_arrays, params_by_block, U,
                                      U_prev, xi_prev, t, presc_vals)
    norm0 = max(float(jnp.linalg.norm(r)), float(nls["abs tol"]))
    norm = norm0
    it = 0
    stagnant = 0
    worst_linear = 0.0
    best = (U, r, K_data, xi, norm)
    best_norm = norm
    adaptive = bool(lss.get("adaptive rtol", False)) \
        and lss["type"] in ("cg", "gmres")
    norm_hist = norm0
    while (it < nls["max iters"] and norm >= nls["abs tol"]
           and norm >= nls["rel tol"] * norm0):
        if adaptive:
            # Eisenstat-Walker choice 2 on the host-observed norms
            eta = 0.9 * (norm / norm_hist) ** 2 if it else 1e-2
            rtol_k = jnp.asarray(min(max(eta, lss["rtol"]), 1e-2),
                                 dtype=config.real_dtype())
        else:
            rtol_k = jnp.asarray(lss["rtol"], dtype=config.real_dtype())
        norm_hist = norm
        (dU, lin_attained, U_full, r_full, K_full, xi_full,
         norm_full) = cache["solve_and_probe"](
            K_data, fe_arrays, r, rtol_k, U, params_by_block, U_prev,
            xi_prev, t, presc_vals)
        lin_attained = float(lin_attained)
        worst_linear = max(worst_linear, lin_attained)
        requested = float(rtol_k) if lss["type"] != "direct" else 1e-12
        if lin_attained > max(100.0 * requested, 1e-4):
            import warnings

            warnings.warn(
                f"linear solver ({lss['type']}) at t={t} attained "
                f"relative residual {lin_attained:.3e} vs requested "
                f"{requested:.1e} — iteration cap or preconditioner "
                "too weak; the Newton step quality is degraded",
                RuntimeWarning, stacklevel=2)
        # NON-MONOTONE backtracking line search on ||r||: Armijo with
        # halving, but when no probe decreases the residual, accept the
        # FULL step anyway (unless it blows up >10x the best norm seen).
        # The merit ||r|| is nonsmooth at the elastic/plastic switch and
        # transiently INCREASES on the convergent path — measured on
        # the Hosford notch step 1 the traced Newton goes
        # 3.96e-2 -> 4.00e-2 -> 5.0e-3 -> ... -> 1.3e-10; a monotone
        # guard kills the solve exactly at that plateau. Each probe
        # reuses its full (r, K, xi) assembly as the accepted-state aux.
        ls_host = {**FE_LINE_SEARCH_DEFAULTS,
                   **nls.get("line search", {})}
        max_probes = max(1, int(ls_host.get("max evals", 5)))
        # the alpha=1 probe rode along with the linear solve above
        full_trial = (U_full, r_full, K_full, xi_full,
                      float(norm_full))  # host sync
        accepted = least_bad = None
        alpha = 1.0
        for _probe in range(max_probes):
            if _probe == 0:
                trial = full_trial
            else:
                U_trial = U + alpha * dU
                r_trial, K_trial, xi_trial = cache["assemble"](
                    fe_arrays, params_by_block, U_trial, U_prev,
                    xi_prev, t, presc_vals)
                norm_trial = float(jnp.linalg.norm(r_trial))  # host sync
                trial = (U_trial, r_trial, K_trial, xi_trial,
                         norm_trial)
            if least_bad is None or trial[4] < least_bad[4]:
                least_bad = trial
            if trial[4] <= (1.0 - 1e-4 * alpha) * norm:
                accepted = trial
                break
            alpha *= 0.5
        if accepted is None:
            accepted = (full_trial
                        if full_trial[4] <= 10.0 * best_norm
                        else least_bad)
        U_trial, r_trial, K_trial, xi_trial, norm_trial = accepted
        it += 1
        if nls["print convergence"]:
            print(f" > ({it}) Newton: abs ||R|| = {norm_trial:.6e} "
                  f"rel ||R|| = {norm_trial / norm0:.6e}")
        # always move (non-monotone); keep the best state seen so the
        # cap/floor exit can never return worse than the best iterate
        U, r, K_data, xi, norm = (U_trial, r_trial, K_trial, xi_trial,
                                  norm_trial)
        if norm < 0.99 * best_norm:
            best = (U, r, K_data, xi, norm)
            best_norm = norm
            stagnant = 0
        else:
            # floating-point floor / genuine stagnation detection: the
            # host loop sees true norms, so it can stop once iterations
            # stop paying — but only after enough non-improving moves to
            # ride out the transient plateaus of nonsmooth plasticity
            stagnant += 1
            if stagnant >= 6:
                break
    if best_norm < norm:
        U, r, K_data, xi, norm = best

    # a stagnation/iteration-cap exit far above BOTH tolerances means
    # the returned state is unconverged (e.g. a preconditioner too weak
    # for this tangent) — it is recorded in the caller's log, but a
    # silently wrong plasticity step poisons the whole history, so warn
    if (norm >= 100.0 * float(nls["abs tol"])
            and norm >= 100.0 * float(nls["rel tol"]) * norm0):
        import warnings

        warnings.warn(
            f"host FE Newton at t={t} stopped at ||R|| = {norm:.3e} "
            f"after {it} iterations (abs tol {float(nls['abs tol']):.1e}"
            f", rel {float(nls['rel tol']):.1e} x ||R0|| = {norm0:.3e})"
            " — the step is likely unconverged; check the linear-solver"
            " configuration", RuntimeWarning, stacklevel=2)
    return U, xi, it, norm, worst_linear


def fe_quasistatic_drive_host(fe_problem: FEProblem, t_schedule,
                              nonlinear_solver_settings: dict | None = None,
                              linear_solver_settings: dict | None = None,
                              U_init=None, xi_init_by_block=None):
    """Host-driven quasi-static time loop (one Newton per step, each
    iteration a separate device dispatch). Returns
    ``(FEState, solver_log)`` where solver_log is the per-step
    ``{"iters", "final_residual"}`` list. ``U_init``/``xi_init_by_block``
    seed a restart from a recorded converged state."""
    from cmad_tpu.fem.assembly import params_by_block_from_models
    from cmad_tpu.fem.fe_problem import FEState
    from cmad_tpu.fem.xi_carrier import (
        pack_xi_by_block,
        unpack_xi_by_block,
    )

    params = params_by_block_from_models(fe_problem)
    state = FEState.from_problem(fe_problem, t_init=float(t_schedule[0]),
                                 U_init=None if U_init is None
                                 else np.asarray(U_init),
                                 xi_init_by_block=xi_init_by_block)
    U = jnp.asarray(state.U_at(0), dtype=config.real_dtype())
    # carrier-resident state across the whole drive (fem/xi_carrier.py):
    # packed once; each step's materialized AoS view costs one small
    # unpack dispatch against the host loop's ~5-10 dispatches per step
    xi = pack_xi_by_block(
        fe_problem, {b: jnp.asarray(state.xi_at(0, b))
                     for b in fe_problem.models_by_block})
    cache: dict = {}
    log = []
    for t in [float(x) for x in t_schedule[1:]]:
        U, xi_solved, iters, res, worst_linear = fe_newton_solve_host(
            fe_problem, params, U, xi, t=t,
            nonlinear_solver_settings=nonlinear_solver_settings,
            linear_solver_settings=linear_solver_settings,
            _jit_cache=cache)
        xi = {**xi, **xi_solved}
        state.append(np.asarray(U),
                     {b: np.asarray(v) for b, v in unpack_xi_by_block(
                         fe_problem, xi).items()}, t_new=t)
        log.append({"iters": int(iters), "final_residual": float(res),
                    "worst_linear_rel_residual": worst_linear})
    return state, log
