"""End-to-end element-sharded FE Newton solve + quasi-static trajectory.

SURVEY.md §2.2 row 1, completed: round 1 sharded the residual assembly
and a standalone CG; this module lifts them into one jitted Newton loop
(and a scanned time loop) running on a ``jax.sharding.Mesh``:

- per-element carriers (gather/scatter indices, geometry, per-IP state)
  sharded on the ``elem`` axis (``parallel/fe.py``); tangent/residual
  assembly runs as SPMD — XLA partitions the element vmap and inserts
  the reductions for the COO dedup and residual scatters;
- the linear solve is the explicitly-collective row-sharded CG
  (``parallel/solve.py``), optionally with the two-level
  aggregation/RBM preconditioner (its coarse correction is a small
  replicated dense solve — no communication beyond the matvec psum);
- Newton logic (norms, line search) operates on replicated vectors, so
  every device runs the identical iteration.

Validated against the single-device driver on the 8-virtual-CPU mesh
(tests/parallel/test_sharded_newton.py) and exercised by the driver's
``dryrun_multichip``.
"""
from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from cmad_tpu import config
from cmad_tpu.fem.assembly import assemble_global
from cmad_tpu.fem.fe_problem import FEProblem
from cmad_tpu.fem.nonlinear_solver import (
    FE_LINE_SEARCH_DEFAULTS,
    default_nonlinear_settings,
    get_two_level_pattern,
)
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _embedded_bc_enforce,
    _embedded_residual,
    coo_rows_from_indptr,
)
from cmad_tpu.parallel.fe import shard_fe_arrays, shard_xi_by_block
from cmad_tpu.parallel.solve import build_row_sharded_pattern
from cmad_tpu.typing import JaxArray, Params
from cmad_tpu.util.line_search import line_search


def _sharded_cg_solve(K_data, sparsity, rhs, mesh, axis_name, row_pattern,
                      precon_builder, rtol, max_iters):
    """Row-sharded-matvec CG with a pluggable replicated preconditioner.

    Mirrors parallel/solve.py's sharded_jax_cg but lets the caller
    supply the preconditioner (jacobi or two-level) from the replicated
    unique data; wrapped in custom_linear_solve so trajectory AD works.
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows_sh, cols_sh, pad = row_pattern
    unique = jnp.zeros(sparsity.num_unique, dtype=K_data.dtype
                       ).at[sparsity.segment_ids].add(K_data[sparsity.perm])
    vals = (jnp.concatenate([unique, jnp.zeros(pad, dtype=unique.dtype)])
            if pad else unique)
    vals = lax.with_sharding_constraint(
        vals, NamedSharding(mesh, P(axis_name)))
    n = sparsity.n

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
             out_specs=P())
    def mv(v, r, c, x):
        y_local = jnp.zeros(n, dtype=v.dtype).at[r].add(v * x[c])
        return lax.psum(y_local, axis_name)

    matvec = lambda x: mv(vals, rows_sh, cols_sh, x)  # noqa: E731
    precon = precon_builder(unique)

    def solve(_mv, rhs_):
        x, _ = jax.scipy.sparse.linalg.cg(
            matvec, rhs_, M=precon, tol=rtol, maxiter=max_iters)
        return x

    return lax.custom_linear_solve(matvec, rhs, solve, symmetric=True)


def build_sharded_fe_newton(fe_problem: FEProblem, mesh: Mesh,
                            axis_name: str = "elem",
                            preconditioner: str = "jacobi",
                            rtol: float = 1e-8,
                            max_iters: int | None = None,
                            nonlinear_solver_settings: dict[str, Any]
                            | None = None):
    """Build (newton_step, arrays_sharded): a jittable mesh-sharded FE
    Newton solve and the sharded kernel-array carrier it consumes.

    ``newton_step(arrays, params_by_block, U_prev, xi_prev_by_block, t,
    presc_vals) -> (U_star, xi_star_by_block)`` mirrors the single-
    device ``_fe_newton_primal`` (while_loop Newton + cubic line
    search), with sharded assembly and the row-sharded CG.
    """
    nls = {**default_nonlinear_settings(),
           **(nonlinear_solver_settings or {})}
    ls = {**FE_LINE_SEARCH_DEFAULTS, **nls.get("line search", {})}
    sparsity = fe_problem.kernel_arrays.embedded_sparsity
    presc_idx = fe_problem.kernel_arrays.prescribed_indices
    row_pattern = build_row_sharded_pattern(sparsity, mesh, axis_name)
    arrays_sharded = shard_fe_arrays(fe_problem, mesh, axis_name)

    if preconditioner == "two_level":
        pattern = get_two_level_pattern(fe_problem)
        rows = coo_rows_from_indptr(sparsity)

        def precon_builder(unique):
            from cmad_tpu.fem.two_level import (
                make_two_level_preconditioner,
            )

            diag = unique[sparsity.diag_idx]
            return make_two_level_preconditioner(
                pattern, unique, rows, sparsity.col_indices, diag)
    elif preconditioner == "jacobi":
        def precon_builder(unique):
            diag = unique[sparsity.diag_idx]
            return lambda x: x / diag
    else:
        raise ValueError(
            f"sharded Newton supports 'jacobi' or 'two_level' "
            f"preconditioners, not {preconditioner!r}")

    max_newton = nls["max iters"]
    abs_tol, rel_tol = nls["abs tol"], nls["rel tol"]
    ls_max_evals = ls["max evals"]

    def newton_step(arrays, params_by_block, U_prev, xi_prev_by_block, t,
                    presc_vals):
        def assemble_enforced(U):
            K_bcoo, R, xi = assemble_global(
                fe_problem, arrays, params_by_block, U, U_prev, t,
                xi_prev_by_block=xi_prev_by_block)
            K_data, K_ii = _embedded_bc_enforce(K_bcoo, presc_idx)
            r = _embedded_residual(R, K_bcoo, U, presc_idx, presc_vals,
                                   K_ii)
            return r, K_data, xi

        r0, K0, xi0 = assemble_enforced(U_prev)
        R0 = jnp.maximum(jnp.linalg.norm(r0), abs_tol)

        def cond(state):
            i, r, _K, _U, _xi = state
            norm = jnp.linalg.norm(r)
            return ((i < max_newton) & (norm >= abs_tol)
                    & (norm >= rel_tol * R0))

        def body(state):
            i, r, K_data, U, xi = state
            dU = _sharded_cg_solve(K_data, sparsity, -r, mesh, axis_name,
                                   row_pattern, precon_builder, rtol,
                                   max_iters)
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
            return (i + 1, r_new, K_new, U_new, xi_new)

        _, _, _, U_star, xi_star = lax.while_loop(
            cond, body, (0, r0, K0, U_prev, xi0))
        return U_star, xi_star

    return newton_step, arrays_sharded


def sharded_fe_quasistatic_trajectory(
        fe_problem: FEProblem, mesh: Mesh,
        params_by_block: Mapping[str, Params],
        U_init: JaxArray, xi_init_by_block, t_schedule,
        axis_name: str = "elem", preconditioner: str = "jacobi",
        rtol: float = 1e-8, max_iters: int | None = None,
        nonlinear_solver_settings: dict[str, Any] | None = None):
    """Run the full quasi-static time loop with the sharded Newton:
    ``lax.scan`` over the schedule under one jit on the mesh. Returns
    ``(U_steps, xi_steps_by_block)`` (replicated).

    Dirichlet values are pre-evaluated per step on the host (they are
    python callables of t) and scanned as an array.
    """
    newton_step, arrays = build_sharded_fe_newton(
        fe_problem, mesh, axis_name, preconditioner, rtol, max_iters,
        nonlinear_solver_settings)
    dtype = config.real_dtype()
    ts = [float(t) for t in t_schedule]
    presc = jnp.asarray(
        [fe_problem.dof_map.evaluate_prescribed_values(
            fe_problem.kernel_arrays.dbc_arrays, t) for t in ts[1:]],
        dtype=dtype)
    t_arr = jnp.asarray(ts[1:], dtype=dtype)

    xi_init = shard_xi_by_block(xi_init_by_block, mesh, axis_name)
    U0 = jnp.asarray(U_init, dtype=dtype)

    @jax.jit
    def run(arrays, params, U0, xi0, t_arr, presc):
        def step_fn(carry, inputs):
            t, pv = inputs
            U_prev, xi_prev = carry
            U, xi_solved = newton_step(arrays, params, U_prev, xi_prev,
                                       t, pv)
            xi = {**xi_prev, **xi_solved}
            return (U, xi), (U, xi)

        _, (U_steps, xi_steps) = lax.scan(step_fn, (U0, xi0),
                                          (t_arr, presc))
        return U_steps, xi_steps

    return run(arrays, params_by_block, U0, xi_init, t_arr, presc)
