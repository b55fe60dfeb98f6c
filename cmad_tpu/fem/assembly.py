"""Element + global FE assembly.

Parity: reference ``cmad/fem/assembly.py`` with two TPU-first changes:

1. **vmap over integration points** instead of a sequential
   ``lax.scan``: all (element, IP) residual/tangent evaluations — and in
   COUPLED mode all per-IP local Newton return maps — run as one big
   batched kernel (n_elems * n_ips parallel lanes on the vector units).
   The per-IP body is :func:`jax.checkpoint`-wrapped so reverse-mode
   rematerializes per-IP intermediates instead of storing them.
2. **Flat per-IP local state**: xi arrays are ``(n_elems, n_ips, nxi)``
   end to end (cmad_tpu models are flat-state), so there is no
   ravel/unravel bridging in the hot loop.

The COO emit order is ``(block, r, s)``; :func:`assembled_coo_pattern`
rebuilds the identical with-duplicates ``(rows, cols)`` stream from the
same eq-index helper the scatter uses, so the pattern and the data can
never drift apart.
"""
from __future__ import annotations

from collections.abc import Mapping
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax import vmap
from jax.experimental.sparse import BCOO

from cmad_tpu.fem.dof import GlobalDofMap, GlobalFieldLayout
from cmad_tpu.fem.elements import EntityType, ShapeFunctionsAtIP
from cmad_tpu.fem.neumann import assemble_side_neumann
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.typing import JaxArray, Params, Scalar

if TYPE_CHECKING:
    from cmad_tpu.fem.fe_problem import FEProblem
    from cmad_tpu.fem.kernel_arrays import FEKernelArrays


def params_by_block_from_models(fe_problem: "FEProblem") -> dict:
    return {name: model.parameters.values
            for name, model in fe_problem.models_by_block.items()}


def element_basis_fns(layout: GlobalFieldLayout,
                      connectivity_block: np.ndarray) -> np.ndarray:
    """Per-element global basis-fn indices for a VERTEX-anchored field."""
    fe = layout.finite_element
    if not fe.vertex_only():
        raise NotImplementedError(
            f"field {layout.name!r}: assembly supports VERTEX DOFs only")
    vpd = fe.dofs_per_entity.get(EntityType.VERTEX, 0)
    if vpd == 0:
        raise NotImplementedError(
            f"field {layout.name!r} has no VERTEX DOFs")
    n_elems, n_verts = connectivity_block.shape
    m = np.arange(vpd)
    return (connectivity_block.astype(np.intp)[:, :, None] * vpd
            + m[None, None, :]).reshape(n_elems, n_verts * vpd)


def element_eq_indices(connectivity_block: np.ndarray,
                       dof_map: GlobalDofMap, field_idx: int) -> np.ndarray:
    """(n_elems, n_dofs_per_elem * ncomp) flat global eq indices,
    basis-fn-major / component-minor."""
    layout = dof_map.field_layouts[field_idx]
    bf = element_basis_fns(layout, connectivity_block)
    nd = int(dof_map.num_dofs_per_basis_fn[field_idx])
    k = np.arange(nd)
    eq = (dof_map.block_offsets[field_idx] + bf[:, :, None] * nd
          + k[None, None, :])
    return eq.reshape(connectivity_block.shape[0], -1).astype(np.intp)


def gather_element_U(U_global, fe_arrays: "FEKernelArrays",
                     block_name: str) -> list[JaxArray]:
    """Per-field (n_elems, n_dofs_per_elem, ncomp) coefficient gathers."""
    U = jnp.asarray(U_global)
    return [U[eq] for eq in fe_arrays.u_gather_eq_by_block[block_name]]


def _body_force(shapes, forcing_fns_by_block_idx, coords_ip, t, w, det):
    return {
        idx: jnp.einsum("a,k->ak", shapes[idx].N,
                        jnp.asarray(fn(coords_ip, t))) * w * det
        for idx, fn in forcing_fns_by_block_idx.items()}


def _sum_blocks(stack, num_blocks):
    return [stack[r].sum(axis=0) for r in range(num_blocks)]


def _sum_block_matrix(stack, num_blocks):
    return [[stack[r][s].sum(axis=0) for s in range(num_blocks)]
            for r in range(num_blocks)]


def _apply_body_force(R_ip, shapes, forcing, coords, t, w, det):
    R_ip = list(R_ip)
    for idx, f_ext in _body_force(shapes, forcing, coords, t, w,
                                  det).items():
        R_ip[idx] = R_ip[idx] - f_ext
    return R_ip


def _vmap_ips(at_ip, per_elem, shared, *extra):
    """vmap a checkpointed per-IP body over the element's IP axis."""
    per_ip = vmap(jax.checkpoint(at_ip),
                  in_axes=(0, 0, 0, 0, 0) + (0,) * len(extra))
    return per_ip(shared["quad_w"], per_elem["iso_jac_det"],
                  per_elem["coords_ip"], list(shared["N"]),
                  list(per_elem["grad_N_phys"]), *extra)


def _shapes_at(N_blocks, grad_blocks, num_blocks):
    return [ShapeFunctionsAtIP(N=N_blocks[r], grad_N=grad_blocks[r])
            for r in range(num_blocks)]


def _closed_r_and_k_kernel(U_elem, U_prev_elem, params, per_elem, shared,
                           evaluator, forcing, num_blocks, t):
    h = per_elem["h"]

    def at_ip(w, det, coords, N_blocks, grad_blocks):
        shapes = _shapes_at(N_blocks, grad_blocks, num_blocks)
        R_ip, dR_ip = evaluator(params, U_elem, U_prev_elem, shapes, w,
                                det, h, 0)
        R_ip = _apply_body_force(R_ip, shapes, forcing, coords, t, w, det)
        return R_ip, dR_ip

    R_stack, dR_stack = _vmap_ips(at_ip, per_elem, shared)
    return (_sum_blocks(R_stack, num_blocks),
            _sum_block_matrix(dR_stack, num_blocks))


def _closed_r_kernel(U_elem, U_prev_elem, params, per_elem, shared,
                     evaluator, forcing, num_blocks, t):
    h = per_elem["h"]

    def at_ip(w, det, coords, N_blocks, grad_blocks):
        shapes = _shapes_at(N_blocks, grad_blocks, num_blocks)
        R_ip = evaluator(params, U_elem, U_prev_elem, shapes, w, det, h, 0)
        return _apply_body_force(R_ip, shapes, forcing, coords, t, w, det)

    return _sum_blocks(_vmap_ips(at_ip, per_elem, shared), num_blocks)


def _coupled_r_and_k_kernel(U_elem, U_prev_elem, params, per_elem, shared,
                            evaluator, forcing, num_blocks, t,
                            xi_prev_per_ip):
    """COUPLED fused kernel: the per-IP evaluator runs the local Newton
    and returns (R, IFT-corrected dR_dU, converged xi); all IPs evaluate
    in parallel under the vmap."""
    h = per_elem["h"]

    def at_ip(w, det, coords, N_blocks, grad_blocks, xi_prev_ip):
        shapes = _shapes_at(N_blocks, grad_blocks, num_blocks)
        R_ip, dR_ip, xi_ip = evaluator(params, U_elem, U_prev_elem,
                                       xi_prev_ip, shapes, w, det, h, 0)
        R_ip = _apply_body_force(R_ip, shapes, forcing, coords, t, w, det)
        return R_ip, dR_ip, xi_ip

    R_stack, dR_stack, xi_stack = _vmap_ips(at_ip, per_elem, shared,
                                            xi_prev_per_ip)
    return (_sum_blocks(R_stack, num_blocks),
            _sum_block_matrix(dR_stack, num_blocks), xi_stack)


def _coupled_r_kernel(U_elem, U_prev_elem, params, per_elem, shared,
                      evaluator, forcing, num_blocks, t, xi_prev_per_ip):
    h = per_elem["h"]

    def at_ip(w, det, coords, N_blocks, grad_blocks, xi_prev_ip):
        shapes = _shapes_at(N_blocks, grad_blocks, num_blocks)
        R_ip = evaluator(params, U_elem, U_prev_elem, xi_prev_ip, shapes,
                         w, det, h, 0)
        return _apply_body_force(R_ip, shapes, forcing, coords, t, w, det)

    return _sum_blocks(_vmap_ips(at_ip, per_elem, shared, xi_prev_per_ip),
                       num_blocks)


def _coupled_block_generic(U_elem, U_prev_elem, params, geom, evaluators,
                           forcing, num_blocks, t, xi_prev_per_block):
    """Generic COUPLED R-and-K over nested (element, IP) vmaps."""
    return vmap(
        lambda U, Up, pe, xi: _coupled_r_and_k_kernel(
            U, Up, params, pe, geom["shared"],
            evaluators["R_and_dR_dU_and_xi"], forcing, num_blocks, t,
            xi),
        in_axes=(0, 0, 0, 0), axis_name="elem",
    )(U_elem, U_prev_elem, geom["per_elem"],
      jnp.asarray(xi_prev_per_block))


def assemble_element_block(fe_problem: "FEProblem",
                           fe_arrays: "FEKernelArrays",
                           params_by_block: Mapping[str, Params],
                           block_name: str, U_global, U_prev_global,
                           t: Scalar, xi_prev_per_block=None):
    """One block's (R contribution, COO vals, xi_solved | None).

    ``R`` is a full-length global vector (zeros off-block) so blocks sum;
    ``vals`` stream in (r, s) order matching
    :func:`assembled_coo_pattern`.
    """
    U_elem = gather_element_U(U_global, fe_arrays, block_name)
    U_prev_elem = gather_element_U(U_prev_global, fe_arrays, block_name)
    params = params_by_block[block_name]
    evaluators = fe_problem.evaluators_by_block[block_name]
    mode = fe_problem.modes_by_block[block_name]
    num_blocks = fe_problem.gr.num_residuals
    forcing = fe_problem.forcing_fns_by_block_idx or {}
    geom = fe_arrays.geometry_cache[block_name]

    if mode == GlobalResidualMode.COUPLED:
        if xi_prev_per_block is None:
            raise ValueError(
                f"COUPLED block {block_name!r} requires xi_prev_per_block")
        if "block_R_and_K_and_xi" in evaluators:
            # whole-block SoA fast path (fem/j2_block.py): one batched
            # radial-return dispatch + closed-form consistent tangent
            R_e, K_e, xi_solved = evaluators["block_R_and_K_and_xi"](
                params, U_elem[0], U_prev_elem[0], geom, forcing.get(0),
                t, jnp.asarray(xi_prev_per_block))
            R_pe, K_pe = [R_e], [[K_e]]
        else:
            R_pe, K_pe, xi_solved = _coupled_block_generic(
                U_elem, U_prev_elem, params, geom, evaluators, forcing,
                num_blocks, t, xi_prev_per_block)
    else:
        R_pe, K_pe = vmap(
            lambda U, Up, pe: _closed_r_and_k_kernel(
                U, Up, params, pe, geom["shared"],
                evaluators["R_and_dR_dU"], forcing, num_blocks, t),
            in_axes=(0, 0, 0), axis_name="elem",
        )(U_elem, U_prev_elem, geom["per_elem"])
        xi_solved = None

    eq_per_block = fe_arrays.r_scatter_eq_by_block[block_name]
    n_elems = eq_per_block[0].shape[0]
    n_dofs = fe_problem.dof_map.num_total_dofs

    R = jnp.zeros(n_dofs, dtype=R_pe[0].dtype)
    for r in range(num_blocks):
        R = R.at[eq_per_block[r].ravel()].add(
            R_pe[r].reshape(n_elems, -1).ravel())

    vals = []
    for r in range(num_blocks):
        nr = eq_per_block[r].shape[1]
        for s in range(num_blocks):
            ns = eq_per_block[s].shape[1]
            vals.append(K_pe[r][s].reshape(n_elems, nr, ns).ravel())
    return R, jnp.concatenate(vals), xi_solved


def assemble_element_block_residual(fe_problem, fe_arrays, params_by_block,
                                    block_name, U_global, U_prev_global,
                                    t, xi_prev_per_block=None):
    """Residual-only block assembly (no tangent) — line-search probes and
    reaction-reading QoIs."""
    U_elem = gather_element_U(U_global, fe_arrays, block_name)
    U_prev_elem = gather_element_U(U_prev_global, fe_arrays, block_name)
    params = params_by_block[block_name]
    evaluators = fe_problem.evaluators_by_block[block_name]
    mode = fe_problem.modes_by_block[block_name]
    num_blocks = fe_problem.gr.num_residuals
    forcing = fe_problem.forcing_fns_by_block_idx or {}
    geom = fe_arrays.geometry_cache[block_name]

    coupled = mode == GlobalResidualMode.COUPLED
    if coupled and xi_prev_per_block is None:
        raise ValueError(
            f"COUPLED block {block_name!r} requires xi_prev_per_block")

    if coupled and "block_R" in evaluators:
        R_pe = [evaluators["block_R"](
            params, U_elem[0], U_prev_elem[0], geom, forcing.get(0), t,
            jnp.asarray(xi_prev_per_block))]
    elif coupled:
        R_pe = vmap(
            lambda U, Up, pe, xi: _coupled_r_kernel(
                U, Up, params, pe, geom["shared"], evaluators["R"],
                forcing, num_blocks, t, xi),
            in_axes=(0, 0, 0, 0), axis_name="elem",
        )(U_elem, U_prev_elem, geom["per_elem"],
          jnp.asarray(xi_prev_per_block))
    else:
        R_pe = vmap(
            lambda U, Up, pe: _closed_r_kernel(
                U, Up, params, pe, geom["shared"], evaluators["R"],
                forcing, num_blocks, t),
            in_axes=(0, 0, 0), axis_name="elem",
        )(U_elem, U_prev_elem, geom["per_elem"])

    eq_per_block = fe_arrays.r_scatter_eq_by_block[block_name]
    n_elems = eq_per_block[0].shape[0]
    R = jnp.zeros(fe_problem.dof_map.num_total_dofs, dtype=R_pe[0].dtype)
    for r in range(num_blocks):
        R = R.at[eq_per_block[r].ravel()].add(
            R_pe[r].reshape(n_elems, -1).ravel())
    return R


def assemble_global(fe_problem, fe_arrays, params_by_block, U_global,
                    U_prev_global, t, xi_prev_by_block=None):
    """(K BCOO deduped, R, xi_solved_by_block) over all element blocks.

    Convention: ``R(U) = R_int(U) - F_ext`` with body forces folded per
    element and surface fluxes added after the volume walk; the Newton
    driver solves ``K dU = -R``.
    """
    xi_prev = xi_prev_by_block or {}
    n_dofs = fe_problem.dof_map.num_total_dofs
    R = None
    vals_all = []
    xi_solved_by_block: dict[str, JaxArray] = {}

    for block_name in fe_problem.evaluators_by_block:
        R_b, vals, xi_solved = assemble_element_block(
            fe_problem, fe_arrays, params_by_block, block_name,
            U_global, U_prev_global, t,
            xi_prev_per_block=xi_prev.get(block_name))
        R = R_b if R is None else R + R_b
        vals_all.append(vals)
        if xi_solved is not None:
            xi_solved_by_block[block_name] = xi_solved

    R = R + assemble_side_neumann(
        fe_problem.dof_map, fe_arrays.neumann_side_arrays,
        fe_problem.resolved_neumann_bcs, t)

    vals = jnp.concatenate(vals_all)
    unique = jnp.zeros(fe_arrays.coo_rows.shape[0], dtype=vals.dtype
                       ).at[fe_arrays.coo_dedup_scatter].add(vals)
    K = BCOO((unique, jnp.stack([fe_arrays.coo_rows, fe_arrays.coo_cols],
                                axis=-1)),
             shape=(n_dofs, n_dofs), indices_sorted=True,
             unique_indices=True)
    return K, R, xi_solved_by_block


def assemble_global_residual(fe_problem, fe_arrays, params_by_block,
                             U_global, U_prev_global, t,
                             xi_prev_by_block=None):
    """R(U) only (same value as assemble_global's R)."""
    xi_prev = xi_prev_by_block or {}
    R = None
    for block_name in fe_problem.evaluators_by_block:
        R_b = assemble_element_block_residual(
            fe_problem, fe_arrays, params_by_block, block_name,
            U_global, U_prev_global, t,
            xi_prev_per_block=xi_prev.get(block_name))
        R = R_b if R is None else R + R_b
    return R + assemble_side_neumann(
        fe_problem.dof_map, fe_arrays.neumann_side_arrays,
        fe_problem.resolved_neumann_bcs, t)


def assembled_coo_pattern(fe_problem):
    """With-duplicates (rows, cols) in the (block, r, s) emit order, plus
    the deduped pattern and dedup scatter.

    Single source of truth shared by assembly and the embedded-BC
    sparsity cache, so the emit order can never drift from the data.
    Returns (unique_rows, unique_cols, dedup_scatter).
    """
    mesh = fe_problem.mesh
    dof_map = fe_problem.dof_map
    num_blocks = fe_problem.gr.num_residuals

    rows_all, cols_all = [], []
    for block_name in fe_problem.evaluators_by_block:
        conn = mesh.connectivity[mesh.element_blocks[block_name]]
        n_elems = conn.shape[0]
        eqs = [element_eq_indices(conn, dof_map,
                                  fe_problem.field_idx_per_block[r])
               for r in range(num_blocks)]
        for r in range(num_blocks):
            for s in range(num_blocks):
                nr, ns = eqs[r].shape[1], eqs[s].shape[1]
                rows_all.append(np.broadcast_to(
                    eqs[r][:, :, None], (n_elems, nr, ns)).ravel())
                cols_all.append(np.broadcast_to(
                    eqs[s][:, None, :], (n_elems, nr, ns)).ravel())
    rows = np.concatenate(rows_all)
    cols = np.concatenate(cols_all)

    order = np.lexsort((cols, rows))
    sr, sc = rows[order], cols[order]
    new_group = np.empty(rows.shape[0], dtype=bool)
    new_group[0] = True
    new_group[1:] = (sr[1:] != sr[:-1]) | (sc[1:] != sc[:-1])
    segment = (np.cumsum(new_group) - 1).astype(np.intp)
    dedup_scatter = np.empty(rows.shape[0], dtype=np.intp)
    dedup_scatter[order] = segment
    return (sr[new_group].astype(np.intp), sc[new_group].astype(np.intp),
            dedup_scatter)
