"""Traced-argument carrier for the static FE assembly arrays.

Parity: reference ``cmad/fem/kernel_arrays.py``. Mesh-sized index arrays,
the geometry cache, and the sparsity caches collected into one pytree so
they cross jit boundaries as traced shapes instead of baking into the
compiled module as constants.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from cmad_tpu.fem.dof import DBCArrays, build_dbc_arrays
from cmad_tpu.fem.neumann import NeumannSideArrays, build_neumann_side_arrays
from cmad_tpu.fem.sparse_solve import BlockSparsity, EmbeddedSparsity
from cmad_tpu.typing import JaxArray

if TYPE_CHECKING:
    from cmad_tpu.fem.fe_problem import FEProblem


@register_pytree_node_class
@dataclass(frozen=True)
class FEKernelArrays:
    """Static mesh-derived arrays read by the traced FE kernels."""

    u_gather_eq_by_block: dict[str, tuple[JaxArray, ...]]
    r_scatter_eq_by_block: dict[str, tuple[JaxArray, ...]]
    coo_rows: JaxArray
    coo_cols: JaxArray
    coo_dedup_scatter: JaxArray
    geometry_cache: dict[str, dict]
    embedded_sparsity: EmbeddedSparsity
    block_sparsity: BlockSparsity | None
    prescribed_indices: JaxArray
    neumann_side_arrays: NeumannSideArrays
    dbc_arrays: DBCArrays

    def tree_flatten(self):
        return ((self.u_gather_eq_by_block, self.r_scatter_eq_by_block,
                 self.coo_rows, self.coo_cols, self.coo_dedup_scatter,
                 self.geometry_cache, self.embedded_sparsity,
                 self.block_sparsity, self.prescribed_indices,
                 self.neumann_side_arrays, self.dbc_arrays), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_fe_kernel_arrays(fe_problem: "FEProblem") -> FEKernelArrays:
    from cmad_tpu.fem.assembly import (
        assembled_coo_pattern,
        element_eq_indices,
    )

    mesh = fe_problem.mesh
    dof_map = fe_problem.dof_map
    num_residuals = fe_problem.gr.num_residuals
    num_fields = len(dof_map.field_layouts)

    u_gather, r_scatter = {}, {}
    for block in fe_problem.evaluators_by_block:
        conn = mesh.connectivity[mesh.element_blocks[block]]
        n_elems = conn.shape[0]
        gathers = []
        for fi in range(num_fields):
            nd = int(dof_map.num_dofs_per_basis_fn[fi])
            eq = element_eq_indices(conn, dof_map, fi)
            gathers.append(jnp.asarray(eq.reshape(n_elems, -1, nd)))
        u_gather[block] = tuple(gathers)
        r_scatter[block] = tuple(
            jnp.asarray(element_eq_indices(
                conn, dof_map, fe_problem.field_idx_per_block[r]))
            for r in range(num_residuals))

    rows, cols, dedup = assembled_coo_pattern(fe_problem)

    return FEKernelArrays(
        u_gather_eq_by_block=u_gather,
        r_scatter_eq_by_block=r_scatter,
        coo_rows=jnp.asarray(rows),
        coo_cols=jnp.asarray(cols),
        coo_dedup_scatter=jnp.asarray(dedup),
        geometry_cache=fe_problem.geometry_cache,
        embedded_sparsity=fe_problem.embedded_sparsity,
        block_sparsity=fe_problem.block_sparsity,
        prescribed_indices=jnp.asarray(dof_map.prescribed_indices),
        neumann_side_arrays=build_neumann_side_arrays(
            mesh, dof_map, fe_problem.resolved_neumann_bcs,
            fe_problem.side_quadrature),
        dbc_arrays=build_dbc_arrays(dof_map))
