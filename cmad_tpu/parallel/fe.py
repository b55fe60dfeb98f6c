"""Element-parallel FE assembly over a device mesh.

SURVEY.md section 2.2 row 1: the reference is single-device (its only
parallelism is a vmap over elements); cmad_tpu makes the element batch
a sharded dimension. The implementation is the XLA SPMD recipe — no
explicit collectives in user code:

- every per-element carrier array (gather/scatter equation indices,
  geometry cache, per-IP state) is placed with ``NamedSharding
  P("elem")`` on its leading (element) axis;
- the global solution vector, parameters, and sparsity caches are
  replicated;
- the existing vmapped assembly kernels run unchanged under ``jit``;
  XLA partitions the element loop across devices and inserts the
  cross-device reduction for the ``.at[eq].add`` residual scatter.

Element counts need not divide the device count (XLA pads shards).
Validated on a virtual 8-device CPU mesh in
tests/parallel/test_sharded_fe_assembly.py; the same code drives a
real TPU pod slice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map

from cmad_tpu.fem.assembly import assemble_global_residual
from cmad_tpu.fem.kernel_arrays import FEKernelArrays


def _place(leaf, n_elems_set: set[int], elem_sharding, replicated):
    arr = jnp.asarray(leaf) if not hasattr(leaf, "shape") else leaf
    if getattr(arr, "ndim", 0) >= 1 and arr.shape[0] in n_elems_set:
        return jax.device_put(arr, elem_sharding)
    return jax.device_put(arr, replicated)


def shard_fe_arrays(fe_problem, mesh: Mesh,
                    axis_name: str = "elem") -> FEKernelArrays:
    """Re-place a problem's kernel arrays on ``mesh``: per-element
    leaves sharded on their leading axis, everything else replicated.

    Per-element leaves are identified by their leading extent matching
    a block's element count — the only mesh-sized leading dimension in
    the carrier (COO/nnz arrays are far larger, dof arrays differ).
    """
    n_elems_set = {
        len(fe_problem.mesh.element_blocks[b])
        for b in fe_problem.evaluators_by_block}
    elem = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return tree_map(lambda x: _place(x, n_elems_set, elem, repl),
                    fe_problem.kernel_arrays)


def shard_xi_by_block(xi_by_block, mesh: Mesh,
                      axis_name: str = "elem"):
    """Place per-IP state dicts ``{block: (n_elems, n_ips, nxi)}`` with
    the element axis sharded."""
    elem = NamedSharding(mesh, P(axis_name))
    return {b: jax.device_put(jnp.asarray(v), elem)
            for b, v in xi_by_block.items()}


def sharded_assemble_global_residual(fe_problem, fe_arrays_sharded,
                                     params_by_block, U, U_prev, t,
                                     xi_prev_by_block=None):
    """jit-compiled residual assembly over the sharded element batch.

    Returns the replicated global residual vector. COUPLED blocks run
    their per-IP local Newton solves shard-locally (no communication);
    the only collective is the reduction of element contributions into
    the global vector.
    """
    @jax.jit
    def run(arrays, params, U, U_prev, xi_prev):
        return assemble_global_residual(
            fe_problem, arrays, params, U, U_prev, t,
            xi_prev_by_block=xi_prev)

    return run(fe_arrays_sharded, params_by_block, U, U_prev,
               xi_prev_by_block)
