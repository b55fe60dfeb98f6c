"""Field specs, Exodus component naming/order, and field reductions.

Parity: reference ``cmad/io/results.py``. cmad_tpu's internal sym-tensor
order is [xx, xy, xz, yy, yz, zz]; Exodus disk order is
[xx, yy, zz, xy, xz, yz] — the to/from helpers permute at the boundary.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.var_types import VarType


@dataclass(frozen=True)
class FieldSpec:
    name: str
    var_type: VarType


@dataclass(frozen=True)
class ExodusResults:
    times: np.ndarray
    nodal: dict[str, np.ndarray]
    element: dict[str, dict[str, np.ndarray]]


_VECTOR_SUFFIXES = {1: ("_x",), 2: ("_x", "_y"), 3: ("_x", "_y", "_z")}
_SYM_EXODUS_SUFFIXES = {
    1: ("_xx",),
    2: ("_xx", "_yy", "_xy"),
    3: ("_xx", "_yy", "_zz", "_xy", "_xz", "_yz"),
}
_TENSOR_SUFFIXES = {
    1: ("_xx",),
    2: ("_xx", "_xy", "_yx", "_yy"),
    3: ("_xx", "_xy", "_xz", "_yx", "_yy", "_yz", "_zx", "_zy", "_zz"),
}

# internal [xx, xy, xz, yy, yz, zz] <-> exodus [xx, yy, zz, xy, xz, yz]
_SYM_INTERNAL_TO_EXODUS = {1: (0,), 3: (0, 2, 1), 6: (0, 3, 5, 1, 2, 4)}
_SYM_EXODUS_TO_INTERNAL = {1: (0,), 3: (0, 2, 1), 6: (0, 3, 4, 1, 5, 2)}


def component_names(name: str, var_type: VarType,
                    ndims: int = 3) -> tuple[str, ...]:
    """Decorated per-component variable names in disk order."""
    if var_type == VarType.SCALAR:
        return (name,)
    table = {VarType.VECTOR: _VECTOR_SUFFIXES,
             VarType.SYM_TENSOR: _SYM_EXODUS_SUFFIXES,
             VarType.TENSOR: _TENSOR_SUFFIXES}[var_type]
    return tuple(name + s for s in table[ndims])


def to_exodus_storage(values, var_type: VarType):
    """Permute the trailing component axis internal -> Exodus (sym
    tensors only; other kinds pass through)."""
    if var_type != VarType.SYM_TENSOR:
        return values
    perm = list(_SYM_INTERNAL_TO_EXODUS[values.shape[-1]])
    if isinstance(values, np.ndarray):
        return values[..., perm]
    return jnp.asarray(values)[..., jnp.asarray(perm)]


def from_exodus_storage(values, var_type: VarType):
    if var_type != VarType.SYM_TENSOR:
        return values
    perm = list(_SYM_EXODUS_TO_INTERNAL[values.shape[-1]])
    if isinstance(values, np.ndarray):
        return values[..., perm]
    return jnp.asarray(values)[..., jnp.asarray(perm)]


def ip_average_to_element(values_per_ip, geometry_cache,
                          block_name: str) -> np.ndarray:
    """Integration-measure-weighted IP -> element mean:
    sum_p(det w v) / sum_p(det w). values (n_e, n_ip, *comp)."""
    from cmad_tpu.fem.precompute import compute_ip_quadrature_weights

    weights = compute_ip_quadrature_weights(geometry_cache)[block_name]
    values = np.asarray(values_per_ip)
    if values.shape[:2] != weights.shape:
        raise ValueError(
            f"values leading shape {values.shape[:2]} != weights "
            f"{weights.shape} for block {block_name!r}")
    w = weights
    while w.ndim < values.ndim:
        w = w[..., None]
    return (values * w).sum(axis=1) / w.sum(axis=1)


def volume_average_global_field(U_global, fe_problem, block_name: str,
                                field_name: str) -> np.ndarray:
    """Per-element volume-average of one global FE field (the integral,
    not the vertex mean)."""
    var_names = fe_problem.gr.var_names
    matches = [r for r, n in enumerate(var_names) if n == field_name]
    if len(matches) != 1:
        raise ValueError(
            f"field {field_name!r} bound to {len(matches)} residual "
            f"blocks; need exactly one (var_names={list(var_names)})")
    r = matches[0]
    field_idx = fe_problem.field_idx_per_block[r]

    gather = fe_problem.kernel_arrays.u_gather_eq_by_block[
        block_name][field_idx]
    U_elem = jnp.asarray(U_global)[gather]
    N = fe_problem.geometry_cache[block_name]["shared"]["N"][r]
    U_ip = jnp.einsum("pa,eak->epk", N, U_elem)
    return ip_average_to_element(U_ip, fe_problem.geometry_cache,
                                 block_name)
