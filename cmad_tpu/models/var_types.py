"""State-variable kinds and batched tensor<->vector packing.

Parity: reference ``cmad/models/var_types.py:21-60``, with one TPU-first
change: every converter here accepts arbitrary *leading batch dimensions*
(``(..., 6) <-> (..., 3, 3)``), so the same code path serves a single
material point and a million Gauss points without vmap.

Symmetric-tensor component order (3D) is the reference's:
``[00, 01, 02, 11, 12, 22]``.
"""
from __future__ import annotations

from enum import IntEnum

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray


class VarType(IntEnum):
    SCALAR = 0
    VECTOR = 1
    SYM_TENSOR = 2
    TENSOR = 3


def get_num_eqs(var_type: int, ndims: int) -> int:
    if var_type == VarType.SCALAR:
        return 1
    if var_type == VarType.VECTOR:
        return ndims
    if var_type == VarType.SYM_TENSOR:
        return (ndims + 1) * ndims // 2
    if var_type == VarType.TENSOR:
        return ndims ** 2
    raise ValueError(f"unknown var_type: {var_type}")


# index maps for sym-vector <-> full-tensor packing, 3D:
# vec slot k holds tensor entry (row, col) = _SYM3_RC[k]
_SYM3_RC = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
_SYM2_RC = ((0, 0), (0, 1), (1, 1))


def sym_tensor_from_vector(vec: JaxArray, ndims: int = 3) -> JaxArray:
    """(..., n(n+1)/2) -> (..., n, n), batch-dim aware."""
    v = jnp.asarray(vec)
    if ndims == 3:
        rows = [
            jnp.stack([v[..., 0], v[..., 1], v[..., 2]], axis=-1),
            jnp.stack([v[..., 1], v[..., 3], v[..., 4]], axis=-1),
            jnp.stack([v[..., 2], v[..., 4], v[..., 5]], axis=-1),
        ]
    elif ndims == 2:
        rows = [
            jnp.stack([v[..., 0], v[..., 1]], axis=-1),
            jnp.stack([v[..., 1], v[..., 2]], axis=-1),
        ]
    elif ndims == 1:
        rows = [v[..., 0:1]]
    else:
        raise ValueError("ndims must be 1, 2, or 3")
    return jnp.stack(rows, axis=-2)


def vector_from_sym_tensor(tensor: JaxArray, ndims: int = 3) -> JaxArray:
    """(..., n, n) -> (..., n(n+1)/2), batch-dim aware."""
    t = jnp.asarray(tensor)
    rc = {3: _SYM3_RC, 2: _SYM2_RC, 1: ((0, 0),)}[ndims]
    return jnp.stack([t[..., r, c] for r, c in rc], axis=-1)


def tensor_from_vector(vec: JaxArray, ndims: int = 3) -> JaxArray:
    """(..., n*n) -> (..., n, n)."""
    v = jnp.asarray(vec)
    return v.reshape(*v.shape[:-1], ndims, ndims)


def vector_from_tensor(tensor: JaxArray, ndims: int = 3) -> JaxArray:
    """(..., n, n) -> (..., n*n)."""
    t = jnp.asarray(tensor)
    return t.reshape(*t.shape[:-2], ndims * ndims)


# legacy-named wrappers matching the reference API surface
get_sym_tensor_from_vector = sym_tensor_from_vector
get_vector_from_sym_tensor = vector_from_sym_tensor
get_tensor_from_vector = tensor_from_vector
get_vector_from_tensor = vector_from_tensor


def get_scalar(var: JaxArray) -> JaxArray:
    return jnp.asarray(var)[..., 0]


def put_2D_tensor_into_3D(tensor_2d: JaxArray) -> JaxArray:
    t = jnp.asarray(tensor_2d)
    out = jnp.zeros((*t.shape[:-2], 3, 3), dtype=t.dtype)
    return out.at[..., :2, :2].set(t)


def get_2D_tensor_from_3D(tensor_3d: JaxArray) -> JaxArray:
    return jnp.asarray(tensor_3d)[..., :2, :2]


def put_tensor_into_3D(tensor: JaxArray, def_type: int) -> JaxArray:
    from cmad_tpu.models.deformation_types import DefType

    t = jnp.asarray(tensor)
    if def_type == DefType.FULL_3D:
        return t
    out = jnp.zeros((*t.shape[:-2], 3, 3), dtype=t.dtype) \
        if t.ndim >= 2 else jnp.zeros((3, 3), dtype=t.dtype)
    if def_type in (DefType.PLANE_STRAIN, DefType.PLANE_STRESS):
        return out.at[..., :2, :2].set(t[..., :2, :2])
    if def_type == DefType.UNIAXIAL_STRESS:
        return out.at[..., 0, 0].set(t[..., 0, 0])
    if def_type == DefType.PURE_SHEAR:
        out = out.at[..., 0, 1].set(t[..., 0, 0])
        return out.at[..., 1, 0].set(t[..., 0, 0])
    raise ValueError(f"unknown def_type: {def_type}")


def get_tensor_from_3D(tensor_3d: JaxArray, def_type: int) -> JaxArray:
    from cmad_tpu.models.deformation_types import DefType

    t = jnp.asarray(tensor_3d)
    if def_type == DefType.FULL_3D:
        return t
    if def_type in (DefType.PLANE_STRAIN, DefType.PLANE_STRESS):
        return t[..., :2, :2]
    if def_type == DefType.UNIAXIAL_STRESS:
        return t[..., 0, 0]
    if def_type == DefType.PURE_SHEAR:
        return t[..., 0, 1]
    raise ValueError(f"unknown def_type: {def_type}")
