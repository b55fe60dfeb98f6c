"""Kinematic helpers: deformation-gradient assembly per DefType.

Parity: reference ``cmad/models/kinematics.py:10-65``. cmad_tpu stores local
state as one flat vector, so constrained-stretch slots are passed in as
arrays rather than looked up from a state list.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.typing import JaxArray


def gather_F(
        grad_u: JaxArray, def_type: int,
        local_stretches: JaxArray | None = None,
        uniaxial_stress_idx: int = 0,
) -> JaxArray:
    """Assemble the full 3x3 F from the (possibly lower-dim) grad u plus
    constrained-stretch state entries.

    ``local_stretches``: the xi slice holding the out-of-plane stretch
    (PLANE_STRESS: shape (1,)) or the two off-axis stretches
    (UNIAXIAL_STRESS: shape (2,)).
    """
    if def_type == DefType.FULL_3D:
        return jnp.eye(3, dtype=grad_u.dtype) + grad_u

    if def_type == DefType.PLANE_STRESS:
        assert local_stretches is not None
        F2 = jnp.eye(2, dtype=grad_u.dtype) + grad_u
        F = jnp.zeros((3, 3), dtype=grad_u.dtype)
        F = F.at[:2, :2].set(F2)
        return F.at[2, 2].set(local_stretches[0])

    if def_type == DefType.PLANE_STRAIN:
        F2 = jnp.eye(2, dtype=grad_u.dtype) + grad_u
        F = jnp.zeros((3, 3), dtype=grad_u.dtype)
        F = F.at[:2, :2].set(F2)
        return F.at[2, 2].set(1.0)

    if def_type == DefType.UNIAXIAL_STRESS:
        assert local_stretches is not None
        F_uni = 1.0 + grad_u[0, 0]
        s = local_stretches
        if uniaxial_stress_idx == 0:
            diag = jnp.stack([F_uni, s[0], s[1]])
        elif uniaxial_stress_idx == 1:
            diag = jnp.stack([s[0], F_uni, s[1]])
        elif uniaxial_stress_idx == 2:
            diag = jnp.stack([s[0], s[1], F_uni])
        else:
            raise ValueError("uniaxial_stress_idx must be 0, 1, or 2")
        return jnp.diag(diag)

    raise NotImplementedError(f"gather_F: def_type {def_type}")


def gather_F_from_state(
        xi: JaxArray, U: GlobalFieldsAtPoint, def_type: int,
        stretch_slice: slice | None,
        uniaxial_stress_idx: int = 0,
) -> JaxArray:
    """gather_F reading the constrained stretches from a flat xi slice."""
    stretches = xi[stretch_slice] if stretch_slice is not None else None
    return gather_F(U.grad_fields["u"], def_type, stretches,
                    uniaxial_stress_idx)


def compute_invariants(A: JaxArray) -> tuple[JaxArray, JaxArray, JaxArray]:
    I1 = jnp.trace(A)
    I2 = 0.5 * (I1**2 - jnp.trace(A @ A))
    I3 = jnp.linalg.det(A)
    return I1, I2, I3


def off_axis_idx(uniaxial_stress_idx: int) -> np.ndarray:
    """The two coordinate indices orthogonal to the loading axis."""
    return np.array([i for i in range(3) if i != uniaxial_stress_idx])
