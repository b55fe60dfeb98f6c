"""Kinematics: gather_F per def_type, invariants, off-axis indices.

Mirrors the reference's kinematics semantics
(``cmad/models/kinematics.py:10-65``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.kinematics import (
    compute_invariants,
    gather_F,
    off_axis_idx,
)


def test_full_3d():
    grad_u = jnp.asarray(np.random.RandomState(0).normal(size=(3, 3)))
    F = gather_F(grad_u, DefType.FULL_3D)
    np.testing.assert_allclose(F, np.eye(3) + np.asarray(grad_u))


def test_plane_stress_uses_stretch_slot():
    grad_u = jnp.asarray([[0.01, 0.002], [0.0, -0.003]])
    F = np.asarray(gather_F(grad_u, DefType.PLANE_STRESS,
                            jnp.asarray([0.97])))
    np.testing.assert_allclose(F[:2, :2], np.eye(2) + np.asarray(grad_u))
    assert F[2, 2] == pytest.approx(0.97)
    np.testing.assert_allclose(F[2, :2], 0.0)
    np.testing.assert_allclose(F[:2, 2], 0.0)


def test_plane_strain_unit_thickness():
    grad_u = jnp.asarray([[0.01, 0.0], [0.0, 0.02]])
    F = np.asarray(gather_F(grad_u, DefType.PLANE_STRAIN))
    assert F[2, 2] == 1.0
    np.testing.assert_allclose(np.diag(F), [1.01, 1.02, 1.0])


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_uniaxial_axis_placement(axis):
    grad_u = jnp.asarray([[0.05]])
    s = jnp.asarray([0.98, 0.99])
    F = np.asarray(gather_F(grad_u, DefType.UNIAXIAL_STRESS, s,
                            uniaxial_stress_idx=axis))
    assert F[axis, axis] == pytest.approx(1.05)
    off = [i for i in range(3) if i != axis]
    np.testing.assert_allclose([F[i, i] for i in off], [0.98, 0.99])
    assert np.count_nonzero(F - np.diag(np.diag(F))) == 0


def test_uniaxial_bad_axis_raises():
    with pytest.raises(ValueError, match="uniaxial_stress_idx"):
        gather_F(jnp.asarray([[0.0]]), DefType.UNIAXIAL_STRESS,
                 jnp.asarray([1.0, 1.0]), uniaxial_stress_idx=3)


def test_invariants_match_numpy():
    A = np.random.RandomState(1).normal(size=(3, 3))
    A = A + A.T
    I1, I2, I3 = compute_invariants(jnp.asarray(A))
    np.testing.assert_allclose(float(I1), np.trace(A), rtol=1e-12)
    np.testing.assert_allclose(
        float(I2), 0.5 * (np.trace(A) ** 2 - np.trace(A @ A)), rtol=1e-12)
    np.testing.assert_allclose(float(I3), np.linalg.det(A), rtol=1e-12)


def test_off_axis_idx():
    np.testing.assert_array_equal(off_axis_idx(0), [1, 2])
    np.testing.assert_array_equal(off_axis_idx(1), [0, 2])
    np.testing.assert_array_equal(off_axis_idx(2), [0, 1])
