"""Batched tensor<->vector packing round-trips."""
from __future__ import annotations

import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.var_types import (
    VarType,
    get_num_eqs,
    get_tensor_from_3D,
    put_tensor_into_3D,
    sym_tensor_from_vector,
    tensor_from_vector,
    vector_from_sym_tensor,
    vector_from_tensor,
)


def test_num_eqs():
    assert get_num_eqs(VarType.SCALAR, 3) == 1
    assert get_num_eqs(VarType.VECTOR, 3) == 3
    assert get_num_eqs(VarType.SYM_TENSOR, 3) == 6
    assert get_num_eqs(VarType.SYM_TENSOR, 2) == 3
    assert get_num_eqs(VarType.TENSOR, 3) == 9


def test_sym_round_trip_single():
    v = np.arange(6.0)
    t = np.asarray(sym_tensor_from_vector(v))
    assert np.allclose(t, t.T)
    assert np.allclose(np.asarray(vector_from_sym_tensor(t)), v)


def test_sym_round_trip_batched():
    rng = np.random.RandomState(0)
    v = rng.normal(size=(4, 5, 6))
    t = np.asarray(sym_tensor_from_vector(v))
    assert t.shape == (4, 5, 3, 3)
    assert np.allclose(t, np.swapaxes(t, -1, -2))
    assert np.allclose(np.asarray(vector_from_sym_tensor(t)), v)


def test_full_round_trip_batched():
    rng = np.random.RandomState(1)
    v = rng.normal(size=(7, 9))
    t = np.asarray(tensor_from_vector(v))
    assert np.allclose(np.asarray(vector_from_tensor(t)), v)


def test_put_get_3d():
    A = np.arange(9.0).reshape(3, 3)
    for def_type in (DefType.FULL_3D, DefType.PLANE_STRAIN,
                     DefType.PLANE_STRESS):
        embedded = np.asarray(put_tensor_into_3D(A, def_type))
        back = np.asarray(get_tensor_from_3D(embedded, def_type))
        if def_type == DefType.FULL_3D:
            assert np.allclose(back, A)
        else:
            assert np.allclose(back, A[:2, :2])
