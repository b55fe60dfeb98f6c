"""Depth tests for io/results.py: component naming conventions, the
internal<->Exodus sym-tensor permutation, and IP averaging.

Mirrors the remaining intents of reference tests/io/test_results.py.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.io.results import (
    component_names,
    from_exodus_storage,
    ip_average_to_element,
    to_exodus_storage,
)
from cmad_tpu.models.var_types import VarType


# ------------------------------------------------------ component names


def test_scalar_returns_bare_name():
    assert component_names("eqps", VarType.SCALAR) == ("eqps",)


def test_vector_xyz_suffixes():
    assert component_names("u", VarType.VECTOR) == ("u_x", "u_y", "u_z")


def test_vector_2d():
    assert component_names("u", VarType.VECTOR, ndims=2) == ("u_x", "u_y")


def test_sym_tensor_exodus_order():
    assert component_names("cauchy", VarType.SYM_TENSOR) == (
        "cauchy_xx", "cauchy_yy", "cauchy_zz",
        "cauchy_xy", "cauchy_xz", "cauchy_yz")


def test_sym_tensor_2d():
    assert component_names("s", VarType.SYM_TENSOR, ndims=2) == (
        "s_xx", "s_yy", "s_xy")


def test_tensor_row_major_nine_components():
    assert component_names("F", VarType.TENSOR) == (
        "F_xx", "F_xy", "F_xz", "F_yx", "F_yy", "F_yz",
        "F_zx", "F_zy", "F_zz")


# ------------------------------------------------------- storage order


def test_scalar_and_vector_passthrough():
    v = np.arange(12.0).reshape(4, 3)
    assert to_exodus_storage(v, VarType.VECTOR) is v
    assert from_exodus_storage(v, VarType.VECTOR) is v
    s = np.arange(4.0)
    assert to_exodus_storage(s, VarType.SCALAR) is s


def test_tensor_passthrough():
    v = np.arange(18.0).reshape(2, 9)
    assert to_exodus_storage(v, VarType.TENSOR) is v


def test_sym_tensor_internal_to_exodus_known_layout():
    # internal [xx, xy, xz, yy, yz, zz] -> exodus [xx, yy, zz, xy, xz, yz]
    internal = np.array([[11.0, 12.0, 13.0, 22.0, 23.0, 33.0]])
    disk = to_exodus_storage(internal, VarType.SYM_TENSOR)
    assert np.array_equal(disk, [[11.0, 22.0, 33.0, 12.0, 13.0, 23.0]])


def test_sym_tensor_round_trip_returns_input():
    rng = np.random.RandomState(3)
    vals = rng.normal(size=(5, 6))
    back = from_exodus_storage(
        to_exodus_storage(vals, VarType.SYM_TENSOR), VarType.SYM_TENSOR)
    assert np.array_equal(back, vals)


def test_sym_tensor_2d_round_trip():
    vals = np.array([[11.0, 12.0, 22.0]])  # internal [xx, xy, yy]
    disk = to_exodus_storage(vals, VarType.SYM_TENSOR)
    assert np.array_equal(disk, [[11.0, 22.0, 12.0]])
    assert np.array_equal(
        from_exodus_storage(disk, VarType.SYM_TENSOR), vals)


def test_storage_permutation_works_with_extra_leading_axes():
    rng = np.random.RandomState(7)
    vals = rng.normal(size=(2, 4, 3, 6))
    disk = to_exodus_storage(vals, VarType.SYM_TENSOR)
    assert disk.shape == vals.shape
    back = from_exodus_storage(disk, VarType.SYM_TENSOR)
    assert np.array_equal(back, vals)


# ------------------------------------------------------- IP averaging


def _geometry_cache():
    from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
    from cmad_tpu.fem.elements import Q1_HEX
    from cmad_tpu.fem.fe_problem import build_fe_problem
    from cmad_tpu.fem.mesh import StructuredHexMesh
    from cmad_tpu.global_residuals.modes import GlobalResidualMode
    from cmad_tpu.global_residuals.small_disp_equilibrium import (
        SmallDispEquilibrium,
    )
    from cmad_tpu.models.elastic import Elastic
    from cmad_tpu.parameters.parameters import Parameters

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    model = Elastic(Parameters({"elastic": {"E": 1.0, "nu": 0.3}}))
    gr = SmallDispEquilibrium(ndims=3)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    fe = build_fe_problem(
        mesh=mesh, dof_map=dof_map, gr=gr,
        models_by_block={"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})
    return fe.geometry_cache


def test_ip_average_uniform_field_returns_input_value():
    cache = _geometry_cache()
    from cmad_tpu.fem.precompute import compute_ip_quadrature_weights
    w = compute_ip_quadrature_weights(cache)["all"]
    vals = np.full(w.shape + (6,), 3.25)
    avg = ip_average_to_element(vals, cache, "all")
    assert avg.shape == (w.shape[0], 6)
    assert np.allclose(avg, 3.25)


def test_ip_average_vector_components_independent():
    from cmad_tpu.fem.precompute import compute_ip_quadrature_weights
    cache = _geometry_cache()
    w = compute_ip_quadrature_weights(cache)["all"]
    vals = np.zeros(w.shape + (3,))
    vals[..., 0] = 1.0
    vals[..., 1] = 2.0
    vals[..., 2] = -4.0
    avg = ip_average_to_element(vals, cache, "all")
    assert np.allclose(avg[:, 0], 1.0)
    assert np.allclose(avg[:, 1], 2.0)
    assert np.allclose(avg[:, 2], -4.0)


def test_ip_average_shape_mismatch_raises():
    cache = _geometry_cache()
    with pytest.raises(ValueError, match="weights"):
        ip_average_to_element(np.zeros((1, 1, 6)), cache, "all")
