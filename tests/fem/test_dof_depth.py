"""Depth tests for the DOF map: eq-numbering formula, DBC resolution,
value materialization, and over-prescription semantics.

Mirrors the intent of reference tests/fem/test_dof.py (24 tests) beyond
tests/fem/test_dof_roundtrip.py.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import (
    GlobalFieldLayout,
    build_dbc_arrays,
    build_dof_map,
)
from cmad_tpu.fem.elements import (
    EntityType,
    FiniteElement,
    P1_TET,
    Q1_HEX,
    hex_linear,
)
from cmad_tpu.fem.mesh import StructuredHexMesh


def _mesh(div=(2, 2, 2)):
    return StructuredHexMesh((1.0, 1.0, 1.0), div)


def _layouts():
    return [GlobalFieldLayout("u", Q1_HEX)]


# ------------------------------------------------------- build validation


def test_rejects_zero_component_count():
    with pytest.raises(ValueError, match=">= 1"):
        build_dof_map(_mesh(), _layouts(), [], {"u": 0})


def test_rejects_mismatched_component_keys():
    with pytest.raises(ValueError, match="match field names"):
        build_dof_map(_mesh(), _layouts(), [], {"v": 3})


def test_rejects_duplicate_field_names():
    layouts = [GlobalFieldLayout("u", Q1_HEX),
               GlobalFieldLayout("u", Q1_HEX)]
    with pytest.raises(ValueError, match="unique"):
        build_dof_map(_mesh(), layouts, [], {"u": 3})


def test_rejects_fe_family_mesh_mismatch():
    with pytest.raises(ValueError, match="family"):
        build_dof_map(_mesh(), [GlobalFieldLayout("u", P1_TET)], [],
                      {"u": 3})


def test_rejects_unknown_bc_field():
    bc = DirichletBC(["xmin_sides"], "v", [0], None)
    with pytest.raises(ValueError, match="unknown"):
        build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})


def test_rejects_unknown_sideset():
    bc = DirichletBC(["nope_sides"], "u", [0], None)
    with pytest.raises(KeyError, match="nope_sides"):
        build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})


def test_rejects_bc_dof_out_of_range():
    bc = DirichletBC(["xmin_sides"], "u", [3], None)
    with pytest.raises(ValueError, match="outside"):
        build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})


def test_rejects_sideset_bc_on_cell_only_field():
    cell_fe = FiniteElement("DG0_HEX", Q1_HEX.element_family,
                            {EntityType.CELL: 1}, hex_linear)
    layouts = [GlobalFieldLayout("p", cell_fe)]
    bc = DirichletBC(["xmin_sides"], "p", [0], None)
    with pytest.raises(ValueError, match="VERTEX"):
        build_dof_map(_mesh(), layouts, [bc], {"p": 1})


# --------------------------------------------------------- eq numbering


def test_eq_index_single_field_formula():
    dm = build_dof_map(_mesh(), _layouts(), [], {"u": 3})
    for bfn in (0, 5, 26):
        for dof in range(3):
            assert dm.eq_index(0, bfn, dof) == bfn * 3 + dof


def test_eq_index_multi_field_offsets():
    layouts = [GlobalFieldLayout("u", Q1_HEX),
               GlobalFieldLayout("p", Q1_HEX)]
    dm = build_dof_map(_mesh(), layouts, [], {"u": 3, "p": 1})
    n_nodes = 27
    assert dm.eq_index(0, 0, 0) == 0
    assert dm.eq_index(1, 0, 0) == 3 * n_nodes
    assert dm.eq_index(1, 4, 0) == 3 * n_nodes + 4
    assert dm.num_total_dofs == 4 * n_nodes
    assert np.array_equal(dm.block_offsets, [0, 81, 108])


def test_total_and_free_counts():
    bc = DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    assert dm.num_total_dofs == 81
    assert dm.num_prescribed_dofs == 27  # 9 boundary nodes x 3 comps
    assert dm.num_free_dofs == 81 - 27
    assert dm.num_free_dofs + dm.num_prescribed_dofs == dm.num_total_dofs


def test_field_with_no_bcs_has_zero_prescribed():
    dm = build_dof_map(_mesh(), _layouts(), [], {"u": 3})
    assert dm.num_prescribed_dofs == 0
    assert dm.prescribed_indices.shape == (0,)


def test_xmin_clamp_resolves_to_node_set_eqs():
    mesh = _mesh()
    bc = DirichletBC(["xmin_sides"], "u", [1], None)
    dm = build_dof_map(mesh, _layouts(), [bc], {"u": 3})
    expect = np.sort(mesh.node_sets["xmin_nodes"] * 3 + 1)
    assert np.array_equal(dm.prescribed_indices, expect)


def test_multi_sideset_clamp_dedups_shared_edge():
    """xmin+ymin in ONE BC: the shared edge's nodes appear once."""
    mesh = _mesh()
    bc = DirichletBC(["xmin_sides", "ymin_sides"], "u", [2], None)
    dm = build_dof_map(mesh, _layouts(), [bc], {"u": 3})
    union = np.union1d(mesh.node_sets["xmin_nodes"],
                       mesh.node_sets["ymin_nodes"])
    assert np.array_equal(dm.prescribed_indices, np.sort(union * 3 + 2))
    assert dm.overprescribed == []  # intra-BC dedup is not a conflict


# -------------------------------------------------- value materialization


def _values_at(dm, t=0.0):
    arrays = build_dbc_arrays(dm)
    return np.asarray(dm.evaluate_prescribed_values(arrays, t))


def test_homogeneous_none_gives_zeros():
    bc = DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    vals = _values_at(dm)
    assert vals.shape == (27,)
    assert np.all(vals == 0.0)


def test_constant_sequence_broadcasts():
    bc = DirichletBC(["xmax_sides"], "u", [0, 2], [0.5, -1.0])
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    vals = _values_at(dm)
    # vertex-major, dof-minor within the prescribed ordering: each node
    # carries (0.5, -1.0) on components (0, 2)
    comp = dm.prescribed_indices % 3
    assert np.all(vals[comp == 0] == 0.5)
    assert np.all(vals[comp == 2] == -1.0)


def test_callable_spatially_varying():
    mesh = _mesh()
    bc = DirichletBC(["zmax_sides"], "u", [2],
                     lambda c, t: (2.0 * c[:, 0] + c[:, 1])[:, None])
    dm = build_dof_map(mesh, _layouts(), [bc], {"u": 3})
    vals = _values_at(dm)
    coords = mesh.nodes[dm.prescribed_indices // 3]
    assert np.allclose(vals, 2.0 * coords[:, 0] + coords[:, 1])


def test_callable_time_dependent():
    bc = DirichletBC(["xmax_sides"], "u", [0],
                     lambda c, t: 0.1 * t * np.ones((c.shape[0], 1)))
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    assert np.allclose(_values_at(dm, 0.0), 0.0)
    assert np.allclose(_values_at(dm, 2.5), 0.25)


def test_callable_wrong_shape_raises():
    bc = DirichletBC(["xmax_sides"], "u", [0],
                     lambda c, t: np.ones(c.shape[0]))  # missing dof axis
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    with pytest.raises(ValueError, match="expected"):
        _values_at(dm)


# ------------------------------------------------------ over-prescription


def test_overlapping_consistent_bcs_silent():
    bcs = [DirichletBC(["xmin_sides"], "u", [0], [0.25]),
           DirichletBC(["ymin_sides"], "u", [0], [0.25])]
    dm = build_dof_map(_mesh(), bcs=bcs, field_layouts=_layouts(),
                       components_by_field={"u": 3})
    assert len(dm.overprescribed) == 3  # shared edge: 3 nodes along z
    vals = _values_at(dm)  # consistent -> no raise
    assert np.all(vals == 0.25)


def test_overlapping_inconsistent_bcs_raise_at_evaluate():
    bcs = [DirichletBC(["xmin_sides"], "u", [0], [0.25]),
           DirichletBC(["ymin_sides"], "u", [0], [0.75])]
    dm = build_dof_map(_mesh(), bcs=bcs, field_layouts=_layouts(),
                       components_by_field={"u": 3})
    with pytest.raises(ValueError, match="inconsistent"):
        _values_at(dm)


def test_partial_component_overlap_consistent():
    """Two BCs share one node set but prescribe different components —
    no structural conflict at all."""
    bcs = [DirichletBC(["xmin_sides"], "u", [0], [1.0]),
           DirichletBC(["xmin_sides"], "u", [1], [2.0])]
    dm = build_dof_map(_mesh(), bcs=bcs, field_layouts=_layouts(),
                       components_by_field={"u": 3})
    assert dm.overprescribed == []
    vals = _values_at(dm)
    comp = dm.prescribed_indices % 3
    assert np.all(vals[comp == 0] == 1.0)
    assert np.all(vals[comp == 1] == 2.0)


def test_partial_component_overlap_inconsistent_raises():
    """Same node set, overlapping component lists with different values:
    the shared component conflicts, the disjoint one does not."""
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1], [1.0, 5.0]),
           DirichletBC(["xmin_sides"], "u", [1, 2], [9.0, 3.0])]
    dm = build_dof_map(_mesh(), bcs=bcs, field_layouts=_layouts(),
                       components_by_field={"u": 3})
    assert len(dm.overprescribed) == 9  # component 1 on 9 nodes
    with pytest.raises(ValueError, match="inconsistent"):
        _values_at(dm)


def test_time_varying_conflict_detected_at_nonzero_t():
    """Consistent at t=0 (both zero), inconsistent at t>0: the runtime
    check catches it when values actually diverge."""
    bcs = [DirichletBC(["xmin_sides"], "u", [0],
                       lambda c, t: 1.0 * t * np.ones((c.shape[0], 1))),
           DirichletBC(["xmin_sides"], "u", [0],
                       lambda c, t: 2.0 * t * np.ones((c.shape[0], 1)))]
    dm = build_dof_map(_mesh(), bcs=bcs, field_layouts=_layouts(),
                       components_by_field={"u": 3})
    _values_at(dm, 0.0)  # agrees at t=0
    with pytest.raises(ValueError, match="inconsistent"):
        _values_at(dm, 1.0)


def test_dirichlet_eqs_for_component_unknown_combination_raises():
    bc = DirichletBC(["xmin_sides"], "u", [0], None)
    dm = build_dof_map(_mesh(), _layouts(), [bc], {"u": 3})
    with pytest.raises(ValueError, match="no Dirichlet BC"):
        dm.dirichlet_eqs_for_component("xmin_sides", "u", 1)
