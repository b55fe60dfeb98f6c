"""Depth tests for element primitives: FiniteElement DOF placement,
canonical face tables, side lifts, quadrature exactness edges, and BC
declaration validation.

Mirrors the remaining intents of reference tests/fem/
test_finite_element.py, test_topology.py, test_quadrature.py, and
test_bcs.py.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.elements import (
    EntityType,
    FiniteElement,
    P1_TET,
    Q1_HEX,
    hex_linear,
    tet_linear,
)
from cmad_tpu.fem.topology import (
    ElementFamily,
    LOCAL_FACES,
    REF_NODES,
    ref_side_lift,
)


# --------------------------------------------------- FiniteElement DOFs


def test_p1_tet_has_4_dofs():
    assert P1_TET.num_dofs_per_element == 4


def test_q1_hex_has_8_dofs():
    assert Q1_HEX.num_dofs_per_element == 8


def test_synthetic_p2_tet_has_10_dofs():
    p2 = FiniteElement("P2_TET", ElementFamily.TET_LINEAR,
                       {EntityType.VERTEX: 1, EntityType.EDGE: 1},
                       tet_linear)
    assert p2.num_dofs_per_element == 4 + 6
    assert not p2.vertex_only()


def test_synthetic_q2_full_hex_has_27_dofs():
    q2 = FiniteElement("Q2_HEX", ElementFamily.HEX_LINEAR,
                       {EntityType.VERTEX: 1, EntityType.EDGE: 1,
                        EntityType.FACE: 1, EntityType.CELL: 1},
                       hex_linear)
    assert q2.num_dofs_per_element == 8 + 12 + 6 + 1


def test_synthetic_dg0_tet_has_1_dof():
    dg0 = FiniteElement("DG0_TET", ElementFamily.TET_LINEAR,
                        {EntityType.CELL: 1}, tet_linear)
    assert dg0.num_dofs_per_element == 1
    assert not dg0.vertex_only()


def test_omitted_entity_types_imply_zero():
    assert Q1_HEX.dofs_per_entity.get(EntityType.EDGE, 0) == 0
    assert Q1_HEX.vertex_only()


def test_rejects_negative_dof_count():
    with pytest.raises(ValueError, match="dofs_per_entity"):
        FiniteElement("BAD", ElementFamily.HEX_LINEAR,
                      {EntityType.VERTEX: -1}, hex_linear)


def test_rejects_non_entity_type_key():
    with pytest.raises(ValueError, match="dofs_per_entity"):
        FiniteElement("BAD", ElementFamily.HEX_LINEAR,
                      {"vertex": 1}, hex_linear)


# ---------------------------------------------------- side basis tables


def test_side_basis_fns_match_canonical_face_tables():
    for fe, family in ((Q1_HEX, ElementFamily.HEX_LINEAR),
                       (P1_TET, ElementFamily.TET_LINEAR)):
        table = LOCAL_FACES[family]
        for side in range(table.shape[0]):
            assert np.array_equal(fe.side_basis_fns(side), table[side])


def test_out_of_range_side_id_raises():
    with pytest.raises(ValueError, match="out of range"):
        Q1_HEX.side_basis_fns(6)
    with pytest.raises(ValueError, match="out of range"):
        P1_TET.side_basis_fns(4)


def test_non_vertex_dof_placement_side_fns_raises():
    p2 = FiniteElement("P2_TET", ElementFamily.TET_LINEAR,
                       {EntityType.VERTEX: 1, EntityType.EDGE: 1},
                       tet_linear)
    with pytest.raises(NotImplementedError, match="VERTEX-only"):
        p2.side_basis_fns(0)


# ------------------------------------------------------- ref_side_lift


def test_lift_tangents_cross_to_outward_normal_hex():
    """For every hex face, cross(ds, dt) must point along the outward
    axis of that face (conventions in topology.py docstring)."""
    outward = {0: [0, 0, -1], 1: [0, 0, 1], 2: [0, -1, 0],
               3: [1, 0, 0], 4: [0, 1, 0], 5: [-1, 0, 0]}
    for side, n_expect in outward.items():
        _origin, tangents = ref_side_lift(ElementFamily.HEX_LINEAR, side)
        n = np.cross(tangents[:, 0], tangents[:, 1])
        n = n / np.linalg.norm(n)
        assert np.allclose(n, n_expect), side


def test_lift_tangents_cross_to_outward_normal_tet():
    centroid = REF_NODES[ElementFamily.TET_LINEAR].mean(axis=0)
    for side in range(4):
        origin, tangents = ref_side_lift(ElementFamily.TET_LINEAR, side)
        n = np.cross(tangents[:, 0], tangents[:, 1])
        face_center = origin + tangents @ np.array([1 / 3, 1 / 3])
        assert np.dot(n, face_center - centroid) > 0, side


def test_lift_vertices_land_on_face_vertices():
    # hex: corners of [-1,1]^2 lift to the face's 4 reference vertices
    for side in range(6):
        origin, tangents = ref_side_lift(ElementFamily.HEX_LINEAR, side)
        verts = REF_NODES[ElementFamily.HEX_LINEAR][
            LOCAL_FACES[ElementFamily.HEX_LINEAR][side]]
        corners = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]])
        lifted = origin + corners @ tangents.T
        assert np.allclose(lifted, verts), side
    # tet: unit-triangle vertices lift to the face's 3 vertices
    for side in range(4):
        origin, tangents = ref_side_lift(ElementFamily.TET_LINEAR, side)
        verts = REF_NODES[ElementFamily.TET_LINEAR][
            LOCAL_FACES[ElementFamily.TET_LINEAR][side]]
        corners = np.array([[0, 0], [1, 0], [0, 1]])
        lifted = origin + corners @ tangents.T
        assert np.allclose(lifted, verts), side


def test_tet_slant_face_jacobian_magnitude():
    """The slant face (side 1) of the reference tet has area sqrt(3)/2;
    the lift maps the unit triangle (area 1/2), so |cross| = sqrt(3)."""
    _origin, tangents = ref_side_lift(ElementFamily.TET_LINEAR, 1)
    n = np.cross(tangents[:, 0], tangents[:, 1])
    assert np.isclose(np.linalg.norm(n), np.sqrt(3.0))


# ----------------------------------------------------------- quadrature


def test_hex_quadrature_monomial_exactness_high_degree():
    from cmad_tpu.fem.quadrature import hex_quadrature

    rule = hex_quadrature(degree=5)
    # exact for x^5 y^4 z^3 over [-1,1]^3: odd powers integrate to 0
    vals = (rule.xi[:, 0] ** 4) * (rule.xi[:, 1] ** 2)
    integral = float(np.sum(rule.w * vals))
    assert np.isclose(integral, (2 / 5) * (2 / 3) * 2.0)


def test_tet_quadrature_degree_2_exact_for_quadratics():
    from cmad_tpu.fem.quadrature import tet_quadrature

    rule = tet_quadrature(degree=2)
    # int_T x*y dV over unit tet = 1/120
    vals = rule.xi[:, 0] * rule.xi[:, 1]
    assert np.isclose(float(np.sum(rule.w * vals)), 1.0 / 120.0)


def test_quadrature_rejects_nonpositive_degree():
    from cmad_tpu.fem.quadrature import hex_quadrature, tet_quadrature

    for fn in (hex_quadrature, tet_quadrature):
        with pytest.raises(ValueError):
            fn(degree=0)


# -------------------------------------------------------- interpolants


def test_gradients_sum_to_zero_at_random_points():
    rng = np.random.RandomState(0)
    for fn, pts in ((hex_linear, rng.uniform(-1, 1, (5, 3))),
                    (tet_linear, rng.dirichlet(np.ones(4), 5)[:, :3])):
        for p in pts:
            shapes = fn(np.asarray(p))
            assert np.allclose(np.asarray(shapes.N).sum(), 1.0)
            assert np.allclose(np.asarray(shapes.grad_N).sum(axis=0), 0.0,
                               atol=1e-12)


# ------------------------------------------------------ BC declarations


def test_dirichlet_dataclass_round_trip_and_frozen():
    bc = DirichletBC(("a", "b"), "u", (0, 2), [1.0, 2.0])
    assert bc.sideset_names == ("a", "b")
    assert bc.field_name == "u"
    with pytest.raises(Exception):
        bc.field_name = "v"


def test_neumann_requires_nonempty_values_and_sidesets():
    with pytest.raises(ValueError):
        NeumannBC([], "u", [1.0, 0.0, 0.0])
    with pytest.raises(ValueError):
        NeumannBC(["zmax_sides"], "u", None)


def test_dirichlet_value_length_mismatch():
    with pytest.raises(ValueError, match="length"):
        DirichletBC(["s"], "u", [0, 1], [1.0])
