"""Depth tests for the mesh layer: construction validation, derived
edge/face tables, hex->tet remaps, and coordinate sidesets.

Mirrors the intent of reference tests/fem/test_mesh.py (39 tests) that
tests/fem/test_mesh_utils.py does not already cover.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.elements import (
    EntityType,
    FiniteElement,
    P1_TET,
    Q1_HEX,
    hex_linear,
)
from cmad_tpu.fem.mesh import (
    Mesh,
    StructuredHexMesh,
    coordinate_side_sets,
    hex_to_tet_split,
)
from cmad_tpu.fem.topology import ElementFamily


def _single_tet() -> Mesh:
    nodes = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    return Mesh(nodes=nodes,
                connectivity=np.array([[0, 1, 2, 3]], dtype=np.intp),
                element_family=ElementFamily.TET_LINEAR,
                element_blocks={"all": np.array([0], dtype=np.intp)},
                node_sets={}, side_sets={})


# ---------------------------------------------------------------- Mesh


def test_post_init_rejects_wrong_connectivity_width():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    with pytest.raises(ValueError, match="connectivity"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity[:, :6],
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m.element_blocks,
             node_sets={}, side_sets={})


def test_post_init_rejects_out_of_range_connectivity():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    bad = m.connectivity.copy()
    bad[0, 0] = m.nodes.shape[0]
    with pytest.raises(ValueError, match="out of range"):
        Mesh(nodes=m.nodes, connectivity=bad,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m.element_blocks, node_sets={}, side_sets={})


def test_post_init_rejects_block_partition_holes():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    with pytest.raises(ValueError, match="partition"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks={"half": np.array([0], dtype=np.intp)},
             node_sets={}, side_sets={})


def test_post_init_rejects_multiply_assigned_elements():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    with pytest.raises(ValueError, match="multiply-assigned"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks={"a": np.array([0, 1], dtype=np.intp),
                             "b": np.array([1], dtype=np.intp)},
             node_sets={}, side_sets={})


def test_post_init_rejects_bad_side_set_shape():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    with pytest.raises(ValueError, match="side_sets"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m.element_blocks, node_sets={},
             side_sets={"bad": np.array([0, 0], dtype=np.intp)})


def test_post_init_rejects_face_id_out_of_range():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    with pytest.raises(ValueError, match="out of range"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m.element_blocks, node_sets={},
             side_sets={"bad": np.array([[0, 6]], dtype=np.intp)})


def test_post_init_rejects_mismatched_interchange_ids():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    with pytest.raises(ValueError, match="keys must match"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m.element_blocks, node_sets={}, side_sets={},
             element_block_ids={"nope": 1})


def test_post_init_rejects_duplicate_interchange_ids():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    with pytest.raises(ValueError, match="unique positive"):
        Mesh(nodes=m.nodes, connectivity=m.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks={"a": np.array([0], dtype=np.intp),
                             "b": np.array([1], dtype=np.intp)},
             node_sets={}, side_sets={},
             element_block_ids={"a": 1, "b": 1})


# ------------------------------------------------- StructuredHexMesh


def test_structured_hex_node_ordering_positive_volume():
    """The builder's hex node ordering must give positive trilinear
    Jacobians (Exodus counterclockwise-bottom-then-top convention)."""
    m = StructuredHexMesh((2.0, 3.0, 4.0), (2, 2, 2))
    for conn in m.connectivity:
        p = m.nodes[conn]
        # edge vectors at vertex 0 form a right-handed frame
        v = np.stack([p[1] - p[0], p[3] - p[0], p[4] - p[0]])
        assert np.linalg.det(v) > 0


def test_structured_hex_origin_offset():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1), origin=(5.0, -2.0, 3.0))
    assert np.allclose(m.nodes.min(axis=0), [5.0, -2.0, 3.0])
    assert np.allclose(m.nodes.max(axis=0), [6.0, -1.0, 4.0])


def test_structured_hex_default_block_all():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (3, 2, 1))
    assert set(m.element_blocks) == {"all"}
    assert np.array_equal(np.sort(m.element_blocks["all"]), np.arange(6))


def test_corner_node_belongs_to_three_min_face_sets():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    corner = int(np.flatnonzero(np.all(m.nodes == 0.0, axis=1))[0])
    for name in ("xmin_nodes", "ymin_nodes", "zmin_nodes"):
        assert corner in m.node_sets[name]
    for name in ("xmax_nodes", "ymax_nodes", "zmax_nodes"):
        assert corner not in m.node_sets[name]


def test_side_set_faces_lie_on_their_plane():
    """Each built-in side set's (elem, local_face) pairs must resolve to
    faces whose four vertices all lie on the named boundary plane."""
    from cmad_tpu.fem.topology import LOCAL_FACES

    m = StructuredHexMesh((1.0, 2.0, 3.0), (2, 2, 2))
    local = LOCAL_FACES[ElementFamily.HEX_LINEAR]
    planes = {"xmin_sides": (0, 0.0), "xmax_sides": (0, 1.0),
              "ymin_sides": (1, 0.0), "ymax_sides": (1, 2.0),
              "zmin_sides": (2, 0.0), "zmax_sides": (2, 3.0)}
    for name, (axis, value) in planes.items():
        pairs = m.side_sets[name]
        assert pairs.shape[0] == 4
        for e, f in pairs:
            verts = m.connectivity[e][local[f]]
            assert np.allclose(m.nodes[verts][:, axis], value)


def test_structured_rejects_zero_division():
    with pytest.raises(ValueError, match="divisions"):
        StructuredHexMesh((1.0, 1.0, 1.0), (0, 1, 1))


# ----------------------------------------------------- hex_to_tet_split


def test_tet_split_element_count_six_times_hex():
    m = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2)))
    assert m.connectivity.shape == (48, 4)


def test_tet_split_family_flips_to_tet_linear():
    m = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1)))
    assert m.element_family == ElementFamily.TET_LINEAR
    assert m.geometric_finite_element is P1_TET


def test_tet_split_positive_volume_on_every_tet():
    m = hex_to_tet_split(StructuredHexMesh((2.0, 1.0, 3.0), (2, 3, 1)))
    p = m.nodes[m.connectivity]
    vols = np.linalg.det(p[:, 1:] - p[:, :1]) / 6.0
    assert np.all(vols > 0)


def test_tet_split_node_sets_carry_over_unchanged():
    hexm = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    tetm = hex_to_tet_split(hexm)
    for name, ids in hexm.node_sets.items():
        assert np.array_equal(np.sort(ids), np.sort(tetm.node_sets[name]))


def test_tet_split_side_sets_double_in_size():
    hexm = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    tetm = hex_to_tet_split(hexm)
    for name, pairs in hexm.side_sets.items():
        assert tetm.side_sets[name].shape == (2 * pairs.shape[0], 2)


def test_tet_split_blocks_remap_to_six_per_hex():
    hexm = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    twob = Mesh(nodes=hexm.nodes, connectivity=hexm.connectivity,
                element_family=ElementFamily.HEX_LINEAR,
                element_blocks={"a": np.array([0], dtype=np.intp),
                                "b": np.array([1], dtype=np.intp)},
                node_sets={}, side_sets={})
    tetm = hex_to_tet_split(twob)
    assert np.array_equal(np.sort(tetm.element_blocks["a"]), np.arange(6))
    assert np.array_equal(np.sort(tetm.element_blocks["b"]),
                          np.arange(6, 12))


def test_tet_split_rejects_non_hex_input():
    with pytest.raises(ValueError, match="HEX_LINEAR"):
        hex_to_tet_split(_single_tet())


# -------------------------------------------------- edge / face tables


def test_single_hex_has_12_edges_6_faces():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    assert m.edges.shape == (12, 2)
    assert m.faces.shape == (6, 4)


def test_single_tet_has_6_edges_4_faces():
    m = _single_tet()
    assert m.edges.shape == (6, 2)
    assert m.faces.shape == (4, 3)


def test_2x2x2_hex_unique_edge_and_face_counts():
    # 3x3x3 grid: edges = 3 * 3*3*2 = 54; faces = 3 * 3*2*2 = 36
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    assert m.edges.shape[0] == 54
    assert m.faces.shape[0] == 36


def test_adjacent_hexes_share_face_edges():
    m = StructuredHexMesh((2.0, 1.0, 1.0), (2, 1, 1))
    e0 = set(map(tuple, m.edges[m.element_edges[0]]))
    e1 = set(map(tuple, m.edges[m.element_edges[1]]))
    assert len(e0 & e1) == 4  # the shared quad face's 4 edges


def test_edges_are_sorted_vertex_pairs():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    assert np.all(m.edges[:, 0] < m.edges[:, 1])
    # sorted-unique: strictly increasing lexicographic order
    keys = m.edges[:, 0] * m.nodes.shape[0] + m.edges[:, 1]
    assert np.all(np.diff(keys) > 0)


def test_faces_are_sorted_vertex_tuples():
    m = _single_tet()
    assert np.all(np.diff(m.faces, axis=1) > 0)


def test_element_edge_indices_in_range_and_cover():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    assert m.element_edges.shape == (8, 12)
    assert m.element_edges.min() >= 0
    assert m.element_edges.max() < m.edges.shape[0]
    assert set(np.unique(m.element_edges)) == set(range(m.edges.shape[0]))


def test_element_edge_round_trip():
    """edges[element_edges[e, k]] must be the sorted vertex pair of local
    edge k of element e."""
    from cmad_tpu.fem.topology import LOCAL_EDGES

    m = StructuredHexMesh((1.0, 2.0, 1.0), (2, 1, 2))
    local = LOCAL_EDGES[ElementFamily.HEX_LINEAR]
    for e in range(m.connectivity.shape[0]):
        expect = np.sort(m.connectivity[e][local], axis=1)
        got = m.edges[m.element_edges[e]]
        assert np.array_equal(got, expect)


def test_element_face_indices_in_range():
    m = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2)))
    assert m.element_faces.shape == (48, 4)
    assert m.element_faces.min() >= 0
    assert m.element_faces.max() < m.faces.shape[0]


def test_entity_counts_single_tet():
    m = _single_tet()
    assert m.entity_count(EntityType.VERTEX) == 4
    assert m.entity_count(EntityType.EDGE) == 6
    assert m.entity_count(EntityType.FACE) == 4
    assert m.entity_count(EntityType.CELL) == 1


# -------------------------------------------------- geometric FE wiring


def test_hex_default_geometric_fe_is_q1():
    m = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    assert m.geometric_finite_element is Q1_HEX


def test_explicit_geometric_fe_preserved():
    custom = FiniteElement("Q1_CUSTOM", ElementFamily.HEX_LINEAR,
                           {EntityType.VERTEX: 1}, hex_linear)
    m0 = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    m = Mesh(nodes=m0.nodes, connectivity=m0.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks=m0.element_blocks, node_sets={}, side_sets={},
             geometric_finite_element=custom)
    assert m.geometric_finite_element is custom


# ------------------------------------------------- coordinate_side_sets


def test_coordinate_side_sets_tet_split():
    hexm = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    tetm = hex_to_tet_split(hexm)
    built = coordinate_side_sets(tetm)
    for name, pairs in tetm.side_sets.items():
        got = {tuple(p) for p in built[name]}
        expect = {tuple(p) for p in pairs}
        assert got == expect, name


def test_coordinate_side_sets_omits_extremes_with_no_coplanar_face():
    """A single tet has full faces only on xmin/ymin/zmin and the oblique
    face; the three max extremes have a single vertex each and must be
    omitted rather than emitted empty."""
    built = coordinate_side_sets(_single_tet())
    assert set(built) == {"xmin_sides", "ymin_sides", "zmin_sides"}
    for pairs in built.values():
        assert pairs.shape == (1, 2)
