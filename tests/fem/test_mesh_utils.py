"""Mesh utilities: structured builder sets, hex->tet split volume,
coordinate sidesets, RMS edge sizes.

Mirrors the reference's ``tests/fem/test_mesh*.py`` intent.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.mesh import (
    StructuredHexMesh,
    coordinate_side_sets,
    element_rms_edge_sizes,
    hex_to_tet_split,
)
from cmad_tpu.fem.topology import ElementFamily


def _tet_volume(nodes, conn):
    a, b, c, d = (nodes[conn[:, k]] for k in range(4))
    return np.abs(np.einsum("ij,ij->i", np.cross(b - a, c - a),
                            d - a)) / 6.0


def _hex_volume_structured(lengths, divisions):
    return np.prod(lengths) / np.prod(divisions)


def test_structured_hex_counts_and_sets():
    mesh = StructuredHexMesh((2.0, 1.0, 1.0), (4, 2, 2))
    assert mesh.connectivity.shape == (16, 8)
    assert mesh.nodes.shape == (5 * 3 * 3, 3)
    assert mesh.element_family == ElementFamily.HEX_LINEAR
    for name in ("xmin_sides", "xmax_sides", "ymin_sides", "ymax_sides",
                 "zmin_sides", "zmax_sides"):
        assert name in mesh.side_sets
    # each x face contains n_y * n_z element sides
    assert len(mesh.side_sets["xmin_sides"]) == 4
    assert len(mesh.side_sets["zmax_sides"]) == 8


def test_hex_to_tet_preserves_volume():
    mesh = StructuredHexMesh((1.0, 2.0, 3.0), (2, 2, 1))
    tet = hex_to_tet_split(mesh)
    assert tet.element_family == ElementFamily.TET_LINEAR
    assert tet.connectivity.shape == (6 * mesh.connectivity.shape[0], 4)
    vol = _tet_volume(np.asarray(tet.nodes), tet.connectivity).sum()
    np.testing.assert_allclose(vol, 6.0, rtol=1e-13)


def test_hex_to_tet_preserves_side_sets():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    tet = hex_to_tet_split(mesh)
    # every hex side splits into 2 tet sides
    for name, sides in mesh.side_sets.items():
        assert len(tet.side_sets[name]) == 2 * len(sides), name


def test_coordinate_side_sets_match_structured():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    coord_sets = coordinate_side_sets(mesh)
    for name in ("xmin_sides", "xmax_sides", "ymin_sides", "zmax_sides"):
        got = {tuple(s) for s in np.asarray(coord_sets[name]).tolist()}
        want = {tuple(s) for s in
                np.asarray(mesh.side_sets[name]).tolist()}
        assert got == want, name


def test_element_rms_edge_sizes_uniform():
    mesh = StructuredHexMesh((2.0, 2.0, 2.0), (2, 2, 2))
    h = element_rms_edge_sizes(mesh)
    assert h.shape == (8,)
    np.testing.assert_allclose(h, 1.0, rtol=1e-13)


def test_element_rms_edge_sizes_anisotropic():
    mesh = StructuredHexMesh((2.0, 1.0, 1.0), (1, 1, 1))
    h = element_rms_edge_sizes(mesh)
    # edges: 4 of length 2, 8 of length 1 -> rms = sqrt(24/12) = sqrt(2)
    np.testing.assert_allclose(h, np.sqrt(2.0), rtol=1e-13)


def test_entity_counts():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    from cmad_tpu.fem.elements import EntityType
    assert mesh.entity_count(EntityType.VERTEX) == 8
    assert mesh.entity_count(EntityType.CELL) == 1
