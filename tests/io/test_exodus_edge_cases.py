"""Exodus reader/writer edge cases: malformed inputs, multi-block
meshes, node-set preservation, and the 64-bit-offset write format.

Deepens the io permutation coverage (reference pattern: the breadth of
``tests/io/test_exodus.py``).
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh, hex_to_tet_split
from cmad_tpu.io.exodus import (
    ExodusFormatError,
    ExodusWriter,
    read_mesh,
    read_results,
)


def test_non_netcdf_file_rejected(tmp_path):
    bad = tmp_path / "bad.exo"
    bad.write_bytes(b"this is not a netcdf file at all")
    with pytest.raises(ExodusFormatError):
        read_mesh(bad)


def test_truncated_file_rejected(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    ExodusWriter(path, mesh).close()
    data = path.read_bytes()
    (tmp_path / "trunc.exo").write_bytes(data[: len(data) // 3])
    with pytest.raises(Exception):
        read_mesh(tmp_path / "trunc.exo")


def test_missing_file_is_filenotfound(tmp_path):
    with pytest.raises(FileNotFoundError, match="ghost.exo"):
        read_mesh(tmp_path / "ghost.exo")


def test_write_uses_64bit_offset_format(tmp_path):
    """Large-mesh safety: files are written as NetCDF classic 64-bit
    offset (version 2), lifting the 2 GB variable cap of the classic
    format the reference's netCDF4 backend never had."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    ExodusWriter(path, mesh).close()
    magic = path.read_bytes()[:4]
    assert magic == b"CDF\x02"
    read_mesh(path)  # and it reads back


def test_multi_block_round_trip(tmp_path):
    base = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    n = base.connectivity.shape[0]
    half = n // 2
    mesh = Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={"lower": np.arange(half, dtype=np.intp),
                        "upper": np.arange(half, n, dtype=np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets,
        element_block_ids={"lower": 1, "upper": 2},
        side_set_ids=base.side_set_ids)
    path = tmp_path / "two_block.exo"
    ExodusWriter(path, mesh).close()
    back = read_mesh(path)
    assert set(back.element_blocks) == {"lower", "upper"}
    np.testing.assert_array_equal(back.element_blocks["lower"],
                                  mesh.element_blocks["lower"])
    np.testing.assert_array_equal(back.element_blocks["upper"],
                                  mesh.element_blocks["upper"])
    np.testing.assert_allclose(back.nodes, mesh.nodes)


def test_node_sets_round_trip(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (3, 3, 3))
    path = tmp_path / "cube.exo"
    ExodusWriter(path, mesh).close()
    back = read_mesh(path)
    assert set(back.node_sets) == set(mesh.node_sets)
    for name in mesh.node_sets:
        np.testing.assert_array_equal(
            np.sort(np.asarray(back.node_sets[name])),
            np.sort(np.asarray(mesh.node_sets[name])))


def test_tet_side_sets_round_trip(tmp_path):
    mesh = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0),
                                              (2, 2, 2)))
    path = tmp_path / "tets.exo"
    ExodusWriter(path, mesh).close()
    back = read_mesh(path)
    for name in mesh.side_sets:
        a = {tuple(r) for r in np.asarray(back.side_sets[name])}
        b = {tuple(r) for r in np.asarray(mesh.side_sets[name])}
        assert a == b, name


def test_read_results_empty_specs(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    w = ExodusWriter(path, mesh)
    w.close()
    res = read_results(path)
    assert res.times.size == 0
    assert res.nodal == {} and res.element == {}
