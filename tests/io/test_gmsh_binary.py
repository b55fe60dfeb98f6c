"""Binary gmsh ``.msh`` parsing (v2.2 and v4.1, both endiannesses).

Parity: the reference reads binary files through the gmsh SDK
(``cmad/io/gmsh.py:45``); cmad_tpu parses the documented binary layout
directly. Fixtures here are written byte-by-byte from the public MSH
format specification and checked against the ASCII parse of the same
mesh.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from cmad_tpu.io.gmsh import read_mesh

_ASCII_V41 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
2
2 1 "loaded"
3 2 "body"
$EndPhysicalNames
$Entities
0 0 1 1
1 0 0 0 1 1 1 1 1
1 0 0 0 1 1 1 1 2 1 1
$EndEntities
$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
2 2 1 2
2 1 2 1
1 1 2 4
3 1 4 1
2 1 2 3 4
$EndElements
"""

_NODES = [(1, (0.0, 0.0, 0.0)), (2, (1.0, 0.0, 0.0)),
          (3, (0.0, 1.0, 0.0)), (4, (0.0, 0.0, 1.0))]


def _binary_v41(endian: str) -> bytes:
    i4 = endian + "i"
    u8 = endian + "q"
    out = bytearray()
    out += b"$MeshFormat\n4.1 1 8\n"
    out += struct.pack(i4, 1)
    out += b"\n$EndMeshFormat\n"
    out += b'$PhysicalNames\n2\n2 1 "loaded"\n3 2 "body"\n'
    out += b"$EndPhysicalNames\n"
    # Entities: 0 points, 0 curves, 1 surface (phys 1), 1 volume (phys 2)
    out += b"$Entities\n"
    out += struct.pack(endian + "4q", 0, 0, 1, 1)
    out += struct.pack(i4, 1) + struct.pack(endian + "6d", *([0.0] * 3
                                                             + [1.0] * 3))
    out += struct.pack(u8, 1) + struct.pack(i4, 1)   # physical tag 1
    out += struct.pack(u8, 0)                        # bounding curves
    out += struct.pack(i4, 1) + struct.pack(endian + "6d", *([0.0] * 3
                                                             + [1.0] * 3))
    out += struct.pack(u8, 1) + struct.pack(i4, 2)   # physical tag 2
    out += struct.pack(u8, 0)                        # bounding surfaces
    out += b"\n$EndEntities\n"
    # Nodes: one block (dim 3, tag 1), tags then coords
    out += b"$Nodes\n"
    out += struct.pack(endian + "4q", 1, 4, 1, 4)
    out += struct.pack(endian + "3i", 3, 1, 0) + struct.pack(u8, 4)
    for tag, _ in _NODES:
        out += struct.pack(u8, tag)
    for _, xyz in _NODES:
        out += struct.pack(endian + "3d", *xyz)
    out += b"\n$EndNodes\n"
    # Elements: tri3 block on the surface entity, tet4 on the volume
    out += b"$Elements\n"
    out += struct.pack(endian + "4q", 2, 2, 1, 2)
    out += struct.pack(endian + "3i", 2, 1, 2) + struct.pack(u8, 1)
    out += struct.pack(endian + "4q", 1, 1, 2, 4)
    out += struct.pack(endian + "3i", 3, 1, 4) + struct.pack(u8, 1)
    out += struct.pack(endian + "5q", 2, 1, 2, 3, 4)
    out += b"\n$EndElements\n"
    return bytes(out)


def _binary_v22(endian: str) -> bytes:
    i4 = endian + "i"
    out = bytearray()
    out += b"$MeshFormat\n2.2 1 8\n"
    out += struct.pack(i4, 1)
    out += b"\n$EndMeshFormat\n"
    out += b'$PhysicalNames\n2\n2 1 "loaded"\n3 2 "body"\n'
    out += b"$EndPhysicalNames\n"
    out += b"$Nodes\n4\n"
    for tag, xyz in _NODES:
        out += struct.pack(i4, tag) + struct.pack(endian + "3d", *xyz)
    out += b"\n$EndNodes\n"
    out += b"$Elements\n2\n"
    # tri3 header (etype, n_follow, n_tags) then (tag, phys, geom, conn)
    out += struct.pack(endian + "3i", 2, 1, 2)
    out += struct.pack(endian + "6i", 1, 1, 1, 1, 2, 4)
    # tet4
    out += struct.pack(endian + "3i", 4, 1, 2)
    out += struct.pack(endian + "7i", 2, 2, 1, 1, 2, 3, 4)
    out += b"\n$EndElements\n"
    return bytes(out)


def _check_matches_ascii(mesh, tmp_path):
    ref_path = tmp_path / "ref.msh"
    ref_path.write_text(_ASCII_V41)
    ref = read_mesh(ref_path)
    np.testing.assert_allclose(mesh.nodes, ref.nodes)
    np.testing.assert_array_equal(mesh.connectivity, ref.connectivity)
    assert set(mesh.element_blocks) == set(ref.element_blocks) == {"body"}
    np.testing.assert_array_equal(mesh.element_blocks["body"],
                                  ref.element_blocks["body"])
    assert set(mesh.side_sets) == {"loaded"}
    np.testing.assert_array_equal(mesh.side_sets["loaded"],
                                  ref.side_sets["loaded"])


@pytest.mark.parametrize("endian", ["<", ">"])
def test_binary_v41_matches_ascii(tmp_path, endian):
    path = tmp_path / "bin41.msh"
    path.write_bytes(_binary_v41(endian))
    _check_matches_ascii(read_mesh(path), tmp_path)


@pytest.mark.parametrize("endian", ["<", ">"])
def test_binary_v22_matches_ascii(tmp_path, endian):
    path = tmp_path / "bin22.msh"
    path.write_bytes(_binary_v22(endian))
    _check_matches_ascii(read_mesh(path), tmp_path)


def test_binary_v40_rejected(tmp_path):
    out = b"$MeshFormat\n4.0 1 8\n" + struct.pack("<i", 1)
    out += b"\n$EndMeshFormat\n"
    path = tmp_path / "bin40.msh"
    path.write_bytes(out)
    with pytest.raises(ValueError, match="4.1 and 2.2"):
        read_mesh(path)


def test_binary_unknown_element_type_rejected(tmp_path):
    i4 = "<i"
    out = bytearray()
    out += b"$MeshFormat\n2.2 1 8\n" + struct.pack(i4, 1)
    out += b"\n$EndMeshFormat\n$Nodes\n1\n"
    out += struct.pack(i4, 1) + struct.pack("<3d", 0.0, 0.0, 0.0)
    out += b"\n$EndNodes\n$Elements\n1\n"
    out += struct.pack("<3i", 11, 1, 2)  # tet10: unsupported
    path = tmp_path / "bad.msh"
    path.write_bytes(bytes(out))
    with pytest.raises(ValueError, match="unsupported gmsh element"):
        read_mesh(path)
