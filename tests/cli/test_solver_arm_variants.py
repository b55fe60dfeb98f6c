"""CLI solver-arm matrix + error paths.

Every deck-selectable iterative arm must reproduce the direct-solve
trajectory on the plastic cube (reference pattern: the solver x
preconditioner sweep of ``tests/fem/test_sparse_solve.py`` lifted to
the deck/CLI surface), and broken invocations must fail with
actionable errors, not tracebacks-as-success.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.io.exodus import ExodusWriter, read_results
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType

from tests.cli.test_fe_roundtrips import _plastic_deck, _write


@pytest.fixture
def cube_exo(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    ExodusWriter(path, mesh).close()
    return path


def _final_u(out_dir):
    res = read_results(out_dir / "cube_fe.exo",
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
    return np.asarray(res.nodal["u"][-1])


_ARMS = [
    ("cg-jacobi", {"type": "cg", "rtol": 1e-12, "max iters": 2000,
                   "preconditioner": {"type": "jacobi"}}),
    ("cg-chebyshev", {"type": "cg", "rtol": 1e-12, "max iters": 2000,
                      "preconditioner": {"type": "chebyshev",
                                         "degree": 3}}),
    ("cg-two-level", {"type": "cg", "rtol": 1e-12, "max iters": 2000,
                      "preconditioner": {"type": "two_level",
                                         "aggregate nodes": 8}}),
    ("cg-adaptive", {"type": "cg", "rtol": 1e-12, "max iters": 2000,
                     "adaptive rtol": True,
                     "preconditioner": {"type": "jacobi"}}),
    ("gmres-jacobi", {"type": "gmres", "rtol": 1e-12,
                      "max iters": 2000, "restart": 40,
                      "preconditioner": {"type": "jacobi"}}),
    ("gmres-two-level", {"type": "gmres", "rtol": 1e-12,
                         "max iters": 2000, "restart": 40,
                         "preconditioner": {"type": "two_level",
                                            "aggregate nodes": 8}}),
]


@pytest.fixture(scope="module")
def direct_u(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("direct")
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    cube = tmp / "cube.exo"
    ExodusWriter(cube, mesh).close()
    out = tmp / "out"
    deck = _plastic_deck(cube, out)
    deck["linear solver"] = {"type": "direct"}
    assert cmad_main(["primal", str(_write(tmp, deck))]) == 0
    return _final_u(out)


@pytest.mark.parametrize("name,ls", _ARMS, ids=[a[0] for a in _ARMS])
def test_iterative_arm_matches_direct(tmp_path, cube_exo, direct_u,
                                      name, ls):
    out = tmp_path / "out"
    deck = _plastic_deck(cube_exo, out)
    deck["linear solver"] = ls
    assert cmad_main(["primal", str(_write(tmp_path, deck))]) == 0
    np.testing.assert_allclose(_final_u(out), direct_u, rtol=1e-7,
                               atol=1e-12)


def test_missing_deck_file_fails_cleanly():
    with pytest.raises(FileNotFoundError, match="deck not found"):
        cmad_main(["primal", "/nonexistent/deck.yaml"])


def test_invalid_yaml_fails_cleanly(tmp_path):
    bad = tmp_path / "deck.yaml"
    bad.write_text("problem: [unclosed\n")
    with pytest.raises(Exception):
        cmad_main(["primal", str(bad)])


def test_missing_mesh_file_is_actionable(tmp_path):
    deck = _plastic_deck(tmp_path / "nope.exo", tmp_path / "out")
    with pytest.raises(FileNotFoundError, match="nope.exo"):
        cmad_main(["primal", str(_write(tmp_path, deck))])


def test_binary_msh_mesh_through_cli(tmp_path):
    """A binary gmsh v2.2 cube with face physical groups drives the
    same primal answer as the Exodus mesh."""
    from cmad_tpu.fem.topology import LOCAL_FACES

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    local = LOCAL_FACES[mesh.element_family]
    names = ["xmin_sides", "xmax_sides", "ymin_sides",
             "ymax_sides", "zmin_sides", "zmax_sides"]
    out = bytearray()
    out += b"$MeshFormat\n2.2 1 8\n" + struct.pack("<i", 1)
    out += b"\n$EndMeshFormat\n$PhysicalNames\n7\n"
    for i, n in enumerate(names):
        out += f'2 {i + 1} "{n}"\n'.encode()
    out += b'3 7 "all"\n$EndPhysicalNames\n'
    out += b"$Nodes\n" + str(len(mesh.nodes)).encode() + b"\n"
    for i, xyz in enumerate(mesh.nodes):
        out += struct.pack("<i", i + 1) + struct.pack("<3d", *xyz)
    out += b"\n$EndNodes\n"
    surf = []
    for ptag, name in enumerate(names, start=1):
        for (e, f) in np.asarray(mesh.side_sets[name]):
            surf.append((ptag, mesh.connectivity[e, local[f]] + 1))
    out += (b"$Elements\n"
            + str(len(surf) + len(mesh.connectivity)).encode() + b"\n")
    for ptag, conn in surf:
        out += struct.pack("<3i", 3, 1, 2)
        out += struct.pack("<3i", 1, ptag, ptag)
        out += struct.pack("<4i", *conn.tolist())
    out += struct.pack("<3i", 5, len(mesh.connectivity), 2)
    for k, conn in enumerate(mesh.connectivity + 1):
        out += struct.pack("<3i", k + 1, 7, 7)
        out += struct.pack("<8i", *conn.tolist())
    out += b"\n$EndElements\n"
    msh = tmp_path / "cube.msh"
    msh.write_bytes(bytes(out))

    out_dir = tmp_path / "out"
    deck = _plastic_deck(msh, out_dir)
    assert cmad_main(["primal", str(_write(tmp_path, deck))]) == 0
    res = read_results(out_dir / "cube_fe.exo",
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
    assert np.isclose(np.asarray(res.nodal["u"])[-1, :, 0].max(), 0.003)
