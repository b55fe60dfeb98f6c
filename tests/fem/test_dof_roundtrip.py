"""Dof-map encode/decode round trip and Dirichlet reaction handles."""
from __future__ import annotations

import numpy as np

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.mesh import StructuredHexMesh


def _dof_map(bcs=None):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = bcs if bcs is not None else []
    return mesh, build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)],
                               bcs, {"u": 3})


def test_eq_index_decode_round_trip():
    _, dm = _dof_map()
    for basis_fn in (0, 5, 26):
        for dof in (0, 1, 2):
            eq = dm.eq_index(0, basis_fn, dof)
            assert dm._decode_eq(eq) == (0, basis_fn, dof)
    assert dm.num_total_dofs == 27 * 3


def test_free_and_prescribed_counts():
    mesh, dm = _dof_map([DirichletBC(["xmin_sides"], "u", [0, 1, 2])])
    # xmin face of the 2x2x2 cube has 9 nodes
    assert dm.num_prescribed_dofs == 9 * 3
    assert dm.num_free_dofs == dm.num_total_dofs - 27


def test_dirichlet_eqs_for_component():
    mesh, dm = _dof_map([DirichletBC(["xmin_sides"], "u", [0, 1, 2]),
                         DirichletBC(["xmax_sides"], "u", [0])])
    eqs = dm.dirichlet_eqs_for_component("xmax_sides", "u", 0)
    assert eqs.shape == (9,)
    # every returned eq is an x-component (dof 0) of some node
    for eq in eqs:
        f, _bf, dof = dm._decode_eq(int(eq))
        assert (f, dof) == (0, 0)
    # and the node actually lies on x = 1
    x = np.asarray(mesh.nodes)
    for eq in eqs:
        _f, bf, _d = dm._decode_eq(int(eq))
        assert x[bf, 0] == 1.0
