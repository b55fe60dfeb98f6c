"""FE QoI variant coverage: displacement match exactness, load-match
modes, and error paths.

Deepens tests/qois toward the reference's breadth
(``tests/qois`` + ``cmad/qois/fe_*.py`` behaviors).
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
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
from cmad_tpu.qois.fe_displacement_match import FEDisplacementMatch
from cmad_tpu.qois.fe_load_match import FELoadMatch


def _problem(n=2):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    return build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})


def test_displacement_match_zero_at_matching_data():
    fe = _problem()
    t = [0.0, 1.0]
    n_nodes = fe.mesh.nodes.shape[0]
    data = np.zeros((2, n_nodes, 3))
    data[1, :, 0] = 0.25 * fe.mesh.nodes[:, 0]
    qoi = FEDisplacementMatch(fe, t, data)
    contrib = qoi.step_contribution(
        {"all": {}}, fe.kernel_arrays)
    U1 = np.asarray(data[1].reshape(-1))
    J1 = float(contrib(U1, np.zeros_like(U1), None, None, 1.0, 0.0))
    assert np.isclose(J1, 0.0, atol=1e-14)
    # a mismatch is positive and scales quadratically
    J_off = float(contrib(1.1 * U1, np.zeros_like(U1), None, None,
                          1.0, 0.0))
    J_off2 = float(contrib(1.2 * U1, np.zeros_like(U1), None, None,
                           1.0, 0.0))
    assert J_off > 0.0
    assert np.isclose(J_off2 / J_off, 4.0, rtol=1e-6)


def test_displacement_match_rejects_wrong_steps():
    fe = _problem()
    n_nodes = fe.mesh.nodes.shape[0]
    with pytest.raises(ValueError, match="steps"):
        FEDisplacementMatch(fe, [0.0, 0.5, 1.0],
                            np.zeros((2, n_nodes, 3)))


def test_displacement_match_rejects_wrong_dofs():
    fe = _problem()
    with pytest.raises(ValueError, match="dofs"):
        FEDisplacementMatch(fe, [0.0, 1.0], np.zeros((2, 5, 3)))


def test_load_match_write_mode_has_no_objective():
    fe = _problem()
    qoi = FELoadMatch(fe, [0.0, 1.0], "xmin_sides", [0],
                      output_file="reactions.csv")
    assert qoi.produces_primal_output()
    with pytest.raises(ValueError, match="write mode"):
        qoi.step_contribution({"all": {}}, fe.kernel_arrays)


def test_load_match_match_mode_produces_no_primal_output():
    fe = _problem()
    data = np.zeros((2, 1))
    qoi = FELoadMatch(fe, [0.0, 1.0], "xmin_sides", [0], data=data)
    assert not qoi.produces_primal_output()
    contrib = qoi.step_contribution(
        {"all": Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}).values},
        fe.kernel_arrays)
    n = fe.dof_map.num_total_dofs
    J = float(contrib(np.zeros(n), np.zeros(n), None, None, 1.0, 0.0))
    assert np.isclose(J, 0.0, atol=1e-12)  # zero field, zero reaction


def test_load_match_unknown_sideset_raises():
    fe = _problem()
    with pytest.raises(Exception):
        FELoadMatch(fe, [0.0, 1.0], "no_such_sides", [0],
                    data=np.zeros((2, 1)))
