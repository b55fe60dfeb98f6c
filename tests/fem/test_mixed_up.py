"""Stabilized mixed u-p formulation: near-incompressible patch test with
the direct solver and the device-native block-preconditioned GMRES.

Mirrors the reference tests/fem/test_mixed_up_patch.py intent.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters

E_MOD, NU = 1000.0, 0.49995   # near-incompressible


def _problem(mode=GlobalResidualMode.CLOSED_FORM, model=None):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    gr = SmallDispEquilibrium(ndims=3, mixed=True)
    if model is None:
        model = Elastic(Parameters({"elastic": {"E": E_MOD, "nu": NU}}))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: 0.01 * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(
        mesh, [GlobalFieldLayout("u", Q1_HEX),
               GlobalFieldLayout("p", Q1_HEX)], bcs, {"u": 3, "p": 1})
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": mode})
    return mesh, dof_map, fe


BLOCK_CHEBYSHEV = {
    "type": "gmres", "rtol": 1e-12,
    "preconditioner": {"type": "block", "coupling": "lower",
                       "inner": "chebyshev", "diagonal_block": "schur",
                       "degree": 3}}
BLOCK_JACOBI = {
    "type": "gmres", "rtol": 1e-12,
    "preconditioner": {"type": "block", "coupling": "lower",
                       "inner": "jacobi",
                       "diagonal_block": "assembled"}}


@pytest.mark.parametrize("solver", [
    {"type": "direct"}, BLOCK_JACOBI, BLOCK_CHEBYSHEV],
    ids=["direct", "block-jacobi", "block-chebyshev-schur"])
def test_mixed_up_patch_elastic(solver):
    mesh, dof_map, fe = _problem()
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0],
                                    linear_solver_settings=solver)
    n_u = dof_map.block_offsets[1]
    U = state.U_at(1)[:n_u].reshape(-1, 3)
    p = state.U_at(1)[n_u:]
    x = mesh.nodes
    exact = np.stack([0.01 * x[:, 0], -NU * 0.01 * x[:, 1],
                      -NU * 0.01 * x[:, 2]], axis=1)
    assert np.abs(U - exact).max() < 1e-10
    assert np.abs(p - (-E_MOD * 0.01 / 3.0)).max() < 1e-8


def test_mixed_up_plastic_runs_and_matches_pressure():
    """COUPLED mixed u-p with J2 plasticity: pressure equals -hydro of
    the converged stress everywhere."""
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}}
    model = SmallRateElasticPlastic(Parameters(values))
    mesh, dof_map, fe = _problem(mode=GlobalResidualMode.COUPLED,
                                 model=model)
    state, _ = fe_quasistatic_drive(fe, [0.0, 0.5, 1.0])

    n_u = dof_map.block_offsets[1]
    p = state.U_at(2)[n_u:]
    xi = state.xi_at(2, "all")
    hydro = (xi[..., 0] + xi[..., 3] + xi[..., 5]) / 3.0
    assert np.abs(p.mean() + hydro.mean()) < 1e-6 * abs(p.mean())
    assert xi[..., 6].max() > 0.0  # actually yielded
