"""Convergence-print toggles via stdout capture.

Mirrors the reference ``tests/fem/test_solver_printing.py``: with
``print convergence`` on, the drive emits per-step headers and per-iter
Newton residual lines; with it off (the default), the drive is silent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _drive(**settings):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0, 1, 2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: 0.001 * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                          {"all": model})
    state, _ = fe_quasistatic_drive(
        fe, [0.0, 1.0], nonlinear_solver_settings=settings or None)
    return state


def test_print_convergence_emits_step_and_newton_lines(capfd):
    _drive(**{"print convergence": True})
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "ON PRIMAL STEP" in out
    assert "Newton: abs ||R||" in out


def test_default_drive_is_silent(capfd):
    _drive()
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "ON PRIMAL STEP" not in out
    assert "Newton" not in out
