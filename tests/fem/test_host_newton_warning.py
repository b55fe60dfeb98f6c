"""The host Newton driver warns when a step ends far from tolerance."""
from __future__ import annotations

import warnings

import numpy as np
import pytest

from cmad_tpu.fem.nonlinear_solver import fe_quasistatic_drive_host

from tests.fem.test_fe_core import (
    GlobalResidualMode,
    SmallRateElasticPlastic,
    _mesh_and_dofmap,
    _plastic_params,
    build_fe_problem,
)
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)


def _fe():
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    model = SmallRateElasticPlastic(_plastic_params())
    return build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.COUPLED})


def test_converged_drive_is_silent():
    fe = _fe()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        state, log = fe_quasistatic_drive_host(fe, [0.0, 1.0])
    assert not [x for x in w if issubclass(x.category, RuntimeWarning)]
    assert log[0]["final_residual"] < 1e-8


def test_unconverged_step_warns():
    """A hopeless linear solver (1 unpreconditioned GMRES iteration)
    cannot converge the Newton step; the driver must say so."""
    fe = _fe()
    lss = {"type": "gmres", "rtol": 1e-10, "max iters": 1, "restart": 1}
    with pytest.warns(RuntimeWarning, match="unconverged"):
        fe_quasistatic_drive_host(fe, [0.0, 1.0],
                                  linear_solver_settings=lss)
