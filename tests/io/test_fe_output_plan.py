"""FE output-plan resolution and the Exodus write path it drives.

Mirrors the reference's FE output-plan coverage
(``cmad/io/writers.py:189-276`` semantics).
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
from cmad_tpu.io.fe_writers import resolve_fe_output_plan, write_fe_exodus
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.var_types import VarType
from cmad_tpu.parameters.parameters import Parameters


def _problem(mode=GlobalResidualMode.CLOSED_FORM):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: 0.01 * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    return build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                            {"all": model},
                            modes_by_block={"all": mode})


def test_default_plan_exposes_full_catalog():
    fe = _problem()
    plan = resolve_fe_output_plan({}, fe)
    assert [(f.name, f.var_type) for f in plan.nodal] == \
        [("u", VarType.VECTOR)]
    names = [f.name for f in plan.element_by_block["all"]]
    assert "cauchy" in names


def test_coupled_elastic_derived_shadows_state_cauchy():
    """COUPLED Elastic: the state variable IS the stress; the derived
    'cauchy' evaluator must shadow it, not collide."""
    fe = _problem(GlobalResidualMode.COUPLED)
    plan = resolve_fe_output_plan({}, fe)
    fields = {f.name: f for f in plan.element_by_block["all"]}
    assert "cauchy" in fields
    assert fields["cauchy"].var_type == VarType.SYM_TENSOR
    assert list(fields).count("cauchy") == 1


def test_unknown_selections_raise():
    fe = _problem()
    with pytest.raises(ValueError, match="global residual"):
        resolve_fe_output_plan({"global residual": ["vorticity"]}, fe)
    with pytest.raises(ValueError, match="unknown block"):
        resolve_fe_output_plan({"local residual": {"steel": ["cauchy"]}},
                               fe)
    with pytest.raises(ValueError, match="unknown field"):
        resolve_fe_output_plan({"local residual": {"all": ["entropy"]}},
                               fe)


def test_write_fe_exodus_round_trip(tmp_path):
    fe = _problem()
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    plan = resolve_fe_output_plan({}, fe)
    write_fe_exodus(tmp_path, "", fe, state, plan, "out.exo")

    from cmad_tpu.io.exodus import read_results
    from cmad_tpu.io.results import FieldSpec

    res = read_results(tmp_path / "out.exo",
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)],
                       element_field_specs=[
                           FieldSpec("cauchy", VarType.SYM_TENSOR)])
    assert res.nodal["u"].shape[0] == 2          # both steps
    u_final = res.nodal["u"][-1]
    np.testing.assert_allclose(
        np.linalg.norm(u_final),
        np.linalg.norm(np.asarray(state.U_at(1)).reshape(-1, 3)),
        rtol=1e-12)
    sig = res.element["cauchy"]["all"][-1]        # (n_elems, 6) exodus
    assert sig.shape == (1, 6)
    # uniaxial stress state: sigma_xx = E * eps = 10
    np.testing.assert_allclose(sig[0, 0], 10.0, rtol=1e-9)
