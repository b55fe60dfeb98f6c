"""Multi-block (multi-material) assembly.

Parity: reference ``tests/fem/test_assembly_multi_block.py``. A unit
cube split into two element blocks along x with different Young's
moduli, loaded uniaxially. The exact solution is a series composite:
uniform sigma_xx through both materials, piecewise-linear u_x with
slope inversely proportional to E in each half.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh
from cmad_tpu.fem.postprocess import evaluate_cauchy_at_ips
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters

from tests.fem.test_fe_core import _plastic_params

E_SOFT, E_STIFF, NU = 500.0, 2000.0, 0.0


def _two_block_mesh(n=4):
    base = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
    centroids = base.nodes[base.connectivity].mean(axis=1)
    left = np.where(centroids[:, 0] < 0.5)[0]
    right = np.where(centroids[:, 0] >= 0.5)[0]
    return Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={"soft": left.astype(np.intp),
                        "stiff": right.astype(np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets)


def _problem(mesh, models, modes=None, ramp=0.01):
    gr = SmallDispEquilibrium(ndims=3)
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: ramp * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    return build_fe_problem(mesh, dof_map, gr, models,
                            modes_by_block=modes)


def test_two_block_series_composite_exact():
    """nu = 0 series composite: exact piecewise-linear displacement."""
    mesh = _two_block_mesh()
    models = {
        "soft": Elastic(Parameters({"elastic": {"E": E_SOFT, "nu": NU}})),
        "stiff": Elastic(Parameters({"elastic": {"E": E_STIFF, "nu": NU}})),
    }
    fe = _problem(mesh, models)
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])

    # sigma = E_soft e_soft = E_stiff e_stiff; e_soft/2 + e_stiff/2 = 0.01
    e_soft = 2 * 0.01 * E_STIFF / (E_SOFT + E_STIFF)
    e_stiff = 2 * 0.01 * E_SOFT / (E_SOFT + E_STIFF)
    sigma_exact = E_SOFT * e_soft

    U = state.U_at(1).reshape(-1, 3)
    x = mesh.nodes[:, 0]
    ux_exact = np.where(x < 0.5, e_soft * x,
                        e_soft * 0.5 + e_stiff * (x - 0.5))
    assert np.abs(U[:, 0] - ux_exact).max() < 1e-10

    for block in ("soft", "stiff"):
        sig = evaluate_cauchy_at_ips(fe, state, 1, block)
        sxx = np.asarray(sig)[..., 0]
        assert np.allclose(sxx, sigma_exact, atol=1e-9)


def test_mixed_mode_blocks_closed_form_plus_coupled():
    """One CLOSED_FORM elastic block + one COUPLED plastic block
    assemble and solve together; below yield they match an all-elastic
    two-block solve."""
    mesh = _two_block_mesh()
    elastic_params = {"elastic": {"E": 1000.0, "nu": 0.25}}
    plastic = SmallRateElasticPlastic(_plastic_params())
    models = {"soft": Elastic(Parameters(elastic_params)),
              "stiff": plastic}
    modes = {"soft": GlobalResidualMode.CLOSED_FORM,
             "stiff": GlobalResidualMode.COUPLED}
    fe = _problem(mesh, models, modes, ramp=1e-4)  # below yield
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])

    # reference: same stiffness pair, both elastic closed-form
    # (the plastic model's elastic constants are E=200e3, nu=0.3)
    models_ref = {
        "soft": Elastic(Parameters(elastic_params)),
        "stiff": Elastic(Parameters(
            {"elastic": {"E": 200e3, "nu": 0.3}})),
    }
    fe_ref = _problem(mesh, models_ref, ramp=1e-4)
    state_ref, _ = fe_quasistatic_drive(fe_ref, [0.0, 1.0])

    assert np.allclose(state.U_at(1), state_ref.U_at(1), atol=1e-10)
