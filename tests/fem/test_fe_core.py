"""FE core: patch test, COUPLED==CLOSED_FORM, plasticity vs analytic,
trajectory gradients vs FD, solver-arm agreement.

Condenses the reference's tests/fem intent (patch/driver/solver/FD
checks) into the cmad_tpu flat-state stack.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.tree_util import tree_map
from scipy.optimize import brentq

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import (
    build_fe_quasistatic_trajectory,
    fe_quasistatic_drive,
)
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters

E, NU, Y, S, D = 200e3, 0.3, 200.0, 200.0, 20.0


def _mesh_and_dofmap(ramp=0.003):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: ramp * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    return mesh, dof_map


def _plastic_params(active=()):
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": E, "nu": NU},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": Y},
                                    "hardening": {"voce": {"S": S,
                                                           "D": D}}}}}
    flags = tree_map(lambda _: False, values)
    fs = flags["plastic"]["flow stress"]
    if "Y" in active:
        fs["initial yield"]["Y"] = True
    if "S" in active:
        fs["hardening"]["voce"]["S"] = True
    return Parameters(values, flags, tree_map(lambda _: None, values))


def test_elastic_patch_uniaxial():
    """Linear patch test: exact uniaxial-stress field to roundoff."""
    mesh, dof_map = _mesh_and_dofmap(ramp=0.01)
    gr = SmallDispEquilibrium(ndims=3)
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model})
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])

    U = state.U_at(1).reshape(-1, 3)
    x = mesh.nodes
    exact = np.stack([0.01 * x[:, 0], -0.3 * 0.01 * x[:, 1],
                      -0.3 * 0.01 * x[:, 2]], axis=1)
    assert np.abs(U - exact).max() < 1e-12


def test_coupled_equals_closed_form_elastic():
    mesh, dof_map = _mesh_and_dofmap(ramp=0.01)
    gr = SmallDispEquilibrium(ndims=3)
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    states = {}
    for mode in (GlobalResidualMode.CLOSED_FORM,
                 GlobalResidualMode.COUPLED):
        fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                              modes_by_block={"all": mode})
        states[mode], _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    diff = np.abs(states[GlobalResidualMode.CLOSED_FORM].U_at(1)
                  - states[GlobalResidualMode.COUPLED].U_at(1)).max()
    assert diff < 1e-14


def _uniaxial_plastic_exact(total_strain):
    def f(a):
        return (Y + S * (1 - np.exp(-D * a))) / E + a - total_strain
    a = brentq(f, 0.0, 0.1)
    return Y + S * (1 - np.exp(-D * a)), a


@pytest.mark.parametrize("tetrahedralize", [False, True])
def test_fe_plasticity_matches_analytic_flow(tetrahedralize):
    """J2+Voce cube pulled to 3x yield strain: every IP's terminal stress
    and hardening variable match the closed-form uniaxial flow."""
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    if tetrahedralize:
        mesh = hex_to_tet_split(mesh)
        bcs = [
            DirichletBC(["xmin_sides"], "u", [0], None),
            DirichletBC(["ymin_sides"], "u", [1], None),
            DirichletBC(["zmin_sides"], "u", [2], None),
            DirichletBC(["xmax_sides"], "u", [0],
                        lambda c, t: 0.003 * t * jnp.ones(
                            (c.shape[0], 1))),
        ]
        from cmad_tpu.fem.elements import P1_TET
        dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", P1_TET)],
                                bcs, {"u": 3})
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": GlobalResidualMode.COUPLED})
    state, _ = fe_quasistatic_drive(fe, list(np.linspace(0.0, 1.0, 6)))

    xi = state.xi_at(5, "all")
    sig_exact, a_exact = _uniaxial_plastic_exact(0.003)
    assert np.abs(xi[..., 0] - sig_exact).max() < 1e-6 * sig_exact
    assert np.abs(xi[..., 6] - a_exact).max() < 1e-8


@pytest.mark.parametrize("solver", [
    {"type": "direct"},
    {"type": "gmres", "rtol": 1e-12},
])
def test_trajectory_gradient_vs_fd(solver):
    """jax.grad through the scanned plastic trajectory (IFT custom_jvp +
    linear-solver AD) matches central finite differences."""
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    params = _plastic_params(active=("Y", "S"))
    model = SmallRateElasticPlastic(params)
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": GlobalResidualMode.COUPLED})
    traj = build_fe_quasistatic_trajectory(fe,
                                           linear_solver_settings=solver)
    st0 = FEState.from_problem(fe)
    state_init = (jnp.zeros(dof_map.num_total_dofs),
                  {"all": jnp.asarray(st0.xi_at(0, "all"))})
    t_sched = jnp.asarray([0.0, 0.5, 1.0])

    def J_of(a):
        pv = params.tree_with_flat_active(a)
        U_steps, _, _ = traj(fe.kernel_arrays, {"all": pv}, state_init,
                             t_sched)
        return jnp.sum(U_steps[-1] ** 2) * 1e4

    a0 = jnp.asarray(params.flat_active_values())
    J, g = jax.jit(jax.value_and_grad(J_of))(a0)
    g = np.asarray(g)

    Jfun = jax.jit(J_of)
    fd = np.zeros_like(g)
    for i in range(len(g)):
        h = 1e-4 * max(abs(float(a0[i])), 1.0)
        fd[i] = (float(Jfun(a0.at[i].add(h)))
                 - float(Jfun(a0.at[i].add(-h)))) / (2 * h)
    # 1e-5 bar: the reference FD itself carries central-difference
    # truncation ~O(h^2) at h = 1e-4 (observed ~2e-6 relative on the
    # smallest gradient component), so a tighter bar just tests the FD
    assert np.linalg.norm(g - fd) / np.linalg.norm(fd) < 1e-5


def test_neumann_traction_elastic():
    """Uniform traction on xmax == prescribed-displacement solution."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    gr = SmallDispEquilibrium(ndims=3)
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    traction = 10.0
    fe = build_fe_problem(
        mesh, dof_map, gr, {"all": model},
        neumann_bcs=[NeumannBC(["xmax_sides"], "u",
                               [traction, 0.0, 0.0])])
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    U = state.U_at(1).reshape(-1, 3)
    # uniaxial stress sigma_xx = 10: eps_xx = 10/E, lateral -nu*eps
    eps = traction / 1000.0
    x = mesh.nodes
    exact = np.stack([eps * x[:, 0], -0.3 * eps * x[:, 1],
                      -0.3 * eps * x[:, 2]], axis=1)
    assert np.abs(U - exact).max() < 1e-12


def test_adaptive_rtol_matches_fixed():
    """Eisenstat-Walker forcing ('adaptive rtol') converges to the same
    solution as fixed-tolerance inner solves."""
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": GlobalResidualMode.COUPLED})
    states = {}
    for adaptive in (False, True):
        lss = {"type": "cg", "rtol": 1e-12, "max iters": 5000,
               "adaptive rtol": adaptive,
               "preconditioner": {"type": "jacobi"}}
        states[adaptive], _ = fe_quasistatic_drive(
            fe, [0.0, 0.5, 1.0], linear_solver_settings=lss)
    for k in (1, 2):
        assert np.allclose(states[True].U_at(k), states[False].U_at(k),
                           atol=1e-9)
