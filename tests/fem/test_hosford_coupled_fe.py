"""FE COUPLED assembly with the reduced 4-dof Hosford local solve
matches the generic 7-dof path on a full Newton drive."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.parameters.parameters import Parameters


def _hosford_problem():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (3, 3, 3))
    params = Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford": {"a": 8.0}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 10.0,
                                                   "D": 2.0}}}}})
    model = SmallElasticPlastic(params)
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda coords, t: 0.004 * t * jnp.ones(
                        (coords.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    return build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.COUPLED})


def test_reduced_local_solve_drives_fe_newton(monkeypatch):
    fe_fast = _hosford_problem()
    state_fast, _ = fe_quasistatic_drive(fe_fast, [0.0, 0.5, 1.0])

    # force the generic 7-dof local Newton for the control
    import cmad_tpu.ops.hosford_return as hr
    monkeypatch.setattr(hr, "hosford_kind", lambda model: None)
    fe_gen = _hosford_problem()
    state_gen, _ = fe_quasistatic_drive(fe_gen, [0.0, 0.5, 1.0])

    for step in (1, 2):
        np.testing.assert_allclose(
            np.asarray(state_fast.U_at(step)),
            np.asarray(state_gen.U_at(step)), rtol=1e-9, atol=1e-12)
        xi_f = state_fast.xi_at(step, "all")
        xi_g = state_gen.xi_at(step, "all")
        np.testing.assert_allclose(np.asarray(xi_f), np.asarray(xi_g),
                                   rtol=1e-8, atol=1e-12)
    # plasticity actually happened
    assert float(jnp.max(jnp.asarray(
        state_fast.xi_at(2, "all"))[..., 6])) > 0.0


def test_hill_reduced_local_solve_drives_fe_newton(monkeypatch):
    """Same equivalence for the scalar Hill reduction."""
    import cmad_tpu.ops.hill_return as hill

    def _hill_problem():
        mesh = StructuredHexMesh((1.0, 1.0, 1.0), (3, 3, 3))
        params = Parameters({
            "rotation matrix": np.eye(3),
            "elastic": {"E": 200e3, "nu": 0.3},
            "plastic": {
                "effective stress": {"hill": {
                    "F": 0.45, "G": 0.55, "H": 0.5,
                    "L": 1.4, "M": 1.7, "N": 1.55}},
                "flow stress": {"initial yield": {"Y": 200.0},
                                "hardening": {"voce": {"S": 10.0,
                                                       "D": 2.0}}}}})
        model = SmallElasticPlastic(params)
        bcs = [
            DirichletBC(["xmin_sides"], "u", [0], None),
            DirichletBC(["ymin_sides"], "u", [1], None),
            DirichletBC(["zmin_sides"], "u", [2], None),
            DirichletBC(["xmax_sides"], "u", [0],
                        lambda coords, t: 0.004 * t * jnp.ones(
                            (coords.shape[0], 1))),
        ]
        dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)],
                                bcs, {"u": 3})
        return build_fe_problem(
            mesh, dof_map, SmallDispEquilibrium(ndims=3),
            {"all": model},
            modes_by_block={"all": GlobalResidualMode.COUPLED})

    fe_fast = _hill_problem()
    state_fast, _ = fe_quasistatic_drive(fe_fast, [0.0, 0.5, 1.0])

    monkeypatch.setattr(hill, "hill_kind", lambda model: None)
    fe_gen = _hill_problem()
    state_gen, _ = fe_quasistatic_drive(fe_gen, [0.0, 0.5, 1.0])

    for step in (1, 2):
        np.testing.assert_allclose(
            np.asarray(state_fast.U_at(step)),
            np.asarray(state_gen.U_at(step)), rtol=1e-9, atol=1e-12)
    assert float(jnp.max(jnp.asarray(
        state_fast.xi_at(2, "all"))[..., 6])) > 0.0


def test_principal_reduced_local_solve_drives_fe_newton(monkeypatch):
    """Same equivalence for the trial-eigenbasis principal-Hosford
    reduction, with a material rotation in play (the configuration the
    diagonal reduction cannot take)."""
    import cmad_tpu.ops.principal_return as pr

    R = np.array([[0.36, 0.48, -0.8],
                  [-0.8, 0.6, 0.0],
                  [0.48, 0.64, 0.6]])  # orthogonal (columns unit)

    def _principal_problem():
        mesh = StructuredHexMesh((1.0, 1.0, 1.0), (3, 3, 3))
        params = Parameters({
            "rotation matrix": R,
            "elastic": {"E": 200e3, "nu": 0.3},
            "plastic": {
                "effective stress": {"hosford_principal": {"a": 8.0}},
                "flow stress": {"initial yield": {"Y": 200.0},
                                "hardening": {"voce": {"S": 10.0,
                                                       "D": 2.0}}}}})
        model = SmallElasticPlastic(params)
        bcs = [
            DirichletBC(["xmin_sides"], "u", [0], None),
            DirichletBC(["ymin_sides"], "u", [1], None),
            DirichletBC(["zmin_sides"], "u", [2], None),
            DirichletBC(["xmax_sides"], "u", [0],
                        lambda coords, t: 0.004 * t * jnp.ones(
                            (coords.shape[0], 1))),
        ]
        dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)],
                                bcs, {"u": 3})
        return build_fe_problem(
            mesh, dof_map, SmallDispEquilibrium(ndims=3),
            {"all": model},
            modes_by_block={"all": GlobalResidualMode.COUPLED})

    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    fe_fast = _principal_problem()
    state_fast, _ = fe_quasistatic_drive(fe_fast, [0.0, 0.5, 1.0])

    monkeypatch.setattr(pr, "principal_hosford_kind", lambda model: None)
    fe_gen = _principal_problem()
    state_gen, _ = fe_quasistatic_drive(fe_gen, [0.0, 0.5, 1.0])

    for step in (1, 2):
        np.testing.assert_allclose(
            np.asarray(state_fast.U_at(step)),
            np.asarray(state_gen.U_at(step)), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(state_fast.xi_at(step, "all")),
            np.asarray(state_gen.xi_at(step, "all")),
            rtol=1e-8, atol=1e-11)
    assert float(jnp.max(jnp.asarray(
        state_fast.xi_at(2, "all"))[..., 6])) > 0.0


def test_principal_fe_trajectory_gradient_vs_fd():
    """jax.grad through the scanned trajectory with the PRINCIPAL
    reduction dispatched — the deepest new AD chain (trial Cardano
    eigenvalues -> 4-dof IFT custom_jvp -> degeneracy-safe spectral
    reconstruction -> FE IFT -> scan) — matches central FD. The load
    mixes pull and shear so the stress states are genuinely
    non-diagonal."""
    import jax
    from jax.tree_util import tree_map

    from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
    from cmad_tpu.fem.fe_problem import FEState

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0, 1],
                    lambda c, t: t * jnp.concatenate(
                        [4.0e-3 * jnp.ones((c.shape[0], 1)),
                         2.5e-3 * jnp.ones((c.shape[0], 1))], axis=1)),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford_principal": {"a": 8.0}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 10.0,
                                                   "D": 2.0}}}}}
    flags = tree_map(lambda _: False, values)
    flags["plastic"]["flow stress"]["initial yield"]["Y"] = True
    flags["plastic"]["flow stress"]["hardening"]["voce"]["S"] = True
    params = Parameters(values, flags, tree_map(lambda _: None, values))
    model = SmallElasticPlastic(params)
    from cmad_tpu.ops.principal_return import principal_hosford_kind
    assert principal_hosford_kind(model) == "total"

    fe = build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.COUPLED})
    traj = build_fe_quasistatic_trajectory(
        fe, linear_solver_settings={"type": "direct"})
    st0 = FEState.from_problem(fe)
    state_init = (jnp.zeros(dof_map.num_total_dofs),
                  {"all": jnp.asarray(st0.xi_at(0, "all"))})
    t_sched = jnp.asarray([0.0, 0.5, 1.0])

    def J_of(a):
        pv = params.tree_with_flat_active(a)
        U_steps, xi_steps, _ = traj(fe.kernel_arrays, {"all": pv},
                                    state_init, t_sched)
        return jnp.sum(U_steps[-1] ** 2) * 1e4

    a0 = jnp.asarray(params.flat_active_values())
    J, g = jax.jit(jax.value_and_grad(J_of))(a0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.linalg.norm(g) > 0.0

    Jfun = jax.jit(J_of)
    fd = np.zeros_like(g)
    for i in range(len(g)):
        h = 1e-4 * max(abs(float(a0[i])), 1.0)
        fd[i] = (float(Jfun(a0.at[i].add(h)))
                 - float(Jfun(a0.at[i].add(-h)))) / (2 * h)
    assert np.linalg.norm(g - fd) / np.linalg.norm(fd) < 1e-5
