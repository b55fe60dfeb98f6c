"""End-to-end element-sharded FE Newton + trajectory vs single device.

SURVEY.md §2.2 row 1 closed out: the full multi-step plastic solve —
sharded assembly, row-sharded CG, Newton while_loop, scanned time loop —
runs under one jit on the 8-virtual-CPU mesh and matches the
single-device driver to solver tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.assembly import params_by_block_from_models
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.fe_problem import FEState
from cmad_tpu.parallel.mesh import element_mesh
from cmad_tpu.parallel.newton import (
    build_sharded_fe_newton,
    sharded_fe_quasistatic_trajectory,
)

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


def _problem():
    mesh_fe, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    fe = build_fe_problem(mesh_fe, dof_map, gr, {"all": model},
                          modes_by_block={
                              "all": GlobalResidualMode.COUPLED})
    return fe


def test_sharded_newton_single_step_matches_single_device():
    assert len(jax.devices()) >= 8
    fe = _problem()
    params = params_by_block_from_models(fe)
    dev_mesh = element_mesh(8)

    newton_step, arrays = build_sharded_fe_newton(
        fe, dev_mesh, preconditioner="two_level", rtol=1e-12)
    st = FEState.from_problem(fe)
    n = fe.dof_map.num_total_dofs
    from cmad_tpu.parallel.fe import shard_xi_by_block

    xi0 = shard_xi_by_block({"all": jnp.asarray(st.xi_at(0, "all"))},
                            dev_mesh)
    pv = jnp.asarray(fe.dof_map.evaluate_prescribed_values(
        fe.kernel_arrays.dbc_arrays, 1.0))
    U, xi = jax.jit(newton_step)(arrays, params, jnp.zeros(n), xi0, 1.0,
                                 pv)

    # single-device reference
    from cmad_tpu.fem.nonlinear_solver import fe_newton_solve

    U_ref, xi_ref = fe_newton_solve(
        fe, params, jnp.zeros(n),
        {"all": jnp.asarray(st.xi_at(0, "all"))}, t=1.0,
        linear_solver_settings={"type": "direct"})
    assert np.allclose(np.asarray(U), np.asarray(U_ref), atol=1e-9)
    assert np.allclose(np.asarray(xi["all"]), np.asarray(xi_ref["all"]),
                       atol=1e-6)


def test_sharded_trajectory_matches_single_device():
    assert len(jax.devices()) >= 8
    fe = _problem()
    params = params_by_block_from_models(fe)
    dev_mesh = element_mesh(8)
    ts = [0.0, 0.5, 1.0]

    st = FEState.from_problem(fe)
    n = fe.dof_map.num_total_dofs
    U_steps, xi_steps = sharded_fe_quasistatic_trajectory(
        fe, dev_mesh, params, jnp.zeros(n),
        {"all": jnp.asarray(st.xi_at(0, "all"))}, ts,
        preconditioner="two_level", rtol=1e-12)

    state, _ = fe_quasistatic_drive(
        fe, ts, linear_solver_settings={"type": "direct"})
    for k in range(1, len(ts)):
        assert np.allclose(np.asarray(U_steps[k - 1]), state.U_at(k),
                           atol=1e-9), f"step {k} U mismatch"
        assert np.allclose(np.asarray(xi_steps["all"][k - 1]),
                           state.xi_at(k, "all"), atol=1e-6), \
            f"step {k} xi mismatch"
