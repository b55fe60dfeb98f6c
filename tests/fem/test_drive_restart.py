"""Trajectory restartability + drive/direct-solve equivalence.

Mirrors reference ``tests/fem/test_fe_quasistatic_drive.py``: the scan
driver matches a sequence of direct fe_newton_solve calls, and the time
loop restarts exactly from recorded (U, xi) state.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.assembly import params_by_block_from_models
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.nonlinear_solver import fe_newton_solve

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
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": GlobalResidualMode.COUPLED})
    return fe


def test_drive_equals_direct_solves():
    fe = _problem()
    t_schedule = [0.0, 0.5, 1.0]
    state, _ = fe_quasistatic_drive(fe, t_schedule)

    params = params_by_block_from_models(fe)
    U = jnp.zeros(fe.dof_map.num_total_dofs)
    xi = {"all": jnp.asarray(state.xi_at(0, "all"))}
    for k, t in enumerate(t_schedule[1:], start=1):
        U, xi_solved = fe_newton_solve(fe, params, U, xi, t=t)
        xi = {**xi, **xi_solved}
        assert np.allclose(np.asarray(U), state.U_at(k), atol=1e-12)
        # xi tolerance: both sides are independently converged Newton
        # states (rel tol 1e-10), so their local states can differ by
        # ~rel_tol x the O(1e2) stress scale (2e-8) plus fusion noise —
        # the scan-jitted drive and per-step jits compile the fem/
        # j2_block.py block kernels into different fusions (measured
        # ~1.3e-9 absolute).
        assert np.allclose(np.asarray(xi["all"]),
                           state.xi_at(k, "all"), atol=1e-8)


def test_restart_from_recorded_state():
    fe = _problem()
    full, _ = fe_quasistatic_drive(fe, [0.0, 0.25, 0.5, 0.75, 1.0])

    # restart at t=0.5 from the recorded state
    restart, _ = fe_quasistatic_drive(
        fe, [0.5, 0.75, 1.0], U_init=full.U_at(2))
    # overwrite the tiled init xi with the recorded one and rerun the
    # tail via direct solves for an exact comparison
    params = params_by_block_from_models(fe)
    U = jnp.asarray(full.U_at(2))
    xi = {"all": jnp.asarray(full.xi_at(2, "all"))}
    for k, t in ((3, 0.75), (4, 1.0)):
        U, xi_solved = fe_newton_solve(fe, params, U, xi, t=t)
        xi = {**xi, **xi_solved}
        assert np.allclose(np.asarray(U), full.U_at(k), atol=1e-11)
        # independently converged states; see the tolerance comment in
        # test_drive_equals_direct_solves (measured ~2.8e-8 absolute
        # near the elastic/plastic switch)
        assert np.allclose(np.asarray(xi["all"]),
                           full.xi_at(k, "all"), atol=1e-7)


def test_host_drive_matches_scan_drive():
    """The host-driven per-iteration time loop reproduces the jitted
    scan driver (its role: environments where one long device program
    is fragile, plus imperative per-step solver logging)."""
    from cmad_tpu.fem.nonlinear_solver import fe_quasistatic_drive_host

    fe = _problem()
    t_schedule = [0.0, 0.5, 1.0]
    scan_state, _ = fe_quasistatic_drive(fe, t_schedule)
    host_state, log = fe_quasistatic_drive_host(fe, t_schedule)

    assert len(log) == 2
    assert all(e["iters"] > 0 for e in log)
    for k in (1, 2):
        assert np.allclose(host_state.U_at(k), scan_state.U_at(k),
                           atol=1e-9)
        # the drivers take different iteration/line-search paths, so
        # agreement is to solver tolerance relative to the stress
        # scale (~2e2), not to fixed machine-noise absolutes
        assert np.allclose(host_state.xi_at(k, "all"),
                           scan_state.xi_at(k, "all"),
                           rtol=1e-9, atol=1e-7)
