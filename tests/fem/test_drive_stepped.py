"""Stepped FE drive: one fused device program per time step.

The stepped driver (`fem/driver.py fe_quasistatic_drive_stepped`)
exists because of a measured environment constraint
(`benchmarks/tunnel_repro/results.json`): a remote-attached TPU worker
kills any SINGLE device execution past a wall-clock ceiling, which
rules out the whole-history scan driver at scale there, while the
host-loop driver pays per-Newton-iteration dispatch latency.  These
tests pin its contract: trajectory agreement with the host driver,
log shape, and the iteration-cap warning surfacing.

Reference driver being re-designed: /root/reference/cmad/fem/driver.py
(host loop only; the reference has no fused-step option).
"""
from __future__ import annotations

import warnings

import numpy as np
import pytest

from cmad_tpu.fem.driver import (
    fe_history_solver_log,
    fe_quasistatic_drive,
    fe_quasistatic_drive_stepped,
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
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    return build_fe_problem(
        mesh, dof_map, gr, {"all": model},
        modes_by_block={"all": GlobalResidualMode.COUPLED})


def test_stepped_matches_host_driver():
    fe = _problem()
    t_schedule = [0.0, 0.5, 1.0]
    state_host, _ = fe_quasistatic_drive(fe, t_schedule)
    state_step, log_step = fe_quasistatic_drive_stepped(fe, t_schedule)

    assert len(log_step) == len(t_schedule) - 1
    for k in range(len(t_schedule)):
        # both sides are independently converged Newton states
        # (rel tol 1e-10) solved by differently-fused programs; see
        # the tolerance discussion in test_drive_restart.py
        assert np.allclose(state_step.U_at(k), state_host.U_at(k),
                           atol=1e-10)
        assert np.allclose(state_step.xi_at(k, "all"),
                           state_host.xi_at(k, "all"), atol=1e-7)
    # the fused step reports the SAME true embedded residual the
    # post-hoc recorded-history verifier recomputes from the state
    log_ver = fe_history_solver_log(fe, state_step, t_schedule)
    for entry, entry_ver in zip(log_step, log_ver):
        assert set(entry) == {"final_residual", "initial_residual"}
        assert entry["final_residual"] <= 1e-8 * max(
            1.0, entry["initial_residual"])
        assert np.isclose(entry["initial_residual"],
                          entry_ver["initial_residual"], rtol=1e-6)
        assert np.isclose(entry["final_residual"],
                          entry_ver["final_residual"],
                          rtol=1e-3, atol=1e-12)


def test_stepped_restart_from_recorded_state():
    fe = _problem()
    full, _ = fe_quasistatic_drive_stepped(fe, [0.0, 0.25, 0.5, 0.75, 1.0])
    tail, _ = fe_quasistatic_drive_stepped(
        fe, [0.5, 0.75, 1.0], U_init=full.U_at(2),
        xi_init_by_block={"all": full.xi_at(2, "all")})
    for k_tail, k_full in ((1, 3), (2, 4)):
        assert np.allclose(tail.U_at(k_tail), full.U_at(k_full),
                           atol=1e-10)
        assert np.allclose(tail.xi_at(k_tail, "all"),
                           full.xi_at(k_full, "all"), atol=1e-7)


def test_stepped_warns_on_iteration_cap():
    fe = _problem()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fe_quasistatic_drive_stepped(
            fe, [0.0, 1.0],
            nonlinear_solver_settings={"max iters": 1,
                                       "abs tol": 1e-14,
                                       "rel tol": 1e-14})
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("iteration-cap" in m for m in msgs)


def test_stepped_rejects_short_schedule():
    fe = _problem()
    with pytest.raises(ValueError, match="t_schedule"):
        fe_quasistatic_drive_stepped(fe, [0.0])


def test_chunked_dispatch_matches_unchunked():
    """K-capped chunked re-dispatch (max_iters_per_dispatch) converges
    to the same trajectory as the one-dispatch-per-step form — the
    chunk resume (iterate from U_start, history at (U_prev, xi_prev))
    preserves Newton's fixed point at any K."""
    fe = _problem()
    t_schedule = [0.0, 0.5, 1.0]
    state_ref, log_ref = fe_quasistatic_drive_stepped(fe, t_schedule)
    for K in (1, 3):
        state_k, log_k = fe_quasistatic_drive_stepped(
            fe, t_schedule, max_iters_per_dispatch=K)
        for step in range(len(t_schedule)):
            assert np.allclose(state_k.U_at(step), state_ref.U_at(step),
                               atol=1e-10)
            assert np.allclose(state_k.xi_at(step, "all"),
                               state_ref.xi_at(step, "all"), atol=1e-7)
        for e_k, e_ref in zip(log_k, log_ref):
            assert e_k["final_residual"] <= 1e-8 * max(
                1.0, e_k["initial_residual"])
            assert np.isclose(e_k["initial_residual"],
                              e_ref["initial_residual"], rtol=1e-6)


def test_windowed_dispatch_matches_stepped():
    """W-step windows (steps_per_dispatch) reproduce the per-step
    trajectory and log exactly: the window is a lax.scan of the SAME
    fused step program, so only the dispatch granularity changes.
    Covers W=1 (degenerate), W=2 (full window + remainder window of 1),
    and W >= n_steps (one program, scan over the whole schedule)."""
    fe = _problem()
    t_schedule = [0.0, 0.25, 0.5, 0.75, 1.0]
    state_ref, log_ref = fe_quasistatic_drive_stepped(fe, t_schedule)
    for W in (1, 2, 7):
        state_w, log_w = fe_quasistatic_drive_stepped(
            fe, t_schedule, steps_per_dispatch=W)
        assert len(log_w) == len(t_schedule) - 1
        for step in range(len(t_schedule)):
            assert np.allclose(state_w.U_at(step), state_ref.U_at(step),
                               atol=1e-10)
            assert np.allclose(state_w.xi_at(step, "all"),
                               state_ref.xi_at(step, "all"), atol=1e-7)
        for e_w, e_ref in zip(log_w, log_ref):
            assert e_w["final_residual"] <= 1e-8 * max(
                1.0, e_w["initial_residual"])
            assert np.isclose(e_w["initial_residual"],
                              e_ref["initial_residual"], rtol=1e-6)


def test_windowed_restart_from_recorded_state():
    fe = _problem()
    full, _ = fe_quasistatic_drive_stepped(
        fe, [0.0, 0.25, 0.5, 0.75, 1.0], steps_per_dispatch=2)
    tail, _ = fe_quasistatic_drive_stepped(
        fe, [0.5, 0.75, 1.0], steps_per_dispatch=2,
        U_init=full.U_at(2),
        xi_init_by_block={"all": full.xi_at(2, "all")})
    for k_tail, k_full in ((1, 3), (2, 4)):
        assert np.allclose(tail.U_at(k_tail), full.U_at(k_full),
                           atol=1e-10)
        assert np.allclose(tail.xi_at(k_tail, "all"),
                           full.xi_at(k_full, "all"), atol=1e-7)


def test_windowed_rejects_iter_cap_combination():
    fe = _problem()
    with pytest.raises(ValueError, match="mutually exclusive"):
        fe_quasistatic_drive_stepped(
            fe, [0.0, 1.0], steps_per_dispatch=2,
            max_iters_per_dispatch=3)
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        fe_quasistatic_drive_stepped(
            fe, [0.0, 1.0], steps_per_dispatch=0)


def test_windowed_warns_on_iteration_cap():
    fe = _problem()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fe_quasistatic_drive_stepped(
            fe, [0.0, 0.5, 1.0], steps_per_dispatch=2,
            nonlinear_solver_settings={"max iters": 1,
                                       "abs tol": 1e-14,
                                       "rel tol": 1e-14})
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("iteration-cap" in m for m in msgs)
