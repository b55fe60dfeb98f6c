"""FD grid for FE sensitivities: grad AND hessian vs central finite
differences across {CLOSED_FORM single-step, COUPLED multi-step} x
{terminal QoI, all-paths QoI}.

Mirrors the reference ``tests/fem/test_fem_fd_checks.py`` class grid
(ClosedFormSingleStep / CoupledMultiStepSimple /
CoupledMultiStepAllPaths with grad+hessian each). The all-paths QoI
couples every trajectory input the step hook exposes — ``U_n``,
``U_{n-1}``, ``xi_n``, ``xi_{n-1}``, ``t`` — so its derivative flows
through both the IFT rule of the global Newton solve AND the scan
carry, including the cross-step xi dependency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.tree_util import tree_map

from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters

from .test_fe_core import _mesh_and_dofmap, _plastic_params


def _elastic_params():
    values = {"elastic": {"E": 200e3, "nu": 0.3}}
    flags = {"elastic": {"E": True, "nu": True}}
    return Parameters(values, flags, tree_map(lambda _: None, values))


def _build(mode, model, params):
    mesh, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={"all": mode})
    traj = build_fe_quasistatic_trajectory(fe)
    st0 = FEState.from_problem(fe)
    state_init = (jnp.zeros(dof_map.num_total_dofs),
                  {"all": jnp.asarray(st0.xi_at(0, "all"))})
    return fe, traj, state_init, params


def _J_terminal(fe, traj, state_init, params, t_sched):
    def J_of(a):
        pv = params.tree_with_flat_active(a)
        U_steps, _, _ = traj(fe.kernel_arrays, {"all": pv}, state_init,
                             t_sched)
        return jnp.sum(U_steps[-1] ** 2) * 1e4
    return J_of


def _J_all_paths(fe, traj, state_init, params, t_sched):
    """Per-step contribution touching U, U_prev, xi, xi_prev and t."""
    def contribution(U, U_prev, xi, xi_prev, t, t_prev):
        x, xp = xi["all"], xi_prev["all"]
        return (jnp.sum((U - U_prev) ** 2) * 1e4 * (t - t_prev)
                + jnp.sum(U * U) * 1e3 * t
                + jnp.mean((x[..., 6] - xp[..., 6]) ** 2) * 1e6
                + jnp.mean(x[..., 0] ** 2) * 1e-3)

    def J_of(a):
        pv = params.tree_with_flat_active(a)
        _, _, J = traj(fe.kernel_arrays, {"all": pv}, state_init,
                       t_sched, qoi_step_contribution=contribution)
        return J
    return J_of


def _fd_grad(Jfun, a0, rel_h=1e-4):
    g = np.zeros(a0.shape[0])
    for i in range(a0.shape[0]):
        h = rel_h * max(abs(float(a0[i])), 1.0)
        g[i] = (float(Jfun(a0.at[i].add(h)))
                - float(Jfun(a0.at[i].add(-h)))) / (2 * h)
    return g


def _fd_hessian(gfun, a0, rel_h=1e-4):
    """Central differences of the ANALYTIC gradient (itself FD-verified
    in test_grad_matches_fd): second differences of J at these QoI
    magnitudes (H entries ~1e-9) sit below f64 cancellation."""
    n = a0.shape[0]
    H = np.zeros((n, n))
    for i in range(n):
        h = rel_h * max(abs(float(a0[i])), 1.0)
        gp = np.asarray(gfun(a0.at[i].add(h)))
        gm = np.asarray(gfun(a0.at[i].add(-h)))
        H[:, i] = (gp - gm) / (2 * h)
    return 0.5 * (H + H.T)


CASES = {
    "closed_form-single-terminal": (
        GlobalResidualMode.CLOSED_FORM, "elastic", [0.0, 1.0],
        _J_terminal),
    "coupled-multi-terminal": (
        GlobalResidualMode.COUPLED, "plastic", [0.0, 0.5, 1.0],
        _J_terminal),
    "coupled-multi-all_paths": (
        GlobalResidualMode.COUPLED, "plastic", [0.0, 0.5, 1.0],
        _J_all_paths),
}


@pytest.fixture(scope="module", params=list(CASES))
def case(request):
    mode, mat, ts, J_builder = CASES[request.param]
    if mat == "elastic":
        params = _elastic_params()
        model = Elastic(params)
    else:
        params = _plastic_params(active=("Y", "S"))
        model = SmallRateElasticPlastic(params)
    fe, traj, state_init, params = _build(mode, model, params)
    J_of = J_builder(fe, traj, state_init, params, jnp.asarray(ts))
    a0 = jnp.asarray(params.flat_active_values())
    return request.param, jax.jit(J_of), a0


def test_grad_matches_fd(case):
    name, Jfun, a0 = case
    g = np.asarray(jax.jit(jax.grad(Jfun))(a0))
    fd = _fd_grad(Jfun, a0)
    err = np.linalg.norm(g - fd) / max(np.linalg.norm(fd), 1e-30)
    assert err < 1e-5, f"{name}: grad rel err {err:.2e} ({g} vs {fd})"


def test_hessian_matches_fd(case):
    name, Jfun, a0 = case
    H = np.asarray(jax.jit(jax.hessian(Jfun))(a0))
    assert np.abs(H - H.T).max() <= 1e-8 * max(np.abs(H).max(), 1e-30)
    gfun = jax.jit(jax.grad(Jfun))
    fd = _fd_hessian(gfun, a0)
    err = np.abs(H - fd).max() / max(np.abs(fd).max(), 1e-30)
    assert err < 1e-5, f"{name}: hessian rel err {err:.2e}\n{H}\n{fd}"
