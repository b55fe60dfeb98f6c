"""Element-sharded FE OBJECTIVE GRADIENTS match single-device.

Round 4 covered sharded primal assembly/Newton/trajectory and the MP
calibration gradient; this file closes the sensitivity side of
SURVEY.md section 2.2 row 1: the same FE value_and_grad the
calibration loop consumes — the fused-scan trajectory gradient AND the
stepped adjoint — computed with every per-element carrier sharded over
the 8 virtual CPU devices, must reproduce the single-device gradient.
XLA SPMD partitions the assembly, the IFT tangent solves, and the CG
iterations; no user-code collectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
from cmad_tpu.fem.fe_problem import FEState
from cmad_tpu.parallel.fe import shard_fe_arrays, shard_xi_by_block
from cmad_tpu.parallel.mesh import element_mesh
from cmad_tpu.qois.fe_displacement_l2 import FEDisplacementL2

from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from tests.fem.test_fe_core import (
    GlobalResidualMode,
    SmallRateElasticPlastic,
    _mesh_and_dofmap,
    _plastic_params,
    build_fe_problem,
)

_LSS = {"type": "cg", "rtol": 1e-12, "max iters": 500,
        "preconditioner": {"type": "jacobi"}}
_TS = [0.0, 0.5, 1.0]


def _problem():
    mesh_fe, dof_map = _mesh_and_dofmap(ramp=0.003)
    model = SmallRateElasticPlastic(_plastic_params(active=("Y", "S")))
    fe = build_fe_problem(
        mesh_fe, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.COUPLED})
    st = FEState.from_problem(fe)
    n = fe.dof_map.num_total_dofs
    state_init = (jnp.zeros(n), {"all": jnp.asarray(st.xi_at(0, "all"))})
    for t in _TS[1:]:
        fe.dof_map.evaluate_prescribed_values(
            fe.kernel_arrays.dbc_arrays, float(t))
    return fe, state_init


def _overlay(fe):
    from cmad_tpu.cli.fe_common import fe_params_overlay

    return fe_params_overlay(fe)


def test_sharded_scan_gradient_matches_single_device():
    assert len(jax.devices()) >= 8
    fe, state_init = _problem()
    params_flat, overlay = _overlay(fe)
    qoi = FEDisplacementL2(fe, _TS)
    t_jax = jnp.asarray(_TS)
    trajectory = build_fe_quasistatic_trajectory(
        fe, linear_solver_settings=_LSS)

    def J_of(flat, state_init, arrays):
        pbb = overlay(flat)
        step = qoi.step_contribution(pbb, arrays)
        _, _, J = trajectory(arrays, pbb, state_init, t_jax,
                             qoi_step_contribution=step)
        return J

    vg = jax.jit(jax.value_and_grad(J_of))
    J_1, g_1 = vg(params_flat, state_init, fe.kernel_arrays)

    dev_mesh = element_mesh(8)
    arrays_sh = shard_fe_arrays(fe, dev_mesh)
    xi_sh = shard_xi_by_block(state_init[1], dev_mesh)
    J_8, g_8 = vg(params_flat, (state_init[0], xi_sh), arrays_sh)

    assert float(np.linalg.norm(np.asarray(g_1))) > 0.0
    assert np.isclose(float(J_8), float(J_1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_8), np.asarray(g_1),
                               rtol=1e-8)


def test_sharded_stepped_gradient_matches_single_device():
    """The stepped adjoint's per-step forward/reverse programs under
    element sharding: value and gradient match the single-device
    stepped adjoint (and hence, by test_stepped_adjoint.py, the fused
    scan)."""
    assert len(jax.devices()) >= 8
    from cmad_tpu.fem.stepped_adjoint import (
        build_fe_stepped_value_and_grad,
    )

    fe, state_init = _problem()
    params_flat, overlay = _overlay(fe)
    qoi = FEDisplacementL2(fe, _TS)

    vg = build_fe_stepped_value_and_grad(
        fe, overlay, qoi, linear_solver_settings=_LSS)
    J_1, g_1 = vg(params_flat, state_init, _TS)

    dev_mesh = element_mesh(8)
    arrays_sh = shard_fe_arrays(fe, dev_mesh)
    xi_sh = shard_xi_by_block(state_init[1], dev_mesh)
    vg_sh = build_fe_stepped_value_and_grad(
        fe, overlay, qoi, linear_solver_settings=_LSS,
        fe_arrays=arrays_sh)
    J_8, g_8 = vg_sh(params_flat, (state_init[0], xi_sh), _TS)

    assert float(np.linalg.norm(g_1)) > 0.0
    assert np.isclose(J_8, J_1, rtol=1e-10)
    np.testing.assert_allclose(g_8, g_1, rtol=1e-8)
