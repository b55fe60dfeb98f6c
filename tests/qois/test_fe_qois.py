"""FE QoI values vs hand integration + MP QoI derivative contract.

Mirrors the reference's ``tests/qois`` intent: FE displacement-L2 vs
hand-computed integrals, composite weighted sums, and the MP QoI ABC's
jitted-derivative surface checked against finite differences.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.qois.calibration import Calibration
from cmad_tpu.qois.fe_displacement_l2 import FEDisplacementL2
from cmad_tpu.qois.fe_weighted_sum import FEWeightedSum

from tests.support.problems import params_J2_voce


def _unit_cube_problem(divisions=(2, 2, 2)):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), divisions)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    gr = SmallDispEquilibrium(ndims=3)
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    return build_fe_problem(mesh, dof_map, gr, {"all": model})


def _nodal_field(mesh, fn):
    """U_global for u(x) = fn(x) with the formulaic interleaved eq map."""
    vals = np.asarray([fn(x) for x in np.asarray(mesh.nodes)])
    return jnp.asarray(vals.reshape(-1))


def test_fe_displacement_l2_linear_field_exact():
    """u = (x, 0, 0) on the unit cube: J = int x^2 dV / (T |Omega|) = 1/3
    exactly (Q1 interpolates x; 2-pt Gauss integrates x^2 exactly)."""
    fe = _unit_cube_problem()
    qoi = FEDisplacementL2(fe, [0.0, 1.0])
    closure = qoi.step_contribution({}, fe.kernel_arrays)

    U = _nodal_field(fe.mesh, lambda x: [x[0], 0.0, 0.0])
    J = closure(U, U, None, None, 1.0, 0.0)
    np.testing.assert_allclose(float(J), 1.0 / 3.0, rtol=1e-13)


def test_fe_displacement_l2_constant_field_and_time_norm():
    """u = (c, c, c): J_step = dt * 3 c^2 / T; two equal steps sum to
    3 c^2."""
    fe = _unit_cube_problem(divisions=(1, 1, 1))
    t_schedule = [0.0, 0.5, 1.0]
    qoi = FEDisplacementL2(fe, t_schedule)
    closure = qoi.step_contribution({}, fe.kernel_arrays)

    c = 0.25
    U = _nodal_field(fe.mesh, lambda x: [c, c, c])
    J = sum(float(closure(U, U, None, None, t, tp))
            for t, tp in zip(t_schedule[1:], t_schedule[:-1]))
    np.testing.assert_allclose(J, 3 * c * c, rtol=1e-13)


def test_fe_weighted_sum_composes():
    fe = _unit_cube_problem(divisions=(1, 1, 1))
    q1 = FEDisplacementL2(fe, [0.0, 1.0])
    q2 = FEDisplacementL2(fe, [0.0, 1.0])
    ws = FEWeightedSum([(2.0, q1), (-0.5, q2)])
    c_ws = ws.step_contribution({}, fe.kernel_arrays)
    c_1 = q1.step_contribution({}, fe.kernel_arrays)

    U = _nodal_field(fe.mesh, lambda x: [x[0], x[1], 0.0])
    J_ws = float(c_ws(U, U, None, None, 1.0, 0.0))
    J_1 = float(c_1(U, U, None, None, 1.0, 0.0))
    np.testing.assert_allclose(J_ws, 1.5 * J_1, rtol=1e-13)


def test_fe_weighted_sum_requires_terms():
    with pytest.raises(ValueError, match="at least one term"):
        FEWeightedSum([])


# ----------------------------------------------------------------------
# MP QoI ABC: value + jitted derivatives vs finite differences
# ----------------------------------------------------------------------
def _mp_qoi_inputs():
    J2_params, _, _ = params_J2_voce(
        np.array([200e3, 0.3, 200.0, 200.0, 20.0]), scale_params=False)
    model = SmallRateElasticPlastic(J2_params)
    rng = np.random.RandomState(11)
    num_steps = 3
    data = rng.normal(100.0, 10.0, size=(3, 3, num_steps + 1))
    weight = np.ones((3, 3))
    qoi = Calibration(model, data, weight)

    F = np.eye(3) + 1e-3 * rng.normal(size=(3, 3))
    U = mp_U_from_F(jnp.asarray(F))
    U_prev = mp_U_from_F(jnp.eye(3))
    xi = jnp.asarray(rng.normal(scale=10.0, size=model.num_dofs))
    xi_prev = jnp.zeros(model.num_dofs)
    return model, qoi, xi, xi_prev, U, U_prev


def test_calibration_value_matches_hand_formula():
    model, qoi, xi, xi_prev, U, U_prev = _mp_qoi_inputs()
    params = model.parameters.values
    step = 2
    data, weight = qoi.data_at_step(step), qoi.weight_at_step(step)
    J = float(qoi.J(xi, xi_prev, params, U, U_prev, data, weight))

    sigma = np.asarray(model.cauchy_fun(xi, xi_prev, params, U, U_prev))
    expected = 0.5 * np.sum((weight * (sigma - data)) ** 2)
    np.testing.assert_allclose(J, expected, rtol=1e-12)


def test_calibration_dJ_dxi_matches_fd():
    model, qoi, xi, xi_prev, U, U_prev = _mp_qoi_inputs()
    params = model.parameters.values
    data, weight = qoi.data_at_step(1), qoi.weight_at_step(1)

    g = np.asarray(qoi.dJ_dxi(xi, xi_prev, params, U, U_prev, data,
                              weight))
    assert g.shape == (model.num_dofs,)

    h = 1e-6
    rng = np.random.RandomState(2)
    v = rng.normal(size=model.num_dofs)
    Jp = float(qoi.J(xi + h * v, xi_prev, params, U, U_prev, data, weight))
    Jm = float(qoi.J(xi - h * v, xi_prev, params, U, U_prev, data, weight))
    np.testing.assert_allclose(g @ v, (Jp - Jm) / (2 * h), rtol=1e-6)


def test_calibration_param_grad_and_hessians():
    model, qoi, xi, xi_prev, U, U_prev = _mp_qoi_inputs()
    data, weight = qoi.data_at_step(1), qoi.weight_at_step(1)
    p_flat = model.flat_params()

    gp = np.asarray(qoi.dJ_dparams_flat(xi, xi_prev, p_flat, U, U_prev,
                                        data, weight))
    assert gp.shape == p_flat.shape
    # the calibration QoI reads params only through cauchy(xi,...) which
    # for the rate model's stress slot is xi itself => stress-free params
    # like hardening don't enter J directly
    H = np.asarray(qoi.hess_xi_xi(xi, xi_prev, model.parameters.values,
                                  U, U_prev, data, weight))
    assert H.shape == (model.num_dofs, model.num_dofs)
    np.testing.assert_allclose(H, H.T, atol=1e-12)

    Hxp = np.asarray(qoi.hess_xi_params_flat(xi, xi_prev, p_flat, U,
                                             U_prev, data, weight))
    assert Hxp.shape == (model.num_dofs, p_flat.shape[0])


def test_calibration_active_param_grad_selection():
    model, qoi, xi, xi_prev, U, U_prev = _mp_qoi_inputs()
    data, weight = qoi.data_at_step(1), qoi.weight_at_step(1)
    g_active = np.asarray(qoi.dJ_dparams_active(xi, xi_prev, U, U_prev,
                                                data, weight))
    n_active = len(model.parameters.active_idx)
    assert g_active.shape == (n_active,)
