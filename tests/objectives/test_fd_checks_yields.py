"""FD + cross-strategy checks for non-J2 yield families.

Deepens the sensitivity matrix (reference pattern:
``tests/objectives/test_J2_fd_checks.py`` x the yield menu): every
(model class x {anisotropic Hill, Hosford a=8}) pairing gets a
gradient FD error-drop check on the traced-JVP objective, plus
adjoint == direct == jvp gradient agreement and a
direct-adjoint == traced Hessian check on representatives.
"""
from __future__ import annotations

import numpy as np
import pytest
from jax.tree_util import tree_map

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.objectives.mp_jvp_objective import MPJVPObjective
from cmad_tpu.objectives.mp_objective import (
    MPAdjointObjective,
    MPDirectAdjointObjective,
    MPDirectObjective,
)
from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.qois.calibration import Calibration

from tests.support.drivers import run_strain_controlled_history

ERROR_DROP_TOL = 5.0
HS = np.logspace(0, -9, 10)

_YIELDS = {
    "hill": {"hill": {"F": 0.45, "G": 0.55, "H": 0.5,
                      "L": 1.4, "M": 1.6, "N": 1.5}},
    "hosford": {"hosford": {"a": 8.0}},
    "hosford_principal": {"hosford_principal": {"a": 8.0}},
}


def _params(yield_name):
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": _YIELDS[yield_name],
            "flow stress": {
                "initial yield": {"Y": 200.0},
                "hardening": {"voce": {"S": 150.0, "D": 15.0}}}}}
    flags = tree_map(lambda _: False, values)
    flags["plastic"]["flow stress"] = tree_map(
        lambda _: True, flags["plastic"]["flow stress"])
    transforms = tree_map(lambda _: None, values)
    fs = transforms["plastic"]["flow stress"]
    fs["initial yield"]["Y"] = [200.0]
    fs["hardening"]["voce"]["S"] = [75.0, 225.0]
    fs["hardening"]["voce"]["D"] = [7.5, 22.5]
    return Parameters(values, flags, transforms)


def _drive(num_steps=16, strain=0.012):
    eps = np.r_[0.0, np.linspace(strain / num_steps, strain, num_steps)]
    F = np.repeat(np.eye(3)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    F[1, 1, :] -= 0.45 * eps
    F[2, 2, :] -= 0.45 * eps
    return F


def _setup(model_cls, yield_name):
    model = model_cls(_params(yield_name), def_type=DefType.FULL_3D)
    F = _drive()
    cauchy, xi_hist = run_strain_controlled_history(model, F)
    alpha_final = float(np.max([np.asarray(x)[6] for x in xi_hist]))
    assert alpha_final > 0.0  # the drive yields
    weight = np.zeros((3, 3))
    weight[0, 0] = weight[1, 1] = 1.0
    qoi = Calibration(model, cauchy, weight)
    true_vals = model.parameters.flat_active_values(False)
    model.parameters.set_active_values_from_flat(1.1 * true_vals, False)
    x0 = model.parameters.flat_active_values(return_canonical=True)
    return model, qoi, F, np.asarray(x0)


def _error_drop(errors):
    errors = np.asarray(errors)
    errors = errors[errors > 0]
    return np.log10(errors.max() / errors.min())


@pytest.mark.parametrize("model_cls", [SmallElasticPlastic,
                                       SmallRateElasticPlastic])
@pytest.mark.parametrize("yield_name", ["hill", "hosford",
                                        "hosford_principal"])
def test_gradient_fd_error_drop(model_cls, yield_name):
    model, qoi, F, x0 = _setup(model_cls, yield_name)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    J0, g = jvp.evaluate_objective_and_grad(x0)
    g = np.asarray(g)
    assert float(J0) > 0.0

    d = np.ones_like(x0) / np.sqrt(x0.size)
    dJ_ad = float(g @ d)
    errors = []
    for h in HS:
        Jp, _ = jvp.evaluate_objective_and_grad(x0 + h * d)
        Jm, _ = jvp.evaluate_objective_and_grad(x0 - h * d)
        dJ_fd = (float(Jp) - float(Jm)) / (2.0 * h)
        errors.append(abs(dJ_fd - dJ_ad))
    assert _error_drop(errors) > ERROR_DROP_TOL


@pytest.mark.parametrize("model_cls,yield_name", [
    (SmallRateElasticPlastic, "hill"),
    (SmallElasticPlastic, "hosford"),
    (SmallRateElasticPlastic, "hosford_principal"),
])
def test_strategies_agree(model_cls, yield_name):
    model, qoi, F, x0 = _setup(model_cls, yield_name)
    r_adj = MPAdjointObjective(qoi, F).evaluate(x0)
    r_dir = MPDirectObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    J_jvp, g_jvp = jvp.evaluate_objective_and_grad(x0)

    assert np.isclose(r_adj.J, r_dir.J, rtol=1e-10)
    assert np.isclose(r_adj.J, float(J_jvp), rtol=1e-8)
    assert np.allclose(r_adj.grad, r_dir.grad, rtol=1e-8)
    assert np.allclose(r_adj.grad, np.asarray(g_jvp), rtol=1e-6,
                       atol=1e-12)


def test_hessians_agree_hill():
    model, qoi, F, x0 = _setup(SmallRateElasticPlastic, "hill")
    r_da = MPDirectAdjointObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    H_jvp = np.asarray(jvp.evaluate_hessian(x0))
    np.testing.assert_allclose(r_da.hessian, H_jvp, rtol=1e-5,
                               atol=1e-10 * np.abs(H_jvp).max())
    # symmetric and (near a minimum basin) finite
    np.testing.assert_allclose(H_jvp, H_jvp.T, rtol=1e-8)


def test_hessians_agree_hosford_principal():
    """Second-order AD through the frame-invariant Hosford: the
    direct-adjoint Hessian (hand-assembled second-order formula over
    the model's jitted Hessian blocks) equals the fully-traced
    jax.hessian of the JVP objective — through the eigenvalue closed
    form and nested custom_jvp solves."""
    model, qoi, F, x0 = _setup(SmallRateElasticPlastic,
                               "hosford_principal")
    r_da = MPDirectAdjointObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    H_jvp = np.asarray(jvp.evaluate_hessian(x0))
    np.testing.assert_allclose(r_da.hessian, H_jvp, rtol=1e-5,
                               atol=1e-10 * np.abs(H_jvp).max())
    np.testing.assert_allclose(H_jvp, H_jvp.T, rtol=1e-8)
