"""Finite-difference verification of every MP sensitivity strategy.

Mirrors reference ``tests/objectives/test_J2_fd_checks.py``: a smooth
plane-stress ramp drive, calibration data generated from the model at the
true parameters, sensitivities evaluated at 1.1x offset parameters, and an
error-drop criterion (FD error must fall > 5 orders of magnitude across
h in logspace(0, -9)) for gradients and Hessians of the adjoint / direct /
direct-adjoint / traced-JVP strategies.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.objectives.mp_objective import (
    MPAdjointObjective,
    MPDirectAdjointObjective,
    MPDirectObjective,
)
from cmad_tpu.objectives.mp_jvp_objective import MPJVPObjective
from cmad_tpu.qois.calibration import Calibration

from tests.support.drivers import run_strain_controlled_history
from tests.support.problems import J2AnalyticalProblem

ERROR_DROP_TOL = 5.0
HS = np.logspace(0, -9, 10)


def _ramp_F(num_per_segment=20):
    """Plane-stress drive: ramp eps_xx to 2%, then eps_yy to 2%."""
    strain_increment = 0.02
    n = num_per_segment
    first = strain_increment / n
    eps_xx = np.r_[0.0, np.linspace(first, strain_increment, n),
                   np.full(n, strain_increment)]
    eps_yy = np.r_[0.0, np.zeros(n),
                   np.linspace(first, strain_increment, n)]
    num_steps = 2 * n
    F = np.repeat(np.eye(2)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps_xx[:num_steps + 1]
    F[1, 1, :] += eps_yy[:num_steps + 1]
    return F


def _setup(model_cls):
    problem = J2AnalyticalProblem()
    model = model_cls(problem.J2_parameters, def_type=DefType.PLANE_STRESS)
    F = _ramp_F()

    cauchy, _ = run_strain_controlled_history(model, F)
    weight = np.zeros((3, 3))
    weight[0, 0] = weight[1, 1] = 1.0
    qoi = Calibration(model, cauchy, weight)

    # evaluate sensitivities away from the data-generating truth
    true_vals = model.parameters.flat_active_values(False)
    model.parameters.set_active_values_from_flat(1.1 * true_vals, False)
    x0 = model.parameters.flat_active_values(return_canonical=True)
    return model, qoi, F, x0


def _error_drop(errors):
    errors = np.asarray(errors)
    errors = errors[errors > 0]
    return np.log10(errors.max() / errors.min())


@pytest.mark.parametrize("model_cls", [
    SmallElasticPlastic, SmallRateElasticPlastic])
def test_gradient_fd_checks(model_cls):
    model, qoi, F, x0 = _setup(model_cls)

    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))

    def J_of_x(x):
        return float(jvp.evaluate_objective(np.asarray(x)))

    grads = {
        "adjoint": MPAdjointObjective(qoi, F).evaluate(x0).grad,
        "direct": MPDirectObjective(qoi, F).evaluate(x0).grad,
        "jvp": np.asarray(jvp.evaluate_objective_and_grad(x0)[1]),
    }
    # strategies agree with each other tightly
    assert np.allclose(grads["adjoint"], grads["direct"], rtol=1e-8)
    assert np.allclose(grads["adjoint"], grads["jvp"], rtol=1e-6)

    rng = np.random.RandomState(22)
    d = rng.uniform(low=-1.0, size=x0.size)

    for name, g in grads.items():
        ref = d @ g
        errs = []
        for h in HS:
            Jp = J_of_x(x0 + h * d)
            Jm = J_of_x(x0 - h * d)
            errs.append(abs((Jp - Jm) / (2.0 * h) - ref))
        assert _error_drop(errs) > ERROR_DROP_TOL, \
            f"{name}: FD error drop too small ({_error_drop(errs):.2f})"


@pytest.mark.parametrize("model_cls", [SmallRateElasticPlastic])
def test_hessian_fd_checks(model_cls):
    model, qoi, F, x0 = _setup(model_cls)

    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))

    def J_of_x(x):
        return float(jvp.evaluate_objective(np.asarray(x)))

    da = MPDirectAdjointObjective(qoi, F).evaluate(x0)
    H_jvp = np.asarray(jvp.evaluate_hessian(x0))
    assert np.allclose(da.hessian, H_jvp, rtol=1e-6, atol=1e-10), \
        "direct-adjoint vs traced Hessian mismatch"

    rng = np.random.RandomState(22)
    d = rng.uniform(low=-1.0, size=x0.size)
    ref = d @ da.hessian @ d
    J0 = J_of_x(x0)

    errs = []
    for h in HS:
        Jp = J_of_x(x0 + h * d)
        Jm = J_of_x(x0 - h * d)
        errs.append(abs((Jp + Jm - 2.0 * J0) / h**2 - ref))
    assert _error_drop(errs) > ERROR_DROP_TOL, \
        f"hessian FD error drop too small ({_error_drop(errs):.2f})"
