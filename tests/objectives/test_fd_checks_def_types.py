"""Gradient FD checks across def_types x model classes.

Extends the plane-stress FD matrix in test_J2_fd_checks.py to FULL_3D
and UNIAXIAL_STRESS: the traced jvp objective's gradient must agree
with central differences at a point away from the data-generating
truth for every (model, def_type) drive the CLI exposes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.objectives.mp_jvp_objective import MPJVPObjective
from cmad_tpu.qois.calibration import Calibration

from tests.support.drivers import run_strain_controlled_history
from tests.support.problems import J2AnalyticalProblem


def _drive(def_type, num_steps=16, strain=0.012):
    d = {DefType.FULL_3D: 3, DefType.PLANE_STRAIN: 2,
         DefType.UNIAXIAL_STRESS: 1}[def_type]
    eps = np.r_[0.0, np.linspace(strain / num_steps, strain, num_steps)]
    F = np.repeat(np.eye(d)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    if def_type in (DefType.FULL_3D, DefType.PLANE_STRAIN):
        # kinematically driven drives: contract laterally so the drive
        # passes through yield without huge hydrostatic stress
        F[1, 1, :] -= 0.45 * eps
        if def_type == DefType.FULL_3D:
            F[2, 2, :] -= 0.45 * eps
    return F


@pytest.mark.parametrize("model_cls", [SmallElasticPlastic,
                                       SmallRateElasticPlastic])
@pytest.mark.parametrize("def_type", [DefType.FULL_3D,
                                      DefType.PLANE_STRAIN,
                                      DefType.UNIAXIAL_STRESS])
def test_gradient_matches_fd(model_cls, def_type):
    problem = J2AnalyticalProblem()
    model = model_cls(problem.J2_parameters, def_type=def_type)
    F = _drive(def_type)
    cauchy, _ = run_strain_controlled_history(model, F)
    weight = np.zeros((3, 3))
    weight[0, 0] = 1.0
    qoi = Calibration(model, cauchy, weight)

    true_vals = model.parameters.flat_active_values(False)
    model.parameters.set_active_values_from_flat(1.1 * true_vals, False)
    x0 = np.asarray(
        model.parameters.flat_active_values(return_canonical=True))

    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    J0, g = jvp.evaluate_objective_and_grad(jnp.asarray(x0))
    g = np.asarray(g)
    assert float(J0) > 0.0
    assert np.all(np.isfinite(g))

    rng = np.random.RandomState(1)
    v = rng.normal(size=x0.shape)
    v /= np.linalg.norm(v)
    h = 1e-6
    Jp = float(jvp.evaluate_objective(jnp.asarray(x0 + h * v)))
    Jm = float(jvp.evaluate_objective(jnp.asarray(x0 - h * v)))
    fd = (Jp - Jm) / (2 * h)
    np.testing.assert_allclose(g @ v, fd, rtol=5e-5,
                               err_msg=f"{model_cls.__name__}/{def_type}")


@pytest.mark.parametrize("model_cls", [SmallElasticPlastic,
                                       SmallRateElasticPlastic])
@pytest.mark.parametrize("def_type", [DefType.FULL_3D,
                                      DefType.PLANE_STRAIN,
                                      DefType.UNIAXIAL_STRESS])
def test_strategies_agree(model_cls, def_type):
    """adjoint == direct == traced-jvp gradients and direct-adjoint ==
    traced Hessian, for every (model class, def_type) drive the CLI
    exposes (the reference pins this only at PLANE_STRESS —
    tests/objectives/test_jvp_vs_original.py)."""
    from cmad_tpu.objectives.mp_objective import (
        MPAdjointObjective,
        MPDirectAdjointObjective,
        MPDirectObjective,
    )

    problem = J2AnalyticalProblem()
    model = model_cls(problem.J2_parameters, def_type=def_type)
    F = _drive(def_type)
    cauchy, _ = run_strain_controlled_history(model, F)
    weight = np.zeros((3, 3))
    weight[0, 0] = 1.0
    qoi = Calibration(model, cauchy, weight)

    true_vals = model.parameters.flat_active_values(False)
    model.parameters.set_active_values_from_flat(1.1 * true_vals, False)
    x0 = np.asarray(
        model.parameters.flat_active_values(return_canonical=True))

    r_adj = MPAdjointObjective(qoi, F).evaluate(x0)
    r_dir = MPDirectObjective(qoi, F).evaluate(x0)
    r_da = MPDirectAdjointObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    J_jvp, g_jvp = jvp.evaluate_objective_and_grad(jnp.asarray(x0))
    H_jvp = np.asarray(jvp.evaluate_hessian(jnp.asarray(x0)))

    tag = f"{model_cls.__name__}/{def_type}"
    assert r_adj.J > 0.0, tag
    np.testing.assert_allclose(r_adj.J, r_dir.J, rtol=1e-10, err_msg=tag)
    np.testing.assert_allclose(r_adj.J, float(J_jvp), rtol=1e-8,
                               err_msg=tag)
    np.testing.assert_allclose(r_adj.grad, r_dir.grad, rtol=1e-8,
                               err_msg=tag)
    np.testing.assert_allclose(r_adj.grad, np.asarray(g_jvp), rtol=1e-6,
                               err_msg=tag)
    np.testing.assert_allclose(r_da.grad, np.asarray(g_jvp), rtol=1e-6,
                               err_msg=tag)
    np.testing.assert_allclose(r_da.hessian, H_jvp, rtol=1e-6, atol=1e-10,
                               err_msg=tag)
