"""Cross-strategy agreement: adjoint == direct == traced-JVP gradients,
direct-adjoint Hessian == traced Hessian, on a smooth calibration problem.

Mirrors reference ``tests/objectives/test_jvp_vs_original.py``.
"""
from __future__ import annotations

import numpy as np

from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.objectives.mp_objective import (
    MPAdjointObjective,
    MPDirectAdjointObjective,
    MPDirectObjective,
)
from cmad_tpu.objectives.mp_jvp_objective import MPJVPObjective

from tests.objectives.test_J2_fd_checks import _setup


def test_gradients_agree():
    model, qoi, F, x0 = _setup(SmallRateElasticPlastic)

    r_adj = MPAdjointObjective(qoi, F).evaluate(x0)
    r_dir = MPDirectObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    J_jvp, g_jvp = jvp.evaluate_objective_and_grad(x0)

    assert r_adj.J > 0.0
    assert np.isclose(r_adj.J, r_dir.J, rtol=1e-10)
    assert np.isclose(r_adj.J, float(J_jvp), rtol=1e-8)
    assert np.allclose(r_adj.grad, r_dir.grad, rtol=1e-8)
    assert np.allclose(r_adj.grad, np.asarray(g_jvp), rtol=1e-6)


def test_hessians_agree():
    model, qoi, F, x0 = _setup(SmallRateElasticPlastic)

    r_da = MPDirectAdjointObjective(qoi, F).evaluate(x0)
    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    H_jvp = np.asarray(jvp.evaluate_hessian(x0))

    assert np.allclose(r_da.grad,
                       np.asarray(jvp.evaluate_objective_and_grad(x0)[1]),
                       rtol=1e-6)
    assert np.allclose(r_da.hessian, H_jvp, rtol=1e-6, atol=1e-10)
