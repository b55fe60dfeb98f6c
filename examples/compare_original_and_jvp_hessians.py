"""Compare the direct-adjoint Hessian against the fully-traced Hessian.

Working counterpart of the reference
``examples/compare_original_and_jvp_hessians.py`` (broken as shipped; see
SURVEY.md): evaluates the calibration-objective Hessian with the
direct-adjoint einsum strategy (arXiv:2501.04584) and with
``jax.hessian`` of the traced objective, timing both.

Usage:  python examples/compare_original_and_jvp_hessians.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.objectives.mp_jvp_objective import MPJVPObjective
from cmad_tpu.objectives.mp_objective import MPDirectAdjointObjective
from cmad_tpu.qois.calibration import Calibration


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from support.drivers import run_strain_controlled_history
    from support.problems import J2AnalyticalProblem

    problem = J2AnalyticalProblem()
    mask = np.zeros((3, 3))
    mask[0, 0] = 1.0
    num_steps = 30
    stress, strain, _ = problem.analytical_solution(mask, 0.2, num_steps)
    F = np.repeat(np.eye(3)[:, :, None], num_steps + 1, axis=2)
    F[:, :, 1:] += strain

    model = SmallRateElasticPlastic(problem.J2_parameters)
    cauchy_true, _ = run_strain_controlled_history(model, F)
    data = cauchy_true * 1.05
    qoi = Calibration(model, data, np.abs(mask))

    # Evaluate away from the exact truth parameters: the drive was
    # constructed FROM the yield condition, so at the truth one step
    # sits exactly on the elastic/plastic branch boundary, where the
    # objective's second derivative is genuinely one-sided and the two
    # strategies return different generalized Hessians (both valid).
    # A 2% canonical shift -- where any real calibration iterate lives --
    # restores 1e-12 agreement.
    x = model.parameters.flat_active_values(return_canonical=True) + 0.02

    t0 = time.perf_counter()
    da = MPDirectAdjointObjective(qoi, F).evaluate(x)
    t_da = time.perf_counter() - t0

    jvp = MPJVPObjective(qoi, F, make_newton_solve(model.residual_fun))
    H_traced = np.asarray(jvp.evaluate_hessian(x))  # includes compile
    t0 = time.perf_counter()
    H_traced = np.asarray(jvp.evaluate_hessian(x))
    t_jvp = time.perf_counter() - t0

    diff = np.abs(da.hessian - H_traced).max() / np.abs(H_traced).max()
    print(f"direct-adjoint Hessian ({t_da:.2f}s):\n{da.hessian}")
    print(f"traced Hessian (warm, {t_jvp:.3f}s):\n{H_traced}")
    print(f"max relative difference: {diff:.2e}")
    assert diff < 1e-8


if __name__ == "__main__":
    main()
