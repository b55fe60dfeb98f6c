"""Noisy-data J2+Voce calibration with gradient and Hessian diagnostics.

Working counterpart of the reference ``examples/noisy_calibration.py``
(broken as shipped — it imports a nonexistent ``cmad.solver`` package;
see SURVEY.md). Generates a synthetic uniaxial stress history, adds
Gaussian noise, calibrates (Y, S, D) with the adjoint gradient, and
reports the direct-adjoint Hessian at the optimum.

Usage:  python examples/noisy_calibration.py [--noise SIGMA]
"""
from __future__ import annotations

import argparse

import numpy as np
from scipy.optimize import minimize

from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.objectives.mp_objective import (
    MPAdjointObjective,
    MPDirectAdjointObjective,
)
from cmad_tpu.qois.calibration import Calibration


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--noise", type=float, default=1.0,
                        help="stress noise std (default 1.0)")
    parser.add_argument("--steps", type=int, default=40)
    args = parser.parse_args()

    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from support.drivers import run_strain_controlled_history
    from support.problems import J2AnalyticalProblem

    problem = J2AnalyticalProblem()
    mask = np.zeros((3, 3))
    mask[0, 0] = 1.0
    stress, strain, _ = problem.analytical_solution(mask, 0.3, args.steps)
    F = np.repeat(np.eye(3)[:, :, None], args.steps + 1, axis=2)
    F[:, :, 1:] += strain

    model = SmallRateElasticPlastic(problem.J2_parameters)
    cauchy_true, _ = run_strain_controlled_history(model, F)

    rng = np.random.RandomState(0)
    data = cauchy_true + rng.normal(0.0, args.noise, cauchy_true.shape)
    weight = np.abs(mask)
    qoi = Calibration(model, data, weight)

    adjoint = MPAdjointObjective(qoi, F)
    x0 = model.parameters.flat_active_values(return_canonical=True)
    # perturb the start away from truth
    x0 = x0 + rng.normal(0.0, 0.2, x0.shape)

    history = []

    def fun(x):
        r = adjoint.evaluate(x)
        history.append(r.J)
        return r.J, r.grad

    result = minimize(fun, x0, jac=True, method="L-BFGS-B",
                      bounds=[tuple(b)
                              for b in model.parameters.opt_bounds])
    model.parameters.set_active_values_from_flat(result.x)
    fitted = model.parameters.flat_active_values()
    print(f"converged: {result.success} after {result.nit} iterations, "
          f"J* = {result.fun:.4e}")
    print(f"fitted active parameters (ravel order): {fitted}")

    hess_result = MPDirectAdjointObjective(qoi, F).evaluate(result.x)
    eigs = np.linalg.eigvalsh(hess_result.hessian)
    print(f"Hessian eigenvalues at the optimum: {eigs}")
    print(f"parameter uncertainty ~ noise * sqrt(diag(H^-1)): "
          f"{args.noise * np.sqrt(np.diag(np.linalg.inv(hess_result.hessian)))}")


if __name__ == "__main__":
    main()
