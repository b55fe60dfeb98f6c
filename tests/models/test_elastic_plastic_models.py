"""Analytical verification of the elastic-plastic models.

Mirrors the reference ``tests/models/test_elastic_plastic_models.py``:
drive each model through the analytic J2+Voce plastic field history under
full strain control and check the recovered hardening variable and stress
against the closed-form solution.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.models.deformation_types import DefType, def_type_ndims
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic

from tests.support.drivers import run_strain_controlled_history
from tests.support.problems import J2AnalyticalProblem

DIFF_TOL = 1e-6


def _stress_masks(def_type):
    uniaxial = np.zeros((3, 3))
    uniaxial[0, 0] = 1.0
    if def_type == DefType.UNIAXIAL_STRESS:
        return [uniaxial]
    biaxial = np.diag([1.0, -1.0, 0.0])
    return [uniaxial, biaxial]


def _F_history(strain, ndims, num_steps):
    I = np.eye(ndims)
    F = np.repeat(I[:, :, None], num_steps + 1, axis=2)
    F[:, :, 1:] += strain[:ndims, :ndims, :]
    return F


def _run_case(model_cls, def_type, num_steps=50, max_alpha=0.25):
    problem = J2AnalyticalProblem()
    ndims = def_type_ndims(def_type)

    for params, label in [
            (problem.J2_parameters, "J2"),
            (problem.hill_parameters, "hill"),
            (problem.hosford_parameters, "hosford")]:
        model = model_cls(params, def_type=def_type)
        for mask in _stress_masks(def_type):
            stress, strain, alpha = problem.analytical_solution(
                mask, max_alpha, num_steps)
            F = _F_history(strain, ndims, num_steps)
            cauchy, xi_hist = run_strain_controlled_history(model, F)

            alpha_slc = model.layout.slc("alpha")
            model_alpha = np.array(
                [xi_hist[s][alpha_slc][0] for s in range(1, num_steps + 1)])
            assert np.linalg.norm(model_alpha - alpha) < DIFF_TOL, \
                f"{label}: alpha mismatch"

            weight = np.abs(mask) > 0
            err = (cauchy[:, :, 1:] - stress)[weight]
            assert np.max(np.abs(err)) < DIFF_TOL * np.max(np.abs(stress)), \
                f"{label}: stress mismatch"


@pytest.mark.parametrize("def_type", [
    DefType.FULL_3D, DefType.PLANE_STRESS, DefType.UNIAXIAL_STRESS])
def test_small_rate_elastic_plastic(def_type):
    _run_case(SmallRateElasticPlastic, def_type)


@pytest.mark.parametrize("def_type", [
    DefType.FULL_3D, DefType.PLANE_STRESS, DefType.UNIAXIAL_STRESS])
def test_small_elastic_plastic(def_type):
    _run_case(SmallElasticPlastic, def_type)
