"""UniaxialCalibration QoI units: hand-formula value, per-row
weights, and data updates (reference: ``cmad/qois/
uniaxial_calibration.py``)."""
from __future__ import annotations

import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.qois.uniaxial_calibration import UniaxialCalibration

from tests.support.problems import J2AnalyticalProblem


def _model():
    problem = J2AnalyticalProblem()
    return SmallRateElasticPlastic(problem.J2_parameters,
                                   def_type=DefType.UNIAXIAL_STRESS)


def _eval_at(qoi, model, xi, data_col, weight_col, step=1):
    F = np.ones((1, 1))
    U = mp_U_from_F(F)
    return float(qoi.qoi_fun(
        xi, xi, model.parameters.values, U, U,
        data_col, weight_col))


def test_value_matches_hand_formula():
    model = _model()
    n_steps = 3
    data = np.zeros((3, n_steps + 1))
    data[:, 1] = [100.0, -0.001, -0.002]
    weight = np.ones((3, 1))
    qoi = UniaxialCalibration(model, data, weight)

    xi = np.zeros(model.num_dofs)
    stretch_slc = model.layout.slc("off-axis stretches")
    sigma_axial = 90.0
    xi[0] = sigma_axial                 # cauchy_xx (axis 0)
    xi[np.arange(model.num_dofs)[stretch_slc]] = [0.9985, 0.9995]

    J = _eval_at(qoi, model, xi, data[:, 1], np.ones(3))
    pred = np.array([sigma_axial, 0.9985 - 1.0, 0.9995 - 1.0])
    expected = 0.5 * np.sum((pred - data[:, 1]) ** 2)
    assert np.isclose(J, expected, rtol=1e-12)


def test_per_row_weights_select_rows():
    model = _model()
    data = np.zeros((3, 2))
    data[0, 1] = 50.0
    qoi = UniaxialCalibration(model, data, np.ones((3, 1)))
    xi = np.zeros(model.num_dofs)
    stretch_slc = model.layout.slc("off-axis stretches")
    xi[np.arange(model.num_dofs)[stretch_slc]] = 1.0  # exact stretches

    # stress-only weight: off-axis strain mismatch must not contribute
    J_stress_only = _eval_at(qoi, model, xi, data[:, 1],
                             np.array([1.0, 0.0, 0.0]))
    assert np.isclose(J_stress_only, 0.5 * 50.0 ** 2, rtol=1e-12)
    # zero weights kill the objective entirely
    assert _eval_at(qoi, model, xi, data[:, 1], np.zeros(3)) == 0.0


def test_update_data_keeps_shape_contract():
    model = _model()
    data = np.zeros((3, 4))
    qoi = UniaxialCalibration(model, data, np.ones((3, 1)))
    qoi.update_data(np.ones((3, 4)))
    np.testing.assert_allclose(np.asarray(qoi.data_at_step(2)),
                               np.ones(3))
