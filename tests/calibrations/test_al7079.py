"""Al-7079 calibration studies: smoke + recovery checks."""
from __future__ import annotations

import numpy as np
import pytest


def test_slab_data_shapes():
    from cmad_tpu.calibrations.al7079.support import all_slab_data, slab_data

    for family, n in (("alpha", 7), ("beta", 3), ("gamma", 2)):
        angles, sigma_c, ratio_c, Rs = slab_data(family)
        assert len(angles) == len(sigma_c) == len(ratio_c) == len(Rs) == n
        for R in Rs:
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    sigma_c, ratio_c, Rs = all_slab_data()
    assert len(Rs) == 12


def test_paper_fit_predictions_are_anisotropic():
    from cmad_tpu.calibrations.al7079.paper_fits import hill_predictions

    phi, ratio, sigma_c, ratio_c = hill_predictions()
    assert phi.shape == (12,)
    # the published fit reproduces the r-ratio trend qualitatively
    assert np.corrcoef(ratio, ratio_c)[0, 1] > 0.7


@pytest.mark.slow
def test_multi_experiment_recovery():
    from cmad_tpu.calibrations.al7079.multi_experiment_hill_calibration import (
        run_calibration,
    )
    from cmad_tpu.calibrations.al7079.support import (
        calibrated_hill_coefficients,
    )

    result, fitted = run_calibration(maxiter=40)
    assert result.fun < 1e-8
    assert np.allclose(fitted, calibrated_hill_coefficients(), atol=1e-4)


def test_forward_curves_vary_with_rotation():
    from cmad_tpu.calibrations.al7079.hill_uniaxial_stress_forward import (
        forward_curves,
    )

    eps, curves, angles = forward_curves()
    terminal = curves[:, -1]
    assert terminal.std() > 10.0  # strongly anisotropic
    assert np.all(terminal > 400.0)


def test_lbfgs_on_device_quadratic_and_rosenbrock():
    """The one-dispatch L-BFGS loop minimizes standard problems."""
    import jax.numpy as jnp

    from cmad_tpu.calibrations.al7079.multi_experiment_hill_calibration import (
        minimize_lbfgs_on_device,
    )

    A = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -2.0])

    def quad(x):
        return 0.5 * x @ A @ x - b @ x

    x, J, iters = minimize_lbfgs_on_device(quad, jnp.zeros(2), 50)
    x_star = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.allclose(np.asarray(x), x_star, atol=1e-6)
    assert int(iters) < 50

    def rosen(x):
        return (100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2)

    x, J, iters = minimize_lbfgs_on_device(
        rosen, jnp.asarray([-1.2, 1.0]), 200)
    assert np.allclose(np.asarray(x), [1.0, 1.0], atol=1e-5)
    assert float(J) < 1e-10
