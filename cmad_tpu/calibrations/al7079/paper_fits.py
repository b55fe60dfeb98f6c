"""Analytic yield-surface fits to the Al-7079 slab data.

Parity: reference ``cmad/calibrations/al7079/paper_fits.py``: evaluate
(and refit) the Hill-1948 and Barlat Yld2004-18p yield values + r-ratios
against the slab compression data at the published coefficients. Fully
traced: the per-experiment loop is a vmap over the stacked rotations —
the TPU-native replacement for the reference's Python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from cmad_tpu.calibrations.al7079.support import (
    all_slab_data,
    calibrated_barlat_coefficients,
    calibrated_hill_coefficients,
    calibration_weights,
)
from cmad_tpu.verification.functions import jax_barlat_yield, jax_hill_yield

_UNIT_SIGMA = jnp.zeros((3, 3)).at[1, 1].set(1.0)


def _batched_yield_and_ratio(yield_fun, coeffs, R_stack, sigma_c):
    """(yield values, r-ratios) for all experiments at once.

    The specimen sees uniaxial stress sigma_c e2 x e2 in its own frame;
    rotate into material coordinates, evaluate phi and the AD normal,
    and rotate the normal back. The r-ratio is n33/n11 in specimen
    coordinates.
    """
    def one(R, s):
        sigma_mat = R.T @ (s * _UNIT_SIGMA) @ R
        phi = yield_fun(sigma_mat, coeffs)
        normal_mat = jax.grad(yield_fun)(sigma_mat, coeffs)
        normal = R @ normal_mat @ R.T
        return phi, normal[2, 2] / normal[0, 0]

    return jax.vmap(one)(R_stack, sigma_c)


def hill_predictions(coeffs=None):
    sigma_c, ratio_c, Rs = all_slab_data()
    coeffs = (calibrated_hill_coefficients() if coeffs is None
              else np.asarray(coeffs))
    phi, ratio = _batched_yield_and_ratio(
        jax_hill_yield, jnp.asarray(coeffs), jnp.stack(
            [jnp.asarray(R) for R in Rs]), jnp.asarray(sigma_c))
    return np.asarray(phi), np.asarray(ratio), sigma_c, ratio_c


def barlat_predictions(coeffs=None):
    sigma_c, ratio_c, Rs = all_slab_data()
    coeffs = (calibrated_barlat_coefficients() if coeffs is None
              else np.asarray(coeffs))
    phi, ratio = _batched_yield_and_ratio(
        jax_barlat_yield, jnp.asarray(coeffs), jnp.stack(
            [jnp.asarray(R) for R in Rs]), jnp.asarray(sigma_c))
    return np.asarray(phi), np.asarray(ratio), sigma_c, ratio_c


def fit_hill_coefficients(x0=None, Y: float = 515.0,
                          maxiter: int = 200) -> np.ndarray:
    """Refit (F..N) to the slab data by weighted least squares on
    normalized yield values and r-ratios; jitted value_and_grad."""
    sigma_c, ratio_c, Rs = all_slab_data()
    R_stack = jnp.stack([jnp.asarray(R) for R in Rs])
    sigma_jax = jnp.asarray(sigma_c)
    ratio_jax = jnp.asarray(ratio_c)
    w_sigma, w_ratio = calibration_weights()

    def objective(coeffs):
        phi, ratio = _batched_yield_and_ratio(
            jax_hill_yield, coeffs, R_stack, sigma_jax)
        return (w_sigma * jnp.sum((phi / Y - 1.0) ** 2)
                + w_ratio * jnp.sum((ratio - ratio_jax) ** 2))

    vg = jax.jit(jax.value_and_grad(objective))
    x0 = (calibrated_hill_coefficients() if x0 is None
          else np.asarray(x0, dtype=float))

    def fun(x):
        J, g = vg(jnp.asarray(x))
        return float(J), np.asarray(g, dtype=np.float64)

    result = minimize(fun, x0, jac=True, method="L-BFGS-B",
                      bounds=[(0.05, 5.0)] * 6,
                      options={"maxiter": maxiter})
    return np.asarray(result.x)


if __name__ == "__main__":
    phi_h, ratio_h, sigma_c, ratio_c = hill_predictions()
    print("Hill  (published): yield rel err "
          f"{np.abs(phi_h / sigma_c[0] / (sigma_c / sigma_c[0]) - 1).max():.3f}, "
          f"ratio err {np.abs(ratio_h - ratio_c).max():.3f}")
    phi_b, ratio_b, _, _ = barlat_predictions()
    print("Barlat (published): ratio err "
          f"{np.abs(ratio_b - ratio_c).max():.3f}")
    refit = fit_hill_coefficients()
    print("refit Hill coefficients:", refit)
    print("published:             ", calibrated_hill_coefficients())
