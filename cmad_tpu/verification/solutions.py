"""Analytical elastic / plastic field generators — test oracles.

Parity: reference ``cmad/verification/solutions.py:4,30``. Pure numpy,
used to manufacture stress/strain histories that the constitutive models
must reproduce to solver tolerance.
"""
from __future__ import annotations

import numpy as np


def compute_elastic_fields(
        stress_tensor_at_yield: np.ndarray,
        min_stress_scale: float,
        max_stress_scale: float,
        elastic_params,
        num_steps: int):
    """Proportional elastic loading path: stress(t) = scale(t) * sigma_y,
    strain from isotropic Hooke inversion. Returns (stress, strain) with
    trailing step axis (3, 3, num_steps)."""
    E, nu = elastic_params
    scales = np.linspace(min_stress_scale, max_stress_scale, num_steps)

    stress = stress_tensor_at_yield[:, :, None] * scales[None, None, :]
    trace = np.trace(stress, axis1=0, axis2=1)
    trace_I = np.eye(3)[:, :, None] * trace[None, None, :]
    strain = (stress - nu * (trace_I - stress)) / E
    return stress, strain


def compute_plastic_fields(
        stress_mask: np.ndarray,
        yield_fun,
        yield_normal_fun,
        isotropic_params,
        max_alpha: float,
        num_steps: int):
    """Proportional plastic loading at fixed stress direction with Voce
    hardening: sigma(alpha) = (Y + S(1 - e^{-D alpha})) * mask / phi(mask).
    Plastic strain integrated by forward Euler on the flow rule. Returns
    (stress, strain, alpha)."""
    E, nu, Y, S, D = isotropic_params
    alpha = np.linspace(0.0, max_alpha, num_steps)
    dalpha = alpha[1] - alpha[0]

    phi_mask = yield_fun(stress_mask)
    flow = (Y + S * (1.0 - np.exp(-D * alpha))) / phi_mask
    stress = stress_mask[:, :, None] * flow[None, None, :]

    trace = np.trace(stress, axis1=0, axis2=1)
    trace_I = np.eye(3)[:, :, None] * trace[None, None, :]

    pstrain = np.zeros((3, 3, num_steps))
    for n in range(1, num_steps):
        pstrain[:, :, n] = pstrain[:, :, n - 1] \
            + dalpha * yield_normal_fun(stress[:, :, n])

    strain = (stress - nu * (trace_I - stress)) / E + pstrain
    return stress, strain, alpha
