"""Hyperelastic potentials and stress-from-potential via AD.

Parity: reference ``cmad/models/elastic_potential.py:11,29``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp
from jax import grad

from cmad_tpu.models.kinematics import compute_invariants
from cmad_tpu.typing import JaxArray


def compute_cauchy_from_psi_b(
        F: JaxArray, params: dict[str, Any],
        psi_b_fun: Callable[..., JaxArray]) -> JaxArray:
    """Cauchy stress from a potential of the invariants of b = F F^T."""
    b = F @ F.T
    invariants = compute_invariants(b)
    I1, _I2, I3 = invariants
    J = jnp.sqrt(I3)

    dpsi = grad(psi_b_fun)(invariants, params)
    return (2.0 / J) * (
        I3 * dpsi[2] * jnp.eye(3)
        + (dpsi[0] + I1 * dpsi[1]) * b
        - dpsi[1] * (b @ b)
    )


def compressible_neohookean_potential(
        invariants: tuple[JaxArray, JaxArray, JaxArray],
        params: dict[str, Any]) -> JaxArray:
    """Simo-Hughes compressible neo-Hookean free energy psi(I1, I3)."""
    I1, _I2, I3 = invariants
    J = jnp.sqrt(I3)
    Jm23 = jnp.cbrt(J) ** -2

    kappa = params["elastic"]["kappa"]
    mu = params["elastic"]["mu"]
    return 0.5 * kappa * (0.5 * (J**2 - 1.0) - jnp.log(J)) \
        + 0.5 * mu * (Jm23 * I1 - 3.0)
