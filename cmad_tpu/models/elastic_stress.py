"""Elastic stress functions (batched: 3x3 tensors with leading batch dims).

Parity: reference ``cmad/models/elastic_stress.py:14-71``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp

from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.typing import JaxArray, Scalar


def _eye_like(x: JaxArray) -> JaxArray:
    return jnp.eye(3, dtype=x.dtype)


def isotropic_linear_elastic_stress(
        elastic_strain: JaxArray, params: dict[str, Any]) -> JaxArray:
    """sigma = lmbda tr(eps) I + 2 mu eps (form used by plasticity models)."""
    ec = ElasticConstants.from_params(params["elastic"])
    tr = jnp.trace(elastic_strain, axis1=-2, axis2=-1)[..., None, None]
    return ec.lmbda * tr * _eye_like(elastic_strain) + 2.0 * ec.mu * elastic_strain


def isotropic_linear_elastic_cauchy_stress(
        F: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Kappa/mu volumetric-deviatoric split form used by elasticity-only
    models; takes the deformation gradient."""
    I = _eye_like(F)
    grad_u = F - I
    eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    tr = jnp.trace(eps, axis1=-2, axis2=-1)[..., None, None]
    dev = eps - tr / 3.0 * I
    ec = ElasticConstants.from_params(params["elastic"])
    return ec.kappa * tr * I + 2.0 * ec.mu * dev


def compressible_neohookean_cauchy_stress(
        F: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Simo-Hughes compressible neo-Hookean Cauchy stress from F."""
    J = jnp.linalg.det(F)[..., None, None]
    Jm23 = jnp.cbrt(J) ** -2
    I = _eye_like(F)
    bbar = Jm23 * (F @ jnp.swapaxes(F, -1, -2))
    dev_bbar = bbar - jnp.trace(bbar, axis1=-2, axis2=-1)[..., None, None] / 3.0 * I
    ec = ElasticConstants.from_params(params["elastic"])
    return (1.0 / J) * (0.5 * ec.kappa * (J**2 - 1.0) * I + ec.mu * dev_bbar)


def conventional_elastic_stress_fun(name: str) -> Callable[..., JaxArray]:
    if name == "isotropic_linear":
        return isotropic_linear_elastic_cauchy_stress
    if name == "neohookean":
        return compressible_neohookean_cauchy_stress
    raise NotImplementedError(f"unknown elastic_stress type: {name!r}")


def two_mu_scale_factor(params: dict[str, Any]) -> Scalar:
    return 2.0 * ElasticConstants.from_params(params["elastic"]).mu
