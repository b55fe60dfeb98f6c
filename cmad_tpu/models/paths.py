"""Elastic/plastic residual branch selection.

Parity: reference ``cmad/models/paths.py:8-27``. Uses ``jnp.where`` (both
branches evaluated) instead of ``lax.cond``: on TPU the vector units evaluate
both branches for free across the point batch, and ``jnp.where``
auto-transposes under arbitrarily nested AD (lax.cond's transpose inserts a
stop_gradient that breaks when composed inside an outer implicit-function
rule).
"""
from __future__ import annotations

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray


def cond_residual(
        f: JaxArray, C_e: JaxArray, C_p: JaxArray, tol: float) -> JaxArray:
    """Plastic residual when yielding (``f > tol`` or ``|f| < tol``),
    elastic otherwise. ``f`` may carry batch dims matching C_e/C_p's
    leading dims."""
    is_plastic = jnp.logical_or(f > tol, jnp.abs(f) < tol)
    return jnp.where(is_plastic, C_p, C_e)
