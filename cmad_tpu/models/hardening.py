"""Isotropic hardening laws.

Parity: reference ``cmad/models/hardening.py``. All functions are batched
(alpha may carry batch dims).
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray


def voce_hardening(alpha: JaxArray, voce_params: dict[str, Any]) -> JaxArray:
    S, D = voce_params["S"], voce_params["D"]
    return S * (1.0 - jnp.exp(-D * alpha))


def linear_hardening(alpha: JaxArray, linear_params: dict[str, Any]) -> JaxArray:
    return linear_params["K"] * alpha


def get_hardening_funs() -> dict[str, Callable[..., JaxArray]]:
    return {"voce": voce_hardening, "linear": linear_hardening}


def combined_hardening_fun(
        alpha: JaxArray, params: dict[str, Any],
        hardening_funs: dict[str, Callable[..., JaxArray]]) -> JaxArray:
    """Sum of all hardening laws whose parameter blocks are present."""
    total = 0.0
    for htype, hparams in params.items():
        total = total + hardening_funs[htype](alpha, hparams)
    return total
