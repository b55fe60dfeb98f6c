"""Shared type aliases for cmad_tpu.

Counterpart of the reference's ``cmad/typing.py:21-273``. cmad_tpu's state
is a single flat jax array per point (not a list of blocks), so the alias
set is smaller.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import numpy as np
from numpy.typing import NDArray

JaxArray = jax.Array
Scalar = float | JaxArray
PyTree = Any
Params = dict[str, Any]

# A transform leaf: None (identity), [lo, hi] (bounds), or [ref] (log).
Transform = list[float] | None
ActiveFlags = PyTree
Transforms = PyTree

# Model function signatures. ``xi`` is the flat local state vector; ``U`` is
# a GlobalFieldsAtPoint pytree.
ResidualFn = Callable[..., JaxArray]  # (xi, xi_prev, params, U, U_prev) -> C
CauchyFn = Callable[..., JaxArray]    # (xi, xi_prev, params, U, U_prev) -> (3,3)
QoIFn = Callable[..., JaxArray]


class GradientResult(NamedTuple):
    J: float
    grad: NDArray[np.floating]


class HessianResult(NamedTuple):
    J: float
    grad: NDArray[np.floating]
    hessian: NDArray[np.floating]
