"""Material-point QoI contract (functional, flat-state).

Parity: reference ``cmad/qois/qoi.py:17-281``, with the same redesign as
:class:`cmad_tpu.models.model.Model`: no mutable deriv-mode state machine;
every derivative is a pure jitted function of explicit state, and
parameter derivatives use the flat full-parameter vector so Hessian blocks
come out dense.

A concrete QoI supplies
``qoi_fun(xi, xi_prev, params, U, U_prev, data_at_step, weight_at_step)``
returning a scalar, plus ``data_at_step`` / ``weight_at_step`` hooks.
"""
from __future__ import annotations

from abc import ABC
from functools import cached_property
from typing import Any, ClassVar

import jax.numpy as jnp
import numpy as np
from jax import hessian, jacfwd, jacrev, jit
from jax.flatten_util import ravel_pytree

from cmad_tpu.models.model import Model
from cmad_tpu.qois.qoi_base import QoIBase
from cmad_tpu.typing import JaxArray, QoIFn


class QoI(QoIBase, ABC):
    problem_type: ClassVar[str] = "material_point"

    def __init__(self, qoi_fun: QoIFn, model: Model,
                 data: np.ndarray, weight: np.ndarray) -> None:
        self.qoi_fun = qoi_fun
        self._model = model
        self._data = data
        self._weight = weight

        _, unravel_p = ravel_pytree(model.parameters.values)

        def qoi_flatp(xi, xi_prev, p_flat, U, U_prev, data, weight):
            return qoi_fun(xi, xi_prev, unravel_p(p_flat), U, U_prev,
                           data, weight)

        self._qoi_flatp = qoi_flatp

    @classmethod
    def from_deck(cls, qoi_section: dict[str, Any], model: Model,
                  data: np.ndarray, weight: np.ndarray) -> "QoI":
        raise NotImplementedError

    # ------------------------------------------------------------------
    # jitted evaluators
    # ------------------------------------------------------------------
    @cached_property
    def J(self):
        return jit(self.qoi_fun)

    @cached_property
    def dJ_dxi(self):
        return jit(jacfwd(self.qoi_fun, argnums=0))

    @cached_property
    def dJ_dxi_prev(self):
        return jit(jacfwd(self.qoi_fun, argnums=1))

    @cached_property
    def dJ_du(self):
        return jit(jacfwd(self.qoi_fun, argnums=3))

    @cached_property
    def dJ_du_prev(self):
        return jit(jacfwd(self.qoi_fun, argnums=4))

    @cached_property
    def dJ_dparams_flat(self):
        return jit(jacrev(self._qoi_flatp, argnums=2))

    @cached_property
    def hess_xi_xi(self):
        return jit(hessian(self.qoi_fun, argnums=0))

    @cached_property
    def hess_xi_params_flat(self):
        """d2J/(dxi dp) -> (nxi, P)."""
        return jit(jacrev(jacfwd(self._qoi_flatp, argnums=0), argnums=2))

    @cached_property
    def hess_params_params_flat(self):
        return jit(hessian(self._qoi_flatp, argnums=2))

    def dJ_dparams_active(self, xi, xi_prev, U, U_prev,
                          data, weight) -> JaxArray:
        p_flat = self._model.flat_params()
        dJ = self.dJ_dparams_flat(xi, xi_prev, p_flat, U, U_prev,
                                  data, weight)
        return dJ[jnp.asarray(self._model.parameters.active_idx)]

    # ------------------------------------------------------------------
    # data access
    # ------------------------------------------------------------------
    def model(self) -> Model:
        return self._model

    def data(self) -> np.ndarray:
        return self._data

    def weight(self) -> np.ndarray:
        return self._weight

    def data_at_step(self, step):
        raise NotImplementedError

    def weight_at_step(self, step):
        raise NotImplementedError
