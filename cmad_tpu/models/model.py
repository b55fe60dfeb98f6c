"""Material-point model contract (functional, flat-state).

Parity: reference ``cmad/models/model.py:25-563``. Redesigned:

- the local state is a flat vector addressed through a
  :class:`~cmad_tpu.models.state.StateLayout` (no list-of-blocks);
- there is no mutable seed/evaluate derivative-mode state machine — every
  evaluator is a pure jitted function taking explicit
  ``(xi, xi_prev, params, U, U_prev)``;
- the full derivative surface of the reference (five Jacobians, mixed
  Hessians, dcauchy family — model.py:121-166,245-271) is exposed as
  lazily-built cached jitted functions. Derivatives w.r.t. parameters use a
  *flat full-parameter vector* argument (``ravel_pytree`` of the values
  tree) so Hessian blocks come out as dense matrices directly instead of
  the reference's nested-pytree unpack dance (model.py:196-244).

All evaluators accept leading batch dims on (xi, xi_prev, U, U_prev) via
:func:`jax.vmap`-built batched variants.
"""
from __future__ import annotations

from abc import ABC
from collections.abc import Callable
from functools import cached_property
from typing import Any, ClassVar

import jax.numpy as jnp
from jax import hessian, jacfwd, jacrev, jit, vmap
from jax.flatten_util import ravel_pytree

from cmad_tpu.models.deformation_types import def_type_ndims
from cmad_tpu.models.state import StateLayout
from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.typing import CauchyFn, JaxArray, ResidualFn


class Model(ABC):
    """Base class wiring a pure residual + cauchy pair into the full
    jitted derivative surface."""

    supports_closed_form_cauchy: ClassVar[bool] = False
    supports_mixed: ClassVar[bool] = False

    def __init__(
            self,
            residual_fun: ResidualFn,
            cauchy_fun: CauchyFn,
            layout: StateLayout,
            parameters: Parameters,
            def_type: int,
            cauchy_closed_form_fun: Callable[..., JaxArray] | None = None,
    ) -> None:
        self.residual_fun = residual_fun
        self.cauchy_fun = cauchy_fun
        self.layout = layout
        self.parameters = parameters
        self._def_type = def_type
        self._ndims = def_type_ndims(def_type)
        self.cauchy_closed_form_fun = cauchy_closed_form_fun

        self.num_dofs = layout.num_dofs
        self.num_residuals = len(layout)
        self.var_names = layout.var_names
        self.resid_names = layout.resid_names

        # flat-params adapter: p_flat is ravel_pytree(parameters.values)
        _, unravel_p = ravel_pytree(parameters.values)
        self._unravel_params = unravel_p

        def res_flatp(xi, xi_prev, p_flat, U, U_prev):
            return residual_fun(xi, xi_prev, unravel_p(p_flat), U, U_prev)

        def cauchy_flatp(xi, xi_prev, p_flat, U, U_prev):
            return cauchy_fun(xi, xi_prev, unravel_p(p_flat), U, U_prev)

        self._res_flatp = res_flatp
        self._cauchy_flatp = cauchy_flatp

    # ------------------------------------------------------------------
    # deck integration hooks
    # ------------------------------------------------------------------
    @classmethod
    def from_deck(cls, model_section: dict[str, Any],
                  parameters: Parameters, def_type: int) -> "Model":
        raise NotImplementedError

    @classmethod
    def material_defaults(cls) -> dict[str, Any]:
        return {}

    def derived_output_field_names(self) -> list[str]:
        return []

    def state_output_fields(self):
        return list(zip(self.layout.var_names, self.layout.var_types,
                        strict=True))

    # ------------------------------------------------------------------
    # basic properties
    # ------------------------------------------------------------------
    @property
    def ndims(self) -> int:
        return self._ndims

    @property
    def def_type(self) -> int:
        return self._def_type

    def init_xi(self, dtype=None) -> JaxArray:
        return self.layout.init_xi(dtype)

    def flat_params(self) -> JaxArray:
        return ravel_pytree(self.parameters.values)[0]

    # ------------------------------------------------------------------
    # residual + first derivatives (jitted, cached)
    # ------------------------------------------------------------------
    @cached_property
    def C(self):
        """Residual C(xi, xi_prev, params, U, U_prev) -> (n,)."""
        return jit(self.residual_fun)

    @cached_property
    def jac_xi(self):
        return jit(jacfwd(self.residual_fun, argnums=0))

    @cached_property
    def jac_xi_prev(self):
        return jit(jacfwd(self.residual_fun, argnums=1))

    @cached_property
    def jac_params(self):
        """dC/dparams as a pytree matching the params structure."""
        return jit(jacrev(self.residual_fun, argnums=2))

    @cached_property
    def jac_u(self):
        return jit(jacfwd(self.residual_fun, argnums=3))

    @cached_property
    def jac_u_prev(self):
        return jit(jacfwd(self.residual_fun, argnums=4))

    @cached_property
    def jac_params_flat(self):
        """dC/dp_flat -> (n, P) dense (full parameter vector)."""
        return jit(jacrev(self._res_flatp, argnums=2))

    def jac_params_active(self, xi, xi_prev, U, U_prev) -> JaxArray:
        """dC/d(active params) -> (n, n_active) at current values."""
        J = self.jac_params_flat(xi, xi_prev, self.flat_params(), U, U_prev)
        return J[:, jnp.asarray(self.parameters.active_idx)]

    # ------------------------------------------------------------------
    # second derivatives (direct-adjoint Hessian surface;
    # parity with model.py:245-271 evaluate_hessians)
    # ------------------------------------------------------------------
    @cached_property
    def hess_xi_xi(self):
        return jit(jacfwd(jacfwd(self.residual_fun, argnums=0), argnums=0))

    @cached_property
    def hess_xi_xi_prev(self):
        return jit(jacfwd(jacfwd(self.residual_fun, argnums=0), argnums=1))

    @cached_property
    def hess_xi_prev_xi_prev(self):
        return jit(jacfwd(jacfwd(self.residual_fun, argnums=1), argnums=1))

    @cached_property
    def hess_xi_params_flat(self):
        """d2C/(dxi dp) -> (n, nxi, P)."""
        return jit(jacrev(jacfwd(self._res_flatp, argnums=0), argnums=2))

    @cached_property
    def hess_xi_prev_params_flat(self):
        return jit(jacrev(jacfwd(self._res_flatp, argnums=1), argnums=2))

    @cached_property
    def hess_params_params_flat(self):
        """d2C/dp2 -> (n, P, P)."""
        return jit(hessian(self._res_flatp, argnums=2))

    # ------------------------------------------------------------------
    # cauchy stress + derivatives
    # ------------------------------------------------------------------
    @cached_property
    def cauchy(self):
        return jit(self.cauchy_fun)

    @cached_property
    def dcauchy_dxi(self):
        return jit(jacfwd(self.cauchy_fun, argnums=0))

    @cached_property
    def dcauchy_dxi_prev(self):
        return jit(jacfwd(self.cauchy_fun, argnums=1))

    @cached_property
    def dcauchy_dparams_flat(self):
        return jit(jacrev(self._cauchy_flatp, argnums=2))

    @cached_property
    def cauchy_closed_form(self):
        if self.cauchy_closed_form_fun is None:
            return None
        return jit(self.cauchy_closed_form_fun)

    # ------------------------------------------------------------------
    # batched (structure-of-arrays) evaluators: leading point batch on
    # xi/xi_prev/U/U_prev, shared params
    # ------------------------------------------------------------------
    @cached_property
    def C_batched(self):
        return jit(vmap(self.residual_fun, in_axes=(0, 0, None, 0, 0)))

    @cached_property
    def jac_xi_batched(self):
        return jit(vmap(jacfwd(self.residual_fun, argnums=0),
                        in_axes=(0, 0, None, 0, 0)))

    @cached_property
    def cauchy_batched(self):
        return jit(vmap(self.cauchy_fun, in_axes=(0, 0, None, 0, 0)))

    # convenience: deviatoric / hydrostatic splits used by mixed u-p
    def dev_cauchy(self, xi, xi_prev, params, U, U_prev) -> JaxArray:
        sigma = self.cauchy_fun(xi, xi_prev, params, U, U_prev)
        tr = jnp.trace(sigma, axis1=-2, axis2=-1)[..., None, None]
        return sigma - tr / 3.0 * jnp.eye(3, dtype=sigma.dtype)

    def hydro_cauchy(self, xi, xi_prev, params, U, U_prev) -> JaxArray:
        sigma = self.cauchy_fun(xi, xi_prev, params, U, U_prev)
        return jnp.trace(sigma, axis1=-2, axis2=-1) / 3.0
