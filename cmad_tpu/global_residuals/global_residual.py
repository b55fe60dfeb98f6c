"""GlobalResidual contract + mode-bound evaluator factory.

Parity: reference ``cmad/global_residuals/global_residual.py:26-400``.
A GR supplies a pure per-IP weak-form residual

    residual_fn(xi, xi_prev, params, U, U_prev, model, mode,
                shapes_ip, w, dv, h, ip_set) -> list[Array]

with ``xi`` the model's FLAT local state vector (cmad_tpu flat-state
design — no pytree bridging), ``U``/``U_prev`` per-block element basis
coefficients, ``shapes_ip`` per-block physical-frame shape functions, and
``(w, dv, h)`` the quadrature weight / measure / element size.

``for_model(model, mode)`` returns the jitted evaluator dict:
- CLOSED_FORM: {"R", "R_and_dR_dU"} — U-only 8-arg closures (xi bound to
  zeros; stress from model.cauchy_closed_form);
- COUPLED: {"R", "R_and_dR_dU_and_xi"} — 9-arg closures running the
  per-IP IFT local Newton from xi_prev, the tangent IFT-corrected
  through make_newton_solve's custom_jvp, the converged xi returned as
  a free by-product.
"""
from __future__ import annotations

from abc import ABC
from collections.abc import Sequence
from typing import TYPE_CHECKING, Any

import jax.numpy as jnp
import numpy as np
from jax import jacfwd, jit

from cmad_tpu import config
from cmad_tpu.fem.elements import ShapeFunctionsAtIP
from cmad_tpu.global_residuals.interpolation import (
    interpolate_global_fields_at_ip,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.models.model import Model
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.var_types import VarType
from cmad_tpu.typing import JaxArray

if TYPE_CHECKING:
    from cmad_tpu.fem.mesh import Mesh


class GlobalResidual(ABC):

    def __init__(self, residual_fn) -> None:
        self._residual_fn = residual_fn

    @classmethod
    def from_deck(cls, gr_section: dict[str, Any],
                  ndims: int) -> "GlobalResidual":
        raise NotImplementedError

    def _init_residuals(self, num_residuals: int) -> None:
        self.num_residuals = num_residuals
        self._num_eqs = np.zeros(num_residuals, dtype=int)
        self._var_types = np.zeros(num_residuals, dtype=int)
        self.resid_names: list[str | None] = [None] * num_residuals
        self.var_names: list[str | None] = [None] * num_residuals

    def var_type(self, residual: int) -> int:
        return int(self._var_types[residual])

    def resid_name(self, residual: int) -> str | None:
        return self.resid_names[residual]

    @property
    def ndims(self) -> int:
        return self._ndims

    def interpolate_global_fields_at_ip(
            self, U: Sequence[JaxArray],
            shapes_ip: Sequence[ShapeFunctionsAtIP]):
        return interpolate_global_fields_at_ip(U, shapes_ip, self.var_names)

    def near_null_space(self, mesh: "Mesh") -> np.ndarray | None:
        """Near-null-space basis for multilevel/deflation preconditioners;
        mechanics GRs override with rigid-body modes. Default None."""
        return None

    def primary_output_fields(self) -> list[tuple[str, VarType]]:
        return [(self.var_names[r], VarType(int(self._var_types[r])))
                for r in range(self.num_residuals)]

    def evaluate_nodal_field(self, name: str, fe_problem, fe_state,
                             step: int) -> np.ndarray:
        raise ValueError(
            f"{type(self).__name__} does not implement nodal field "
            f"{name!r}")

    # ------------------------------------------------------------------
    def for_model(self, model: Model,
                  mode: GlobalResidualMode = GlobalResidualMode.COUPLED,
                  local_newton_settings: dict[str, Any] | None = None,
                  print_local_convergence: bool = False):
        if mode == GlobalResidualMode.CLOSED_FORM:
            if local_newton_settings is not None:
                raise ValueError(
                    "local_newton_settings is only valid in COUPLED mode")
            if not model.supports_closed_form_cauchy:
                raise ValueError(
                    f"CLOSED_FORM binding requires "
                    f"supports_closed_form_cauchy; "
                    f"{type(model).__name__} lacks it")
            return self._bind_closed_form(model)
        if mode == GlobalResidualMode.COUPLED:
            if local_newton_settings is None:
                abs_tol, rel_tol = config.newton_tols("fe_local")
                local_newton_settings = {"abs_tol": abs_tol,
                                         "rel_tol": rel_tol,
                                         "max_iters": 20}
            return self._bind_coupled(model, local_newton_settings,
                                      print_local_convergence)
        raise ValueError(f"unknown GlobalResidualMode: {mode}")

    def _bind_closed_form(self, model: Model):
        residual_fn = self._residual_fn
        xi0 = jnp.zeros(model.num_dofs, dtype=config.real_dtype())

        def r_at_ip(params, U, U_prev, shapes_ip, w, dv, h, ip_set):
            return residual_fn(xi0, xi0, params, U, U_prev, model,
                               GlobalResidualMode.CLOSED_FORM,
                               shapes_ip, w, dv, h, ip_set)

        dR_dU = jacfwd(r_at_ip, argnums=1)

        def r_and_tangent(params, U, U_prev, shapes_ip, w, dv, h, ip_set):
            return (r_at_ip(params, U, U_prev, shapes_ip, w, dv, h, ip_set),
                    dR_dU(params, U, U_prev, shapes_ip, w, dv, h, ip_set))

        return {"R": jit(r_at_ip), "R_and_dR_dU": jit(r_and_tangent)}

    def _bind_coupled(self, model: Model,
                      local_newton_settings: dict[str, Any],
                      print_local_convergence: bool):
        residual_fn = self._residual_fn
        local_newton = self._build_local_solve(
            model, local_newton_settings, print_local_convergence)

        def r_total(params, U, U_prev, xi_prev, shapes_ip, w, dv, h,
                    ip_set):
            U_ip = self.interpolate_global_fields_at_ip(U, shapes_ip)
            U_ip_prev = self.interpolate_global_fields_at_ip(
                U_prev, shapes_ip)
            xi = local_newton(xi_prev, xi_prev, params, U_ip, U_ip_prev)
            return residual_fn(xi, xi_prev, params, U, U_prev, model,
                               GlobalResidualMode.COUPLED,
                               shapes_ip, w, dv, h, ip_set)

        dR_dU_total = jacfwd(r_total, argnums=1)

        def r_tangent_xi(params, U, U_prev, xi_prev, shapes_ip, w, dv, h,
                         ip_set):
            U_ip = self.interpolate_global_fields_at_ip(U, shapes_ip)
            U_ip_prev = self.interpolate_global_fields_at_ip(
                U_prev, shapes_ip)
            xi = local_newton(xi_prev, xi_prev, params, U_ip, U_ip_prev)
            R = residual_fn(xi, xi_prev, params, U, U_prev, model,
                            GlobalResidualMode.COUPLED,
                            shapes_ip, w, dv, h, ip_set)
            dR_dU = dR_dU_total(params, U, U_prev, xi_prev, shapes_ip,
                                w, dv, h, ip_set)
            return R, dR_dU, xi

        return {"R": jit(r_total),
                "R_and_dR_dU_and_xi": jit(r_tangent_xi)}

    @staticmethod
    def _build_local_solve(model: Model,
                           local_newton_settings: dict[str, Any],
                           print_local_convergence: bool):
        """Per-IP local solve: the analytic J2 radial return when the
        model structurally admits it (ops/return_map.py, ~80x the
        generic Newton and fully differentiable via its fixed
        iteration), the generic IFT Newton otherwise."""
        from cmad_tpu.ops.return_map import (
            j2_voce_specializable,
            make_j2_radial_return_for,
        )

        if j2_voce_specializable(model) and not print_local_convergence:
            radial = make_j2_radial_return_for(model, prefer_pallas=False)

            def local_solve(xi_guess, xi_prev, params, U_ip, U_ip_prev):
                del xi_guess  # radial return needs no iterate seed
                xi, _sigma = radial(xi_prev, U_ip.grad_fields["u"],
                                    U_ip_prev.grad_fields["u"], params)
                return xi

            return local_solve

        from cmad_tpu.ops.hosford_return import (
            hosford_reducible,
            make_hosford_local_solve,
        )
        if hosford_reducible(model) and not print_local_convergence:
            # diagonal-yield reduction: 4-dof Newton instead of 7-dof
            return make_hosford_local_solve(model,
                                            **local_newton_settings)

        from cmad_tpu.ops.principal_return import (
            make_principal_hosford_local_solve,
            principal_hosford_reducible,
        )
        if (principal_hosford_reducible(model)
                and not print_local_convergence):
            # frame-invariant isotropic yield: 4-dof Newton in the
            # trial eigenbasis instead of the 7-dof coupled solve
            return make_principal_hosford_local_solve(
                model, **local_newton_settings)

        from cmad_tpu.ops.hill_return import (
            hill_reducible,
            make_hill_local_solve,
        )
        if hill_reducible(model) and not print_local_convergence:
            # quadratic-yield reduction: scalar Newton + linear
            # stress recovery instead of the 7-dof coupled solve
            return make_hill_local_solve(model, **local_newton_settings)

        return make_newton_solve(
            model.residual_fun, **local_newton_settings,
            print_local_convergence=print_local_convergence)
