"""Material-point calibration objectives (adjoint / direct / direct-adjoint).

Parity: reference ``cmad/objectives/mp_objective.py:22-345``. Three sibling
strategies over the model/QoI derivative surface, orchestrated on host with
numpy linear algebra (each derivative evaluation is a jitted device call).
The Hessian formula of MPDirectAdjointObjective follows the direct-adjoint
method of arXiv:2501.04584.

cmad_tpu differences:
- explicit (functional) state instead of the mutable seed/evaluate machine;
- the forward pass uses the traced IFT Newton (make_newton_solve), so the
  whole per-step solve is one compiled XLA call;
- the QoI mixed Hessian is taken w.r.t. (xi, params) — the reference
  computes it w.r.t. (xi_prev, params) (qoi.py:55, latent because its QoIs
  do not depend on xi_prev and params enter only via inactive rotations).
"""
from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.qois.qoi import QoI
from cmad_tpu.typing import GradientResult, HessianResult


class MPObjective(ABC):
    """Shared scaffolding: parameter injection + stored forward pass."""

    def __init__(self, qoi: QoI, global_state: np.ndarray) -> None:
        self._qoi = qoi
        self._model = qoi.model()
        self._parameters = self._model.parameters
        self._F = np.asarray(global_state)  # (3, 3, num_steps + 1)
        self._num_steps = qoi.data().shape[-1] - 1
        self._solve = jax.jit(make_newton_solve(self._model.residual_fun))

    def evaluate(self, flat_active_values) -> GradientResult | HessianResult:
        self._parameters.set_active_values_from_flat(flat_active_values)
        return self._evaluate()

    @abstractmethod
    def _evaluate(self) -> GradientResult | HessianResult: ...

    def _U_pair(self, step: int):
        return (mp_U_from_F(jnp.asarray(self._F[:, :, step])),
                mp_U_from_F(jnp.asarray(self._F[:, :, step - 1])))

    def _forward_pass_with_storage(self):
        """Forward loop storing xi per step; returns (J, xi_at_step)."""
        model, qoi = self._model, self._qoi
        params = self._parameters.values
        xi = model.init_xi()
        xi_at_step = [xi]
        J = 0.0
        for step in range(1, self._num_steps + 1):
            U, U_prev = self._U_pair(step)
            xi_prev = xi_at_step[step - 1]
            xi = self._solve(xi_prev, xi_prev, params, U, U_prev)
            xi_at_step.append(xi)
            J += float(qoi.J(xi, xi_prev, params, U, U_prev,
                             qoi.data_at_step(step), qoi.weight_at_step(step)))
        return J, xi_at_step

    # ------------------------------------------------------------------
    # shared derivative-block helpers (active physical params)
    # ------------------------------------------------------------------
    def _aidx(self):
        return self._parameters.active_idx

    def _model_blocks(self, xi, xi_prev, U, U_prev):
        model = self._model
        params = self._parameters.values
        p_flat = model.flat_params()
        aidx = self._aidx()
        dC_dxi = np.asarray(model.jac_xi(xi, xi_prev, params, U, U_prev))
        dC_dxi_prev = np.asarray(
            model.jac_xi_prev(xi, xi_prev, params, U, U_prev))
        dC_dp = np.asarray(model.jac_params_flat(
            xi, xi_prev, p_flat, U, U_prev))[:, aidx]
        return dC_dxi, dC_dxi_prev, dC_dp

    def _qoi_blocks(self, step, xi, xi_prev, U, U_prev):
        qoi = self._qoi
        params = self._parameters.values
        data, weight = qoi.data_at_step(step), qoi.weight_at_step(step)
        dJ_dxi = np.asarray(qoi.dJ_dxi(xi, xi_prev, params, U, U_prev,
                                       data, weight))
        dJ_dp = np.asarray(qoi.dJ_dparams_active(xi, xi_prev, U, U_prev,
                                                 data, weight))
        return dJ_dxi, dJ_dp


class MPAdjointObjective(MPObjective):
    """Gradient via the discrete reverse-time adjoint recursion."""

    def _evaluate(self) -> GradientResult:
        J, xi_at_step = self._forward_pass_with_storage()

        n_active = self._parameters.num_active_params
        grad = np.zeros(n_active)
        history = np.zeros(self._model.num_dofs)

        for step in range(self._num_steps, 0, -1):
            U, U_prev = self._U_pair(step)
            xi, xi_prev = xi_at_step[step], xi_at_step[step - 1]

            dC_dxi, dC_dxi_prev, dC_dp = self._model_blocks(
                xi, xi_prev, U, U_prev)
            dJ_dxi, dJ_dp = self._qoi_blocks(step, xi, xi_prev, U, U_prev)

            phi = np.linalg.solve(dC_dxi.T, -dJ_dxi + history)
            history = -dC_dxi_prev.T @ phi
            grad += phi @ dC_dp + dJ_dp

        grad = self._parameters.transform_grad(grad)
        return GradientResult(J=J, grad=grad)


class MPDirectObjective(MPObjective):
    """Gradient via the forward (tangent) sensitivity recursion."""

    def _evaluate(self) -> GradientResult:
        model = self._model
        params = self._parameters.values
        n_active = self._parameters.num_active_params

        J = 0.0
        grad = np.zeros(n_active)
        dxi_dp = np.zeros((model.num_dofs, n_active))
        xi_prev = model.init_xi()

        for step in range(1, self._num_steps + 1):
            U, U_prev = self._U_pair(step)
            xi = self._solve(xi_prev, xi_prev, params, U, U_prev)

            qoi = self._qoi
            J += float(qoi.J(xi, xi_prev, params, U, U_prev,
                             qoi.data_at_step(step), qoi.weight_at_step(step)))

            dC_dxi, dC_dxi_prev, dC_dp = self._model_blocks(
                xi, xi_prev, U, U_prev)
            dJ_dxi, dJ_dp = self._qoi_blocks(step, xi, xi_prev, U, U_prev)

            dxi_dp = np.linalg.solve(dC_dxi, -dC_dp - dC_dxi_prev @ dxi_dp)
            grad += dJ_dxi @ dxi_dp + dJ_dp
            xi_prev = xi

        grad = self._parameters.transform_grad(grad)
        return GradientResult(J=J, grad=grad)


class MPDirectAdjointObjective(MPObjective):
    """Gradient + Hessian via the direct-adjoint method (arXiv:2501.04584)."""

    def _evaluate(self) -> HessianResult:
        model, qoi = self._model, self._qoi
        params = self._parameters.values
        aidx = self._aidx()
        n_active = self._parameters.num_active_params
        n = model.num_dofs

        J, xi_at_step = self._forward_pass_with_storage()

        # adjoint pass: gradient + stored multipliers
        grad = np.zeros(n_active)
        history = np.zeros(n)
        phi_at_step = [np.zeros(n)] * (self._num_steps + 1)
        for step in range(self._num_steps, 0, -1):
            U, U_prev = self._U_pair(step)
            xi, xi_prev = xi_at_step[step], xi_at_step[step - 1]
            dC_dxi, dC_dxi_prev, dC_dp = self._model_blocks(
                xi, xi_prev, U, U_prev)
            dJ_dxi, dJ_dp = self._qoi_blocks(step, xi, xi_prev, U, U_prev)

            phi = np.linalg.solve(dC_dxi.T, -dJ_dxi + history)
            phi_at_step[step] = phi
            history = -dC_dxi_prev.T @ phi
            grad += phi @ dC_dp + dJ_dp

        untransformed_grad = grad.copy()
        grad = self._parameters.transform_grad(grad)

        # forward pass for the Hessian accumulation
        hess = np.zeros((n_active, n_active))
        D_prev = np.zeros((n, n_active))
        p_flat = model.flat_params()

        for step in range(1, self._num_steps + 1):
            U, U_prev = self._U_pair(step)
            xi, xi_prev = xi_at_step[step], xi_at_step[step - 1]
            dC_dxi, dC_dxi_prev, dC_dp = self._model_blocks(
                xi, xi_prev, U, U_prev)
            D = np.linalg.solve(dC_dxi, -dC_dp - dC_dxi_prev @ D_prev)

            # model second derivatives (active columns)
            Cxx = np.asarray(model.hess_xi_xi(
                xi, xi_prev, params, U, U_prev))
            Cxxp = np.asarray(model.hess_xi_xi_prev(
                xi, xi_prev, params, U, U_prev))
            Cxpxp = np.asarray(model.hess_xi_prev_xi_prev(
                xi, xi_prev, params, U, U_prev))
            Cxp_full = np.asarray(model.hess_xi_params_flat(
                xi, xi_prev, p_flat, U, U_prev))[:, :, aidx]
            Cxprevp_full = np.asarray(model.hess_xi_prev_params_flat(
                xi, xi_prev, p_flat, U, U_prev))[:, :, aidx]
            Cpp = np.asarray(model.hess_params_params_flat(
                xi, xi_prev, p_flat, U, U_prev))[:, aidx][:, :, aidx]
            # (q, p, xi) orderings
            Cpx = Cxp_full.transpose((0, 2, 1))
            Cpxprev = Cxprevp_full.transpose((0, 2, 1))

            # qoi second derivatives
            data, weight = qoi.data_at_step(step), qoi.weight_at_step(step)
            Jxx = np.asarray(qoi.hess_xi_xi(
                xi, xi_prev, params, U, U_prev, data, weight))
            Jxp = np.asarray(qoi.hess_xi_params_flat(
                xi, xi_prev, p_flat, U, U_prev, data, weight))[:, aidx]
            Jpp = np.asarray(qoi.hess_params_params_flat(
                xi, xi_prev, p_flat, U, U_prev, data, weight)
            )[aidx][:, aidx]
            Jpx = Jxp.T

            phi = phi_at_step[step]

            hess += Jpp \
                + np.einsum("q,qij->ij", phi, Cpp) \
                + Jpx @ D \
                + np.einsum("q,qik,kj->ij", phi, Cpx, D) \
                + (Jpx @ D).T \
                + np.einsum("q,qjk,ki->ij", phi, Cpx, D) \
                + np.einsum("km,ki,mj->ij", Jxx, D, D) \
                + np.einsum("q,qkm,ki,mj->ij", phi, Cxx, D, D) \
                + np.einsum("q,qik,kj->ij", phi, Cpxprev, D_prev) \
                + np.einsum("q,qkm,ki,mj->ij", phi, Cxxp, D, D_prev) \
                + np.einsum("q,qmk,ki,mj->ij", phi, Cxxp, D_prev, D) \
                + np.einsum("q,qkm,ki,mj->ij", phi, Cxpxp, D_prev, D_prev) \
                + np.einsum("q,qjk,ki->ij", phi, Cpxprev, D_prev)

            D_prev = D

        hess = self._parameters.transform_hessian(hess, untransformed_grad)
        return HessianResult(J=J, grad=grad, hessian=hess)
