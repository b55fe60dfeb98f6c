"""Fully-traced material-point objective (value_and_grad / hessian).

Parity: reference ``cmad/objectives/mp_jvp_objective.py:14-80``. The whole
time loop is a ``lax.scan`` over steps with the IFT Newton solve as the
per-step update; jitting ``value_and_grad`` / ``hessian`` of the closure
gives end-to-end on-device sensitivities. This is the TPU-native
formulation — the numpy-orchestrated strategies in mp_objective.py serve
as verification cross-checks.
"""
from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp
import numpy as np
from jax import hessian, jit, lax, value_and_grad

from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.qois.qoi import QoI


class MPJVPObjective:

    def __init__(self, qoi: QoI, global_state: np.ndarray,
                 update_fun: Callable) -> None:
        """``update_fun(xi_prev_guess, xi_prev, params, U, U_prev) -> xi``
        (typically ``make_newton_solve(model.residual_fun)``)."""
        model = qoi.model()
        parameters = model.parameters
        F = jnp.asarray(global_state)          # (3, 3, num_steps + 1)
        data = jnp.asarray(qoi.data())
        weight = jnp.asarray(qoi.weight())
        num_steps = F.shape[-1] - 1
        init_xi = model.init_xi()

        # step-stacked drive: scan consumes (F_step, F_prev, data_step)
        F_steps = jnp.moveaxis(F, -1, 0)       # (num_steps + 1, 3, 3)
        data_steps = jnp.moveaxis(data, -1, 0)

        def objective(flat_canonical_active):
            params = parameters.tree_with_flat_active(
                flat_canonical_active, canonical=True)

            def step_fn(carry, inputs):
                xi_prev, J = carry
                F_now, F_prev, data_now, weight_now = inputs
                U = mp_U_from_F(F_now)
                U_prev = mp_U_from_F(F_prev)
                xi = update_fun(xi_prev, xi_prev, params, U, U_prev)
                J = J + qoi.qoi_fun(xi, xi_prev, params, U, U_prev,
                                    data_now, weight_now)
                return (xi, J), None

            if weight.ndim == data.ndim:
                weight_steps = jnp.moveaxis(weight, -1, 0)[1:]
            else:
                weight_steps = jnp.broadcast_to(
                    weight, (num_steps, *weight.shape))
            inputs = (F_steps[1:], F_steps[:-1], data_steps[1:],
                      weight_steps)
            (_, J), _ = lax.scan(step_fn, (init_xi, 0.0), inputs)
            return J

        self.evaluate_objective = jit(objective)
        self.evaluate_objective_and_grad = jit(value_and_grad(objective))
        self.evaluate_hessian = jit(hessian(objective))
