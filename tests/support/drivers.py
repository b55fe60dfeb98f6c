"""Shared material-point drive helpers for tests."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve


def run_strain_controlled_history(model, F_history):
    """Drive a model through a deformation-gradient history as one jitted
    ``lax.scan`` (one compile + one device call per history).

    ``F_history``: (d, d, num_steps + 1) with F[:, :, 0] the reference
    configuration. Returns (cauchy (3, 3, num_steps + 1),
    xi_history (num_steps + 1, num_dofs) as numpy).
    """
    solve = make_newton_solve(model.residual_fun)
    params = model.parameters.values
    F_steps = jnp.moveaxis(jnp.asarray(F_history), -1, 0)

    @jax.jit
    def run(F_steps):
        def step_fn(xi_prev, inputs):
            F_now, F_prev = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            return xi, (xi, sigma)

        xi0 = model.init_xi()
        _, (xi_hist, sigma_hist) = lax.scan(
            step_fn, xi0, (F_steps[1:], F_steps[:-1]))
        return xi_hist, sigma_hist

    xi_hist, sigma_hist = run(F_steps)
    num_steps = F_history.shape[2] - 1

    cauchy = np.zeros((3, 3, num_steps + 1))
    cauchy[:, :, 1:] = np.moveaxis(np.asarray(sigma_hist), 0, -1)
    xi_full = np.vstack([np.asarray(model.init_xi())[None],
                         np.asarray(xi_hist)])
    return cauchy, list(xi_full)
