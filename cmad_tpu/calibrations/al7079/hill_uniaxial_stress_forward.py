"""Uniaxial-stress forward drives of the Al-7079 Hill model per specimen
rotation.

Parity: reference ``cmad/calibrations/al7079/hill_uniaxial_stress_forward.py``:
run the UNIAXIAL_STRESS SmallElasticPlastic model at each slab rotation
and report the axial stress-strain curves (the inputs to the
multi-experiment calibration). All rotations run in one vmapped trace.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmad_tpu.calibrations.al7079.multi_experiment_hill_calibration import (
    MAX_STRAIN,
    NUM_STEPS,
    _drive,
    build_model,
)
from cmad_tpu.calibrations.al7079.support import params_hill_voce, slab_data
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve


def forward_curves(parameters=None, family: str = "alpha"):
    """(strain grid, (n_exp, NUM_STEPS + 1) axial stress curves)."""
    parameters = parameters or params_hill_voce()
    angles, _sigma_c, _ratio_c, Rs = slab_data(family)
    R_stack = jnp.stack([jnp.asarray(R) for R in Rs])

    model = build_model(parameters)
    solve = make_newton_solve(model.residual_fun)
    F_steps = _drive()

    def run_one(R):
        params = {**parameters.values, "rotation matrix": R}

        def step(xi_prev, inputs):
            F_now, F_prev = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            return xi, sigma[1, 1]

        _, s = lax.scan(step, model.init_xi(), (F_steps[1:], F_steps[:-1]))
        return jnp.concatenate([jnp.zeros(1), s])

    curves = jax.jit(jax.vmap(run_one))(R_stack)
    eps = np.linspace(0.0, MAX_STRAIN, NUM_STEPS + 1)
    return eps, np.asarray(curves), np.asarray(angles)


if __name__ == "__main__":
    eps, curves, angles = forward_curves()
    for angle, curve in zip(angles, curves, strict=True):
        print(f"alpha = {np.degrees(angle):5.1f} deg: terminal axial "
              f"stress {curve[-1]:8.2f}")
