"""Multi-experiment Hill calibration on uniaxial-stress drives.

Parity: reference
``cmad/calibrations/al7079/multi_experiment_hill_calibration.py``, with
the TPU-native redesign called out in SURVEY.md section 2.2: the
reference loops the experiments serially in Python (one adjoint objective
per rotation); here the traced objective is **vmapped over experiments**
— every rotation's whole time loop runs in one compiled program and the
total gradient is a sum over the batch.

Each experiment drives a UNIAXIAL_STRESS SmallElasticPlastic specimen at
its own material rotation and matches (axial stress, two off-axis
stretch strains) against synthetic data generated at the published Hill
coefficients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy.optimize import minimize

from cmad_tpu.calibrations.al7079.support import (
    calibrated_hill_coefficients,
    params_hill_voce,
    slab_data,
)
from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic

NUM_STEPS = 20
MAX_STRAIN = 0.01


def build_model(parameters) -> SmallElasticPlastic:
    # load along specimen axis 1: the slab rotation families (alpha
    # rotates about specimen x) are built for axis-1 compression, matching
    # the paper's sigma_22 convention
    return SmallElasticPlastic(parameters,
                               def_type=DefType.UNIAXIAL_STRESS,
                               uniaxial_stress_idx=1)


def _drive():
    """Uniaxial F(t) history, shape (NUM_STEPS + 1, 1, 1)."""
    eps = np.linspace(0.0, MAX_STRAIN, NUM_STEPS + 1)
    return jnp.asarray((1.0 + eps)[:, None, None])


def make_batched_objective(parameters, R_stack, data):
    """J(canonical actives) summed over all experiments, one trace.

    ``data``: (n_exp, 3, NUM_STEPS + 1) — rows are
    [axial stress, off-axis strain 1, off-axis strain 2].
    """
    model = build_model(parameters)
    solve = make_newton_solve(model.residual_fun)
    F_steps = _drive()
    stretch_slc = model.layout.slc("off-axis stretches")

    def response(xi, xi_prev, params, U, U_prev):
        sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
        return jnp.concatenate([sigma[1, 1][None],
                                xi[stretch_slc] - 1.0])

    def one_experiment(R, data_one, a):
        params = parameters.tree_with_flat_active(a, canonical=True)
        params = {**params, "rotation matrix": R}

        def step(carry, inputs):
            xi_prev, J = carry
            F_now, F_prev, target = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            pred = response(xi, xi_prev, params, U, U_prev)
            return (xi, J + 0.5 * jnp.sum((pred - target) ** 2)), None

        targets = jnp.moveaxis(data_one, -1, 0)[1:]
        (xi, J), _ = lax.scan(step, (model.init_xi(), 0.0),
                              (F_steps[1:], F_steps[:-1], targets))
        return J

    def objective(a):
        Js = jax.vmap(one_experiment, in_axes=(0, 0, None))(
            R_stack, data, a)
        return jnp.sum(Js)

    return jax.jit(jax.value_and_grad(objective)), model


def synthetic_data(parameters, R_stack):
    """Forward responses at the current (truth) parameters."""
    vg, model = make_batched_objective(
        parameters, R_stack,
        jnp.zeros((R_stack.shape[0], 3, NUM_STEPS + 1)))
    # reuse the internals: run the forward once per experiment
    solve = make_newton_solve(model.residual_fun)
    F_steps = _drive()
    stretch_slc = model.layout.slc("off-axis stretches")

    def run_one(R):
        params = {**parameters.values, "rotation matrix": R}

        def step(xi_prev, inputs):
            F_now, F_prev = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            out = jnp.concatenate([sigma[1, 1][None],
                                   xi[stretch_slc] - 1.0])
            return xi, out

        _, outs = lax.scan(step, model.init_xi(),
                           (F_steps[1:], F_steps[:-1]))
        return jnp.concatenate(
            [jnp.zeros((1, 3)), outs]).T     # (3, NUM_STEPS + 1)

    return jax.jit(jax.vmap(run_one))(R_stack)


def run_calibration(maxiter: int = 50, x0_offset: float = 0.15):
    # experiments: all three rotation families
    Rs = []
    for family in ("alpha", "beta", "gamma"):
        Rs.extend(slab_data(family)[3])
    R_stack = jnp.stack([jnp.asarray(R) for R in Rs])

    truth = params_hill_voce()
    data = synthetic_data(truth, R_stack)

    parameters = params_hill_voce()
    x_true = parameters.flat_active_values(return_canonical=True)
    x0 = np.asarray(x_true) + x0_offset

    vg, _model = make_batched_objective(parameters, R_stack, data)

    def fun(x):
        J, g = vg(jnp.asarray(x))
        return float(J), np.asarray(g, dtype=np.float64)

    result = minimize(fun, x0, jac=True, method="L-BFGS-B",
                      bounds=[tuple(b) for b in parameters.opt_bounds],
                      options={"maxiter": maxiter})
    parameters.set_active_values_from_flat(result.x)
    return result, parameters.flat_active_values()


if __name__ == "__main__":
    result, fitted = run_calibration()
    print(f"converged: {result.success}, J* = {result.fun:.4e}, "
          f"nit = {result.nit}")
    print("fitted Hill coefficients (F G H L M N):", fitted)
    print("truth:", calibrated_hill_coefficients())
