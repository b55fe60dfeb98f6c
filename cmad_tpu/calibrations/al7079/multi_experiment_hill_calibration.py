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
from scipy.optimize import OptimizeResult, minimize

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


def make_raw_objective(parameters, R_stack, data):
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

    return objective, model


def make_batched_objective(parameters, R_stack, data):
    """jit(value_and_grad) of the summed multi-experiment objective."""
    objective, model = make_raw_objective(parameters, R_stack, data)
    return jax.jit(jax.value_and_grad(objective)), model


def minimize_lbfgs_on_device(objective, x0, maxiter: int,
                             gtol: float = 1e-8):
    """Whole L-BFGS loop as ONE compiled device program.

    The scipy path dispatches one device call per function evaluation;
    through a remote-attached TPU every dispatch pays seconds of tunnel
    latency, which made this tiny-batch calibration 3.5x slower on TPU
    than CPU in round 1 (``benchmarks/al7079/README.md``). Running the
    optimizer itself on device (optax L-BFGS + zoom linesearch inside a
    ``lax.while_loop``) collapses ~70 dispatches into one.

    Unconstrained: callers whose canonical actives must stay inside the
    [-1, 1] box should clip the result (the Hill recovery optimum is
    interior, matching the reference study's use of unbounded
    ``fmin_l_bfgs_b`` defaults).

    Returns ``(x, value, iters)`` as device arrays.
    """
    import optax
    import optax.tree_utils as otu

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(objective)

    def step(carry):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value,
                                    grad=grad, value_fn=objective)
        return optax.apply_updates(x, updates), state

    def keep_going(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        err = otu.tree_norm(otu.tree_get(state, "grad"))
        return (count == 0) | ((count < maxiter) & (err >= gtol))

    @jax.jit
    def run(x0):
        x, state = lax.while_loop(keep_going, step, (x0, opt.init(x0)))
        return x, objective(x), otu.tree_get(state, "count")

    return run(jnp.asarray(x0))


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


def run_calibration(maxiter: int = 50, x0_offset: float = 0.15,
                    optimizer: str = "auto"):
    """Recover the Hill coefficients from synthetic multi-experiment data.

    ``optimizer``: ``"scipy"`` (host L-BFGS-B, one device dispatch per
    evaluation — right for CPU), ``"device"`` (the whole L-BFGS loop as
    one compiled program — right for remote accelerators, where
    per-dispatch latency dominates this tiny batch), or ``"auto"``
    (device loop on accelerators, scipy on CPU).
    """
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

    if optimizer == "auto":
        optimizer = ("device" if jax.default_backend() != "cpu"
                     else "scipy")

    if optimizer == "device":
        raw, _model = make_raw_objective(parameters, R_stack, data)
        lo = np.asarray([b[0] for b in parameters.opt_bounds])
        hi = np.asarray([b[1] for b in parameters.opt_bounds])
        # f32 objectives floor well above the f64 gtol; loosen to match
        gtol = 1e-8 if jnp.zeros(()).dtype == jnp.float64 else 1e-5
        x, J, iters = minimize_lbfgs_on_device(
            raw, np.clip(x0, lo, hi), maxiter, gtol=gtol)
        x = np.clip(np.asarray(x, dtype=np.float64), lo, hi)
        result = OptimizeResult(
            x=x, fun=float(J), nit=int(iters),
            success=bool(int(iters) < maxiter), method="lbfgs_on_device")
    elif optimizer == "scipy":
        vg, _model = make_batched_objective(parameters, R_stack, data)

        def fun(x):
            J, g = vg(jnp.asarray(x))
            return float(J), np.asarray(g, dtype=np.float64)

        result = minimize(fun, x0, jac=True, method="L-BFGS-B",
                          bounds=[tuple(b) for b in parameters.opt_bounds],
                          options={"maxiter": maxiter})
    else:
        raise ValueError(
            f"unknown optimizer {optimizer!r} (scipy | device | auto)")
    parameters.set_active_values_from_flat(result.x)
    return result, parameters.flat_active_values()


if __name__ == "__main__":
    result, fitted = run_calibration()
    print(f"converged: {result.success}, J* = {result.fun:.4e}, "
          f"nit = {result.nit}")
    print("fitted Hill coefficients (F G H L M N):", fitted)
    print("truth:", calibrated_hill_coefficients())
