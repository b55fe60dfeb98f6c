"""Experiment-sharded calibration objective on the 8-device mesh:
value and gradient match the single-device vmapped objective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cmad_tpu.calibrations.al7079.multi_experiment_hill_calibration import (
    synthetic_data,
)
from cmad_tpu.calibrations.al7079.support import (
    params_hill_voce,
    slab_data,
)
from cmad_tpu.parallel.calibration import (
    make_sharded_objective,
    shard_experiments,
)


@pytest.fixture(scope="module")
def problem():
    from cmad_tpu.calibrations.al7079 import (
        multi_experiment_hill_calibration as mc,
    )

    parameters = params_hill_voce()
    Rs = []
    for family in ("alpha", "beta", "gamma"):
        Rs.extend(slab_data(family)[3])
    R_stack = jnp.stack([jnp.asarray(R) for R in Rs])
    data = synthetic_data(parameters, R_stack)

    # rebuild the per-experiment loss exactly as the production
    # objective does, but leave the experiment reduction to the caller
    model = mc.build_model(parameters)
    from cmad_tpu.models.global_fields import mp_U_from_F
    from cmad_tpu.models.nonlinear_solver import make_newton_solve
    from jax import lax

    solve = make_newton_solve(model.residual_fun)
    F_steps = mc._drive()
    stretch_slc = model.layout.slc("off-axis stretches")

    def one_experiment(R, data_one, a):
        params = parameters.tree_with_flat_active(a, canonical=True)
        params = {**params, "rotation matrix": R}

        def step(carry, inputs):
            xi_prev, J = carry
            F_now, F_prev, target = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            pred = jnp.concatenate([sigma[1, 1][None],
                                    xi[stretch_slc] - 1.0])
            return (xi, J + 0.5 * jnp.sum((pred - target) ** 2)), None

        targets = jnp.moveaxis(data_one, -1, 0)[1:]
        (_, J), _ = lax.scan(step, (model.init_xi(), 0.0),
                             (F_steps[1:], F_steps[:-1], targets))
        return J

    def objective(a, R_stack, data, weights=None):
        Js = jax.vmap(one_experiment, in_axes=(0, 0, None))(
            R_stack, data, a)
        if weights is not None:
            Js = weights * Js
        return jnp.sum(Js)

    a0 = jnp.asarray(
        parameters.flat_active_values(return_canonical=True)) + 0.1
    return objective, a0, R_stack, data


def test_sharded_objective_matches_single_device(problem):
    objective, a0, R_stack, data = problem
    devs = np.array(jax.devices())
    assert devs.size == 8
    mesh = Mesh(devs, ("elem",))

    J_ref, g_ref = jax.jit(jax.value_and_grad(objective))(a0, R_stack,
                                                          data)

    vg = make_sharded_objective(objective, mesh, n_batch_args=3)
    (R_sh, data_sh), w = shard_experiments((R_stack, data), mesh)
    assert R_sh.shape[0] % 8 == 0 and float(w.sum()) == R_stack.shape[0]
    J_sh, g_sh = vg(a0, R_sh, data_sh, w)

    np.testing.assert_allclose(float(J_sh), float(J_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-10)
