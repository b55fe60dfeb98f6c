"""Imperative (host-side) Newton agrees with the traced IFT solve."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import (
    batched_newton_solve,
    make_newton_solve,
    newton_solve,
)
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic

from tests.support.problems import J2AnalyticalProblem


def test_imperative_matches_traced():
    problem = J2AnalyticalProblem()
    model = SmallRateElasticPlastic(problem.J2_parameters)
    params = problem.J2_parameters.values
    U = mp_U_from_F(jnp.eye(3).at[0, 0].add(0.003))
    U0 = mp_U_from_F(jnp.eye(3))
    xi0 = model.init_xi()

    solve = make_newton_solve(model.residual_fun)
    xi_traced = solve(xi0, xi0, params, U, U0)

    xi_imp, iters, norm = newton_solve(model, xi0, xi0, params, U, U0)
    assert iters > 0 and norm < 1e-12
    assert np.allclose(np.asarray(xi_imp), np.asarray(xi_traced),
                       atol=1e-10)


def test_batched_newton_solve():
    problem = J2AnalyticalProblem()
    model = SmallRateElasticPlastic(problem.J2_parameters)
    params = problem.J2_parameters.values
    rng = np.random.RandomState(0)
    B = 32
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    F = jnp.eye(3)[None] + jnp.asarray(eps)
    U = mp_U_from_F(F)
    U0 = mp_U_from_F(jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
    xi0 = jnp.zeros((B, model.num_dofs))

    xi = batched_newton_solve(model.residual_fun, xi0, xi0, params, U, U0,
                              in_axes=(0, None, 0, 0))
    C = model.C_batched(xi, xi0, params, U, U0)
    assert float(jnp.max(jnp.linalg.norm(C, axis=-1))) < 1e-12
