"""``cmad primal`` — forward solve.

Parity: reference ``cmad/cli/primal.py:39-128``. TPU-first difference: the
whole MP time loop runs as one jitted ``lax.scan`` (stats-enabled Newton
per step) instead of a per-step Python Newton, so the trajectory is a
single device call.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmad_tpu import config
from cmad_tpu.cli.common import build_mp_problem, resolve_output
from cmad_tpu.io.deck import load_deck, unwrap_top_level
from cmad_tpu.io.writers import (
    write_cauchy,
    write_J,
    write_resolved_deck,
    write_solver_log,
    write_xi,
)
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve_with_stats


def run_primal(deck_path: Path) -> int:
    deck = unwrap_top_level(load_deck(deck_path))
    problem_type = deck["problem"]["type"]
    if problem_type == "material_point":
        return _run_primal_mp(deck_path)
    if problem_type == "fe":
        from cmad_tpu.cli.fe_subcommands import run_primal_fe
        return run_primal_fe(deck_path)
    raise ValueError(
        f"unsupported problem.type {problem_type!r}; expected "
        f"'material_point' or 'fe'")


def _run_primal_mp(deck_path: Path) -> int:
    from cmad_tpu.util.profiling import maybe_trace

    problem = build_mp_problem(deck_path, "primal")
    newton_kwargs = problem.resolved["solver"]["newton"]
    with maybe_trace(problem.resolved):
        cauchy, xi_traj, solver_log, _J = run_primal_pass(
            problem.model, problem.F, newton_kwargs)

    if "output" in problem.resolved:
        out_dir, prefix, fmt = resolve_output(problem.resolved)
        write_cauchy(out_dir, prefix, cauchy, fmt)
        write_xi(out_dir, prefix, xi_traj, problem.model.layout, fmt)
        write_solver_log(out_dir, prefix, solver_log)
        write_resolved_deck(out_dir, prefix, problem.resolved)
    return 0


def run_primal_pass(model, F: np.ndarray, newton_kwargs: dict[str, Any],
                    qoi=None):
    """One traced forward pass; returns (cauchy, xi_trajectory,
    solver_log, J).

    ``cauchy``: (3, 3, N+1); ``xi_trajectory``: (N+1, num_dofs);
    ``solver_log``: per-step {iters, final_residual}; ``J`` accumulates
    the QoI when one is supplied (``cmad objective`` path).
    """
    abs_tol, rel_tol = config.clamp_newton_tols(
        float(newton_kwargs["abs_tol"]), float(newton_kwargs["rel_tol"]),
        "mp_local")
    solve = make_newton_solve_with_stats(
        model.residual_fun,
        max_iters=int(newton_kwargs["max_iters"]),
        abs_tol=abs_tol, rel_tol=rel_tol)
    params = model.parameters.values
    num_steps = F.shape[2] - 1
    F_steps = jnp.moveaxis(jnp.asarray(F), -1, 0)

    if qoi is not None:
        data = jnp.asarray(qoi.data())
        data_steps = jnp.moveaxis(data, -1, 0)[1:]
        weights = [qoi.weight_at_step(s) for s in range(1, num_steps + 1)]
        weight_steps = jnp.stack([jnp.asarray(w) for w in weights])
    else:
        data_steps = jnp.zeros((num_steps, 1))
        weight_steps = jnp.zeros((num_steps, 1))

    @jax.jit
    def run(F_steps, data_steps, weight_steps):
        def step_fn(carry, inputs):
            xi_prev, J = carry
            F_now, F_prev, data_now, weight_now = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi, iters, final_res = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            if qoi is not None:
                J = J + qoi.qoi_fun(xi, xi_prev, params, U, U_prev,
                                    data_now, weight_now)
            return (xi, J), (xi, sigma, iters, final_res)

        xi0 = model.init_xi()
        (_, J), out = lax.scan(
            step_fn, (xi0, 0.0),
            (F_steps[1:], F_steps[:-1], data_steps, weight_steps))
        return J, out

    J, (xi_hist, sigma_hist, iters, final_res) = run(
        F_steps, data_steps, weight_steps)

    cauchy = np.zeros((3, 3, num_steps + 1))
    cauchy[:, :, 1:] = np.moveaxis(np.asarray(sigma_hist), 0, -1)
    xi_traj = np.vstack([np.asarray(model.init_xi())[None],
                         np.asarray(xi_hist)])
    solver_log = [
        {"iters": int(i), "final_residual": float(r)}
        for i, r in zip(np.asarray(iters), np.asarray(final_res),
                        strict=True)]
    return cauchy, xi_traj, solver_log, float(J)
