"""FE subcommand implementations.

Parity: reference ``cmad/cli/{primal,objective,gradient,hessian,
calibrate}.py`` FE branches. The FE sensitivities are plain
``jax.grad`` / ``jax.hessian`` of the J(params_flat) closure — the FE
Newton's custom_jvp supplies the implicit-step derivatives, so there is
no separate sensitivity strategy section for FE decks.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
from jax import jit, value_and_grad
from jax.tree_util import tree_flatten_with_path
from scipy.optimize import minimize

from cmad_tpu import config
from cmad_tpu.cli.calibrate import (
    active_param_paths,
    optimize_status,
    resolve_initial_guess,
)
from cmad_tpu.cli.common import resolve_output
from cmad_tpu.cli.fe_common import (
    FEProblemBundle,
    build_fe_J_of_params_flat,
    build_fe_problem_from_deck,
)
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.io.fe_writers import (
    resolve_fe_output_plan,
    write_fe_active_params,
    write_fe_exodus,
    write_fe_opt_params,
)
from cmad_tpu.io.writers import (
    write_grad,
    write_hessian,
    write_J,
    write_opt_history,
    write_opt_status,
    write_resolved_deck,
    write_solver_log,
)


def _nls_settings(bundle: FEProblemBundle) -> dict[str, Any]:
    gr = bundle.resolved["residuals"]["global residual"]
    abs_tol, rel_tol = config.clamp_newton_tols(
        float(gr["nonlinear absolute tol"]),
        float(gr["nonlinear relative tol"]), "fe_global")
    return {"max iters": int(gr["nonlinear max iters"]),
            "abs tol": abs_tol, "rel tol": rel_tol,
            "print convergence": bool(gr.get("print convergence", False)),
            "line search": gr.get("line search", {})}


def _resolve_restart(bundle: FEProblemBundle):
    """(t_schedule, U_init, xi_init_by_block) honoring a top-level
    ``restart: {file: ...}`` section: the schedule keeps its t0-anchored
    shape but resumes at the checkpoint time, dropping already-solved
    steps."""
    schedule = bundle.t_schedule.tolist()
    if "restart" not in bundle.resolved:
        return schedule, None, None
    from cmad_tpu.io.restart import check_restart_compatible, read_restart

    U0, xi0, t0 = read_restart(
        Path(bundle.resolved["restart"]["file"]))
    check_restart_compatible(bundle.fe_problem, U0, xi0)
    eps = 1e-12 * max(1.0, abs(schedule[-1]))
    remaining = [t for t in schedule if t > t0 + eps]
    if not remaining:
        raise ValueError(
            f"restart checkpoint is at t = {t0}, at or beyond the "
            f"deck's final step time {schedule[-1]} — nothing to solve")
    return [t0, *remaining], U0, xi0


def run_primal_fe(deck_path: Path) -> int:
    bundle = build_fe_problem_from_deck(deck_path, "primal")
    qoi = bundle.qoi
    write_qoi = (qoi if qoi is not None and qoi.produces_primal_output()
                 else None)
    from cmad_tpu.util.profiling import maybe_trace

    t_schedule, U_init, xi_init = _resolve_restart(bundle)
    driver = bundle.resolved["residuals"]["global residual"].get(
        "driver", "scan")
    with maybe_trace(bundle.resolved):
        if driver == "host":
            from cmad_tpu.fem.nonlinear_solver import (
                fe_quasistatic_drive_host,
            )

            state, solver_log = fe_quasistatic_drive_host(
                bundle.fe_problem, t_schedule,
                nonlinear_solver_settings=_nls_settings(bundle),
                linear_solver_settings=bundle.resolved["linear solver"],
                U_init=U_init, xi_init_by_block=xi_init)
            J = _accumulate_qoi_over_history(
                bundle, state,
                None if write_qoi is not None else qoi, t_schedule)
        elif driver == "stepped":
            from cmad_tpu.fem.driver import fe_quasistatic_drive_stepped

            state, solver_log = fe_quasistatic_drive_stepped(
                bundle.fe_problem, t_schedule,
                nonlinear_solver_settings=_nls_settings(bundle),
                linear_solver_settings=bundle.resolved["linear solver"],
                U_init=U_init, xi_init_by_block=xi_init,
                max_iters_per_dispatch=bundle.resolved["residuals"][
                    "global residual"].get("max iters per dispatch"),
                steps_per_dispatch=bundle.resolved["residuals"][
                    "global residual"].get("steps per dispatch"))
            J = _accumulate_qoi_over_history(
                bundle, state,
                None if write_qoi is not None else qoi, t_schedule)
        else:
            state, J = fe_quasistatic_drive(
                bundle.fe_problem, t_schedule,
                nonlinear_solver_settings=_nls_settings(bundle),
                linear_solver_settings=bundle.resolved["linear solver"],
                qoi=None if write_qoi is not None else qoi,
                U_init=U_init, xi_init_by_block=xi_init)
            # the scanned Newton cannot self-report (no host callbacks
            # on TPU); verify the recorded history's true residuals
            from cmad_tpu.fem.driver import fe_history_solver_log

            solver_log = fe_history_solver_log(
                bundle.fe_problem, state, t_schedule,
                nonlinear_solver_settings=_nls_settings(bundle))

    if "output" not in bundle.resolved:
        return 0
    out_dir, prefix, _fmt = resolve_output(bundle.resolved)
    write_solver_log(out_dir, prefix, solver_log)
    output = bundle.resolved["output"]
    if output.get("write restart", False):
        from cmad_tpu.io.restart import write_restart

        last = len(t_schedule) - 1
        write_restart(
            out_dir / f"{prefix}restart.npz", state.U_at(last),
            {b: state.xi_at(last, b)
             for b in bundle.fe_problem.models_by_block},
            t_schedule[-1])
    if output.get("write exodus", True):
        plan = resolve_fe_output_plan(output, bundle.fe_problem)
        if "exodus filename" not in output:
            name = bundle.resolved["problem"].get("name") or deck_path.stem
            output["exodus filename"] = f"{name}.exo"
        write_fe_exodus(out_dir, prefix, bundle.fe_problem, state, plan,
                        output["exodus filename"])
    write_resolved_deck(out_dir, prefix, bundle.resolved)
    if write_qoi is not None:
        write_qoi.write_primal_outputs(bundle.fe_problem, state)
    elif qoi is not None:
        write_J(out_dir, prefix, float(J))
    return 0


def _accumulate_qoi_over_history(bundle: FEProblemBundle, state,
                                 qoi, t_schedule=None) -> float:
    """Sum an accumulating QoI's step contributions over a recorded
    trajectory (the host driver has no in-scan accumulator).
    ``t_schedule`` defaults to the bundle's base schedule (load cases
    pass their own)."""
    if qoi is None:
        return 0.0
    import jax.numpy as jnp

    from cmad_tpu.fem.assembly import params_by_block_from_models

    fe = bundle.fe_problem
    closure = qoi.step_contribution(params_by_block_from_models(fe),
                                    fe.kernel_arrays)
    coupled = list(fe.models_by_block)
    J = 0.0
    ts = [float(t) for t in (bundle.t_schedule if t_schedule is None
                             else t_schedule)]
    for k in range(1, len(ts)):
        xi = {b: jnp.asarray(state.xi_at(k, b)) for b in coupled}
        xi_prev = {b: jnp.asarray(state.xi_at(k - 1, b))
                   for b in coupled}
        J += float(closure(jnp.asarray(state.U_at(k)),
                           jnp.asarray(state.U_at(k - 1)),
                           xi, xi_prev, ts[k], ts[k - 1]))
    return J


def run_objective_fe(deck_path: Path) -> int:
    bundle = build_fe_problem_from_deck(deck_path, "objective")
    if _fe_driver(bundle) == "stepped":
        from cmad_tpu.cli.fe_common import build_fe_cases
        from cmad_tpu.fem.driver import fe_quasistatic_drive_stepped

        gr = bundle.resolved["residuals"]["global residual"]
        J = 0.0
        for _name, w, ts_case, qoi_c in build_fe_cases(bundle):
            state, _ = fe_quasistatic_drive_stepped(
                bundle.fe_problem, ts_case.tolist(),
                nonlinear_solver_settings=_nls_settings(bundle),
                linear_solver_settings=bundle.resolved["linear solver"],
                max_iters_per_dispatch=gr.get("max iters per dispatch"),
                steps_per_dispatch=gr.get("steps per dispatch"))
            J += w * _accumulate_qoi_over_history(bundle, state, qoi_c,
                                                  ts_case)
    elif _fe_driver(bundle) == "host":
        # the objective VALUE is a primal drive + QoI accumulation, so
        # the host driver serves it honestly (one dispatch per Newton
        # iteration) instead of silently tracing the fused scan the
        # user opted out of
        from cmad_tpu.cli.fe_common import build_fe_cases
        from cmad_tpu.fem.nonlinear_solver import fe_quasistatic_drive_host

        J = 0.0
        for _name, w, ts_case, qoi_c in build_fe_cases(bundle):
            state, _ = fe_quasistatic_drive_host(
                bundle.fe_problem, ts_case.tolist(),
                nonlinear_solver_settings=_nls_settings(bundle),
                linear_solver_settings=bundle.resolved["linear solver"])
            J += w * _accumulate_qoi_over_history(bundle, state, qoi_c,
                                                  ts_case)
    else:
        params_flat, state_init, J_of = build_fe_J_of_params_flat(bundle)
        J = float(jit(J_of)(params_flat, state_init,
                            bundle.fe_problem.kernel_arrays))
    out_dir, prefix, _fmt = resolve_output(bundle.resolved)
    write_resolved_deck(out_dir, prefix, bundle.resolved)
    write_J(out_dir, prefix, J)
    return 0


def _fe_driver(bundle: FEProblemBundle) -> str:
    return bundle.resolved["residuals"]["global residual"].get(
        "driver", "scan")


def _require_sensitivity_driver(bundle: FEProblemBundle,
                                subcommand: str) -> str:
    """Sensitivity subcommands support the scan and stepped drivers
    only; 'host' is primal-only (docs/DECKS.md) — silently tracing the
    fused scan for a user who chose host to avoid fused programs on a
    duration-limited link would be exactly the failure they opted out
    of, so reject it loudly (mirrors the hessian+stepped rejection)."""
    driver = _fe_driver(bundle)
    if driver not in ("scan", "stepped"):
        raise ValueError(
            f"residuals.global residual: driver {driver!r} is not "
            f"available for the {subcommand} subcommand — FE "
            "sensitivities run through the fused scan trajectory "
            "('scan', the default) or the per-step checkpointed "
            "adjoint ('stepped'); the host driver is primal-only")
    return driver


def run_gradient_fe(deck_path: Path) -> int:
    bundle = build_fe_problem_from_deck(deck_path, "gradient")
    _require_sensitivity_driver(bundle, "gradient")
    if _fe_driver(bundle) == "stepped":
        from cmad_tpu.cli.fe_common import build_fe_stepped_vg

        params_flat, state_init, ts, vg = build_fe_stepped_vg(bundle)
        _, grad = vg(params_flat, state_init, ts)
    else:
        params_flat, state_init, J_of = build_fe_J_of_params_flat(bundle)
        grad = np.asarray(jit(jax.grad(J_of, argnums=0))(
            params_flat, state_init, bundle.fe_problem.kernel_arrays))
    out_dir, prefix, fmt = resolve_output(bundle.resolved)
    write_resolved_deck(out_dir, prefix, bundle.resolved)
    write_grad(out_dir, prefix, grad, fmt)
    return 0


def run_hessian_fe(deck_path: Path) -> int:
    bundle = build_fe_problem_from_deck(deck_path, "hessian")
    _require_sensitivity_driver(bundle, "hessian")
    if _fe_driver(bundle) == "stepped":
        # per-step forward-over-reverse HVP columns
        # (fem/stepped_adjoint.py build_fe_stepped_hessian) — the
        # duration-bounded path; parity with the fused-scan hessian is
        # pinned by tests/fem/test_stepped_hessian.py
        from cmad_tpu.cli.fe_common import build_fe_stepped_hessian_fn

        params_flat, state_init, ts, hessian_fn = \
            build_fe_stepped_hessian_fn(bundle)
        hess, _max_asym = hessian_fn(params_flat, state_init, ts)
        hess = np.asarray(hess)
    else:
        params_flat, state_init, J_of = build_fe_J_of_params_flat(bundle)
        hess = np.asarray(jit(jax.hessian(J_of, argnums=0))(
            params_flat, state_init, bundle.fe_problem.kernel_arrays))
    out_dir, prefix, fmt = resolve_output(bundle.resolved)
    write_resolved_deck(out_dir, prefix, bundle.resolved)
    write_hessian(out_dir, prefix, hess, fmt)
    return 0


def run_calibrate_fe(deck_path: Path) -> int:
    bundle = build_fe_problem_from_deck(deck_path, "calibrate")
    _require_sensitivity_driver(bundle, "calibrate")
    stepped = _fe_driver(bundle) == "stepped"
    if stepped:
        from cmad_tpu.cli.fe_common import build_fe_stepped_vg

        params_flat, state_init, ts, vg_stepped = build_fe_stepped_vg(
            bundle)
    else:
        params_flat, state_init, J_of = build_fe_J_of_params_flat(bundle)
    fe_problem = bundle.fe_problem
    models = fe_problem.models_by_block
    fe_arrays = fe_problem.kernel_arrays
    optimizer = bundle.resolved["optimizer"]
    log_params = optimizer["log_params"]

    def set_block_params(x):
        offset = 0
        for model in models.values():
            n = model.parameters.num_active_params
            model.parameters.set_active_values_from_flat(
                x[offset:offset + n], are_canonical=True)
            offset += n

    if stepped:
        def vg(x, state_init, _fe_arrays):
            return vg_stepped(x, state_init, ts)
    else:
        vg = jit(value_and_grad(J_of, argnums=0))
    history: list[dict[str, Any]] = []

    def fun(x):
        J, g = vg(x, state_init, fe_arrays)
        g = np.asarray(g, dtype=np.float64)
        entry: dict[str, Any] = {"J": float(J),
                                 "grad_norm": float(np.linalg.norm(g))}
        if log_params:
            set_block_params(x)
            entry["params"] = _active_values(models)
        history.append(entry)
        return float(J), g

    bounds_list = [b for m in models.values()
                   if m.parameters.num_active_params
                   for b in m.parameters.opt_bounds]
    result = minimize(
        fun,
        resolve_initial_guess(optimizer["initial_guess"],
                              np.asarray(params_flat, dtype=np.float64)),
        jac=True, method=optimizer["algorithm"],
        bounds=[tuple(b) for b in bounds_list] if bounds_list else None,
        options=optimizer["options"])
    set_block_params(result.x)

    out_dir, prefix, _fmt = resolve_output(bundle.resolved)
    materials = bundle.resolved["residuals"]["local residual"]["materials"]
    write_resolved_deck(out_dir, prefix, bundle.resolved)
    write_opt_history(out_dir, prefix, history,
                      _active_paths(models) if log_params else None)
    write_fe_opt_params(out_dir, prefix, materials,
                        {b: m.parameters.values
                         for b, m in models.items()})
    write_fe_active_params(out_dir, prefix, dict(zip(
        _active_paths(models), _active_values(models), strict=True)))
    write_opt_status(out_dir, prefix, optimize_status(result))
    return 0


def _active_values(models) -> list[float]:
    return [float(v) for m in models.values()
            for v in m.parameters.flat_active_values()]


def _active_paths(models) -> list[str]:
    return [f"{block}.{p}" for block, m in models.items()
            for p in active_param_paths(m.parameters)]
