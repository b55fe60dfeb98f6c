"""``cmad calibrate`` — scipy.optimize over the active parameters.

Parity: reference ``cmad/cli/calibrate.py:57-194`` (MP arm; the FE arm
lands with the fem layer). Canonical coordinates flow through the
optimizer; bounds come from the parameter transforms; per-fun-call
history is logged to ``opt_history.json``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np
from jax.tree_util import tree_flatten_with_path
from scipy.optimize import OptimizeResult, minimize

from cmad_tpu.cli.common import build_mp_problem, resolve_output
from cmad_tpu.cli.sensitivity import build_sensitivity_driver
from cmad_tpu.io.deck import load_deck, unwrap_top_level
from cmad_tpu.io.writers import (
    write_opt_history,
    write_opt_params,
    write_opt_status,
    write_resolved_deck,
)
from cmad_tpu.parameters.parameters import Parameters


def run_calibrate(deck_path: Path) -> int:
    deck = unwrap_top_level(load_deck(deck_path))
    problem_type = deck["problem"]["type"]
    if problem_type == "material_point":
        return _run_calibrate_mp(deck_path)
    if problem_type == "fe":
        from cmad_tpu.cli.fe_subcommands import run_calibrate_fe
        return run_calibrate_fe(deck_path)
    raise ValueError(
        f"unsupported problem.type {problem_type!r}; expected "
        f"'material_point' or 'fe'")


def _run_calibrate_mp(deck_path: Path) -> int:
    problem = build_mp_problem(deck_path, "calibrate")
    assert problem.qoi is not None
    parameters = problem.parameters

    driver = build_sensitivity_driver(
        problem.resolved["sensitivity"], problem.qoi, problem.F,
        problem.resolved["solver"]["newton"], subcommand="calibrate")

    optimizer = problem.resolved["optimizer"]
    x0 = resolve_initial_guess(
        optimizer["initial_guess"],
        parameters.flat_active_values(return_canonical=True))
    log_params = optimizer["log_params"]

    history: list[dict[str, Any]] = []

    def fun(x):
        r = driver.evaluate_grad(x)
        entry: dict[str, Any] = {
            "J": float(r.J),
            "grad_norm": float(np.linalg.norm(r.grad)),
        }
        if log_params:
            entry["params"] = parameters.flat_active_values(
                return_canonical=False).tolist()
        history.append(entry)
        return r.J, r.grad

    result = minimize(
        fun, x0, jac=True,
        method=optimizer["algorithm"],
        bounds=[tuple(b) for b in parameters.opt_bounds],
        options=optimizer["options"])

    parameters.set_active_values_from_flat(result.x, are_canonical=True)

    out_dir, prefix, _fmt = resolve_output(problem.resolved)
    write_resolved_deck(out_dir, prefix, problem.resolved)
    write_opt_history(
        out_dir, prefix, history,
        active_param_paths(parameters) if log_params else None)
    write_opt_params(out_dir, prefix, problem.resolved["parameters"],
                     parameters.values)
    write_opt_status(out_dir, prefix, optimize_status(result))
    return 0


def resolve_initial_guess(spec: Any, init_from_deck: np.ndarray) -> np.ndarray:
    if spec == "from_deck":
        return init_from_deck
    return np.asarray(spec, dtype=np.float64)


def optimize_status(result: OptimizeResult) -> dict[str, Any]:
    status: dict[str, Any] = {
        "success": bool(result.success),
        "status": int(result.status),
        "message": str(result.message),
        "fun": float(result.fun),
    }
    for name in ("nfev", "njev", "nhev", "nit"):
        value = getattr(result, name, None)
        if value is not None:
            status[name] = int(value)
    return status


def active_param_paths(parameters: Parameters) -> list[str]:
    """Dotted-path labels for the active parameters (spaces -> _).

    Expanded per *scalar* (array-valued leaves like Barlat coefficient
    vectors contribute one ``path[i]`` entry per component) so indices
    line up with ``Parameters.active_idx``, which indexes the ravelled
    value vector.
    """
    flat, _ = tree_flatten_with_path(parameters.values)
    paths = []
    for key_path, v in flat:
        parts = [str(getattr(k, "key", k)).replace(" ", "_")
                 for k in key_path]
        base = ".".join(parts)
        size = int(np.asarray(v).size)
        if size == 1:
            paths.append(base)
        else:
            paths.extend(f"{base}[{i}]" for i in range(size))
    return [paths[i] for i in parameters.active_idx]
