"""``cmad objective`` — forward solve + QoI accumulation.

Parity: reference ``cmad/cli/objective.py:39``.
"""
from __future__ import annotations

from pathlib import Path

from cmad_tpu.cli.common import build_mp_problem, resolve_output
from cmad_tpu.cli.primal import run_primal_pass
from cmad_tpu.io.deck import load_deck, unwrap_top_level
from cmad_tpu.io.writers import (
    write_cauchy,
    write_J,
    write_resolved_deck,
    write_solver_log,
    write_xi,
)


def run_objective(deck_path: Path) -> int:
    deck = unwrap_top_level(load_deck(deck_path))
    problem_type = deck["problem"]["type"]
    if problem_type == "material_point":
        return _run_objective_mp(deck_path)
    if problem_type == "fe":
        from cmad_tpu.cli.fe_subcommands import run_objective_fe
        return run_objective_fe(deck_path)
    raise ValueError(
        f"unsupported problem.type {problem_type!r}; expected "
        f"'material_point' or 'fe'")


def _run_objective_mp(deck_path: Path) -> int:
    problem = build_mp_problem(deck_path, "objective")
    assert problem.qoi is not None
    newton_kwargs = problem.resolved["solver"]["newton"]
    cauchy, xi_traj, solver_log, J = run_primal_pass(
        problem.model, problem.F, newton_kwargs, qoi=problem.qoi)

    out_dir, prefix, fmt = resolve_output(problem.resolved)
    write_cauchy(out_dir, prefix, cauchy, fmt)
    write_xi(out_dir, prefix, xi_traj, problem.model.layout, fmt)
    write_solver_log(out_dir, prefix, solver_log)
    write_resolved_deck(out_dir, prefix, problem.resolved)
    write_J(out_dir, prefix, J)
    return 0
