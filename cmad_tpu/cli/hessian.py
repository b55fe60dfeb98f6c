"""``cmad hessian`` — (J, grad, hess) via direct_adjoint or jvp.

Parity: reference ``cmad/cli/hessian.py:44``.
"""
from __future__ import annotations

from pathlib import Path

from cmad_tpu.cli.common import build_mp_problem, resolve_output
from cmad_tpu.cli.sensitivity import build_sensitivity_driver
from cmad_tpu.io.deck import load_deck, unwrap_top_level
from cmad_tpu.io.writers import (
    write_grad,
    write_hessian,
    write_J,
    write_resolved_deck,
)


def run_hessian(deck_path: Path) -> int:
    deck = unwrap_top_level(load_deck(deck_path))
    problem_type = deck["problem"]["type"]
    if problem_type == "material_point":
        return _run_hessian_mp(deck_path)
    if problem_type == "fe":
        from cmad_tpu.cli.fe_subcommands import run_hessian_fe
        return run_hessian_fe(deck_path)
    raise ValueError(
        f"unsupported problem.type {problem_type!r}; expected "
        f"'material_point' or 'fe'")


def _run_hessian_mp(deck_path: Path) -> int:
    problem = build_mp_problem(deck_path, "hessian")
    assert problem.qoi is not None

    driver = build_sensitivity_driver(
        problem.resolved["sensitivity"], problem.qoi, problem.F,
        problem.resolved["solver"]["newton"], subcommand="hessian")
    x = problem.parameters.flat_active_values(return_canonical=True)
    result = driver.evaluate_hess(x)

    out_dir, prefix, fmt = resolve_output(problem.resolved)
    write_resolved_deck(out_dir, prefix, problem.resolved)
    write_J(out_dir, prefix, result.J)
    write_grad(out_dir, prefix, result.grad, fmt)
    write_hessian(out_dir, prefix, result.hessian, fmt)
    return 0
