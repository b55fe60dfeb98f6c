"""``cmad`` CLI entry point: argparse dispatcher.

Parity: reference ``cmad/cli/main.py:21``.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from cmad_tpu.cli.calibrate import run_calibrate
from cmad_tpu.cli.gradient import run_gradient
from cmad_tpu.cli.hessian import run_hessian
from cmad_tpu.cli.objective import run_objective
from cmad_tpu.cli.primal import run_primal

_SUBCOMMANDS = {
    "primal": (run_primal, "Run a forward (primal) solve."),
    "objective": (run_objective,
                  "Run a forward solve and accumulate the QoI J."),
    "gradient": (run_gradient,
                 "Compute (J, grad) via the chosen sensitivity strategy."),
    "hessian": (run_hessian,
                "Compute (J, grad, hess) via direct_adjoint or jvp."),
    "calibrate": (run_calibrate,
                  "Optimize active parameters against the QoI via scipy."),
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="cmad")
    sub = parser.add_subparsers(dest="subcommand", required=True)
    for name, (_fn, help_text) in _SUBCOMMANDS.items():
        p = sub.add_parser(name, help=help_text)
        p.add_argument("deck", type=Path, help="Path to the YAML deck.")

    args = parser.parse_args(argv)
    fn, _ = _SUBCOMMANDS[args.subcommand]
    return fn(args.deck)


def console_main() -> None:
    sys.exit(main())


if __name__ == "__main__":
    sys.exit(main())
