"""FE subcommand stubs — replaced when the fem layer lands."""
from __future__ import annotations

from pathlib import Path

_MSG = ("FE problems are not yet wired into this build of cmad_tpu; "
        "the fem layer is under construction")


def run_primal_fe(deck_path: Path) -> int:
    raise NotImplementedError(_MSG)


def run_objective_fe(deck_path: Path) -> int:
    raise NotImplementedError(_MSG)


def run_gradient_fe(deck_path: Path) -> int:
    raise NotImplementedError(_MSG)


def run_hessian_fe(deck_path: Path) -> int:
    raise NotImplementedError(_MSG)


def run_calibrate_fe(deck_path: Path) -> int:
    raise NotImplementedError(_MSG)
