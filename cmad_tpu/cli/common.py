"""Shared helpers for the cmad subcommand orchestrators (MP arm).

Parity: reference ``cmad/cli/common.py:59-148`` (the FE builder half lands
with the fem layer in :mod:`cmad_tpu.cli.fe_common`).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

from cmad_tpu.io.deck import apply_deck_defaults, load_deck
from cmad_tpu.io.deformation import load_history
from cmad_tpu.io.params_builder import build_parameters
from cmad_tpu.io.qoi_data import load_qoi_data
from cmad_tpu.io.registry import resolve_model, resolve_qoi
from cmad_tpu.io.schema import validate_deck
from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.model import Model
from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.qois.qoi import QoI


@dataclass(frozen=True)
class MPProblem:
    resolved: dict[str, Any]
    parameters: Parameters
    model: Model
    F: np.ndarray
    qoi: QoI | None


def _with_material_defaults(params_section: dict[str, Any],
                            model_cls: type[Model]) -> dict[str, Any]:
    merged = dict(params_section)
    for key, default in model_cls.material_defaults().items():
        merged.setdefault(key, default)
    return merged


def build_mp_problem(deck_path: Path, subcommand: str) -> MPProblem:
    """deck -> (resolved, parameters, model, F history, optional QoI)."""
    deck = load_deck(deck_path)
    resolved = apply_deck_defaults(deck)
    validate_deck(resolved, subcommand)

    model_cls = resolve_model(resolved["model"]["name"])
    parameters = build_parameters(
        _with_material_defaults(resolved["parameters"], model_cls))
    def_type = DefType[resolved["model"]["def_type"].upper()]
    model = model_cls.from_deck(resolved["model"], parameters, def_type)

    F = load_history(resolved["deformation"], expected_ndims=model.ndims)

    qoi: QoI | None = None
    if subcommand != "primal":
        qoi_cls = resolve_qoi(resolved["qoi"]["name"])
        if qoi_cls.problem_type != "material_point":
            raise ValueError(
                f"qoi.name {resolved['qoi']['name']!r} is registered for "
                f"problem_type={qoi_cls.problem_type!r}, but the deck has "
                f"problem.type='material_point'")
        data, weight = load_qoi_data(resolved["qoi"])
        qoi = qoi_cls.from_deck(resolved["qoi"], model, data, weight)

    return MPProblem(resolved=resolved, parameters=parameters,
                     model=model, F=F, qoi=qoi)


def resolve_output(resolved: dict[str, Any]) -> tuple[Path, str, str]:
    """(out_dir, prefix, format); creates out_dir. The output block is
    optional — absent means cwd / "" / npy."""
    output = resolved.get("output", {})
    out_dir = Path(output.get("path", "."))
    out_dir.mkdir(parents=True, exist_ok=True)
    return out_dir, output.get("prefix", ""), output.get("format", "npy")
