"""Schema validation: aggregated path-prefixed errors, registered-name
pre-flight checks, per-subcommand section composition.

Mirrors the reference ``tests/io/test_schema.py`` intent.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.io.deck import apply_deck_defaults
from cmad_tpu.io.schema import validate_deck


def _mp_deck(tmp_path):
    F = np.repeat(np.eye(2)[:, :, None], 3, axis=2)
    np.save(tmp_path / "F.npy", F)
    return {
        "problem": {"type": "material_point", "name": "t"},
        "model": {"name": "small_rate_elastic_plastic",
                  "def_type": "plane_stress"},
        "parameters": {"elastic": {"E": {"value": 1.0},
                                   "nu": {"value": 0.3}}},
        "deformation": {"history_file": str(tmp_path / "F.npy")},
        "solver": {"newton": {}},
    }


def test_valid_primal_deck_passes(tmp_path):
    deck = apply_deck_defaults(_mp_deck(tmp_path))
    validate_deck(deck, "primal")


def test_unknown_model_name_preflight(tmp_path):
    deck = _mp_deck(tmp_path)
    deck["model"]["name"] = "hyper_viscoelastic_42"
    with pytest.raises(ValueError, match="model.name"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_missing_model_name(tmp_path):
    deck = _mp_deck(tmp_path)
    del deck["model"]["name"]
    with pytest.raises(ValueError, match="name"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_errors_are_aggregated_with_paths(tmp_path):
    deck = apply_deck_defaults(_mp_deck(tmp_path))
    deck["solver"]["newton"]["max_iters"] = "ten"       # wrong type
    deck["deformation"]["bogus_key"] = 1                # extra key
    with pytest.raises(ValueError) as e:
        validate_deck(deck, "primal")
    msg = str(e.value)
    # both failures are reported, each with its deck path
    assert "solver.newton" in msg
    assert "deformation" in msg


def test_qoi_requires_name(tmp_path):
    deck = apply_deck_defaults(_mp_deck(tmp_path))
    deck["qoi"] = {"data_file": "d.npy"}
    deck["sensitivity"] = {"type": "adjoint"}
    with pytest.raises(ValueError, match="qoi.*name"):
        validate_deck(deck, "objective")


def test_unknown_qoi_name_preflight(tmp_path):
    deck = apply_deck_defaults(_mp_deck(tmp_path))
    deck["qoi"] = {"name": "total_entropy", "data_file": "d.npy"}
    deck["sensitivity"] = {"type": "adjoint"}
    with pytest.raises(ValueError, match="qoi.name"):
        validate_deck(deck, "objective")


def test_subcommand_sections_are_restricted(tmp_path):
    """calibrate-only sections are rejected under primal (and the error
    names them)."""
    deck = apply_deck_defaults(_mp_deck(tmp_path))
    deck["optimizer"] = {"algorithm": "L-BFGS-B"}
    with pytest.raises(ValueError, match="optimizer"):
        validate_deck(deck, "primal")


def test_fe_global_residual_preflight():
    deck = {
        "problem": {"type": "fe", "name": "t"},
        "discretization": {"mesh file": "m.exo"},
        "residuals": {
            "global residual": {"type": "wave_equation"},
            "local residual": {"type": "elastic"},
        },
    }
    with pytest.raises(ValueError, match="global residual"):
        validate_deck(apply_deck_defaults(deck), "primal")
