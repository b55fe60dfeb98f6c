"""Every shipped example deck validates and builds (deck-rot guard).

The reference-deck compatibility suite covers the UPSTREAM examples;
this sweep covers OUR `examples/` directory: each deck must pass
schema validation and build a complete FEProblem against its shipped
mesh. No solves — full-solve coverage for these configurations lives
in the fem/cli suites and benchmarks.
"""
from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
EXAMPLES = REPO / "examples"
DECKS = sorted(p.name for p in EXAMPLES.glob("*.yaml"))


@pytest.mark.parametrize("deck_name", DECKS)
def test_example_deck_validates_and_builds(deck_name, tmp_path,
                                           monkeypatch):
    import yaml

    from cmad_tpu.cli.fe_common import build_fe_problem_from_deck

    deck = yaml.safe_load((EXAMPLES / deck_name).read_text())
    mesh_rel = Path(deck["discretization"]["mesh file"])
    src = EXAMPLES / mesh_rel
    assert src.exists(), \
        f"{deck_name} references {mesh_rel}, not shipped in examples/"
    (tmp_path / mesh_rel.parent).mkdir(parents=True, exist_ok=True)
    shutil.copy(src, tmp_path / mesh_rel)
    shutil.copy(EXAMPLES / deck_name, tmp_path / "d.yaml")
    monkeypatch.chdir(tmp_path)

    bundle = build_fe_problem_from_deck("d.yaml", "primal")
    fe = bundle.fe_problem
    assert fe.dof_map.num_total_dofs > 0
    assert np.isfinite(list(bundle.t_schedule)).all()
    assert len(bundle.t_schedule) >= 2
