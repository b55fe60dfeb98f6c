"""The reference's own example decks run verbatim through cmad_tpu.

A user of the reference should be able to point `cmad` at their
existing decks unchanged. Skipped when the reference checkout is not
mounted.
"""
from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not mounted")


def _stage(tmp_path, deck_name, mesh_name):
    shutil.copy(REF / deck_name, tmp_path / deck_name)
    (tmp_path / "meshes").mkdir(exist_ok=True)
    src = REF / "meshes" / mesh_name
    if not src.exists():
        pytest.skip(f"reference mesh {mesh_name} not present")
    shutil.copy(src, tmp_path / "meshes" / mesh_name)


def _make_cube_mesh(tmp_path):
    from cmad_tpu.fem.mesh import StructuredHexMesh
    from cmad_tpu.io.exodus import ExodusWriter

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    (tmp_path / "meshes").mkdir(exist_ok=True)
    ExodusWriter(tmp_path / "meshes" / "cube_hex_8.exo", mesh).close()


def test_uniaxial_deck_runs_verbatim(tmp_path, monkeypatch):
    from cmad_tpu.cli.main import main

    shutil.copy(REF / "elastic_plastic_uniaxial.yaml", tmp_path / "d.yaml")
    _make_cube_mesh(tmp_path)
    monkeypatch.chdir(tmp_path)
    assert main(["primal", "d.yaml"]) == 0
    out = tmp_path / "results"
    assert out.exists()
    exo = list(out.glob("**/*.exo")) + list(out.glob("**/*.e"))
    assert exo, f"no exodus output in {sorted(out.iterdir())}"


def test_mixed_elastic_deck_runs_verbatim(tmp_path, monkeypatch):
    from cmad_tpu.cli.main import main

    shutil.copy(REF / "mixed_elastic.yaml", tmp_path / "d.yaml")
    _make_cube_mesh(tmp_path)
    monkeypatch.chdir(tmp_path)
    assert main(["primal", "d.yaml"]) == 0


def test_notch_deck_validates_and_builds(tmp_path, monkeypatch):
    """Deck -> schema -> FE problem build (no solve: the notch deck
    takes minutes; the full-solve compatibility run lives in
    benchmarks/notch_hosford/)."""
    from cmad_tpu.cli.fe_common import build_fe_problem_from_deck

    _stage(tmp_path, "notch_hosford.yaml", "notch.exo")
    shutil.copy(REF / "notch_hosford.yaml", tmp_path / "d.yaml")
    monkeypatch.chdir(tmp_path)
    bundle = build_fe_problem_from_deck("d.yaml", "primal")
    assert bundle.fe_problem.dof_map.num_total_dofs > 0
    assert len(bundle.t_schedule) >= 2
    assert np.isfinite(list(bundle.t_schedule)).all()


def test_mixed_plastic_deck_runs_verbatim(tmp_path, monkeypatch):
    """Full solve of the reference's hardest deck (mixed u-p J2
    plasticity, 5 load steps) — all steps must converge.
    Truth cross-check: |U| from the CPU f64 direct solve."""
    import json

    from cmad_tpu.cli.main import main

    shutil.copy(REF / "mixed_plastic.yaml", tmp_path / "d.yaml")
    _make_cube_mesh(tmp_path)
    monkeypatch.chdir(tmp_path)
    assert main(["primal", "d.yaml"]) == 0
    solver = json.loads((tmp_path / "results" / "solver.json").read_text())
    steps = solver if isinstance(solver, list) else solver["steps"]
    assert len(steps) == 5
    for step in steps:
        assert step["final_residual"] < 1e-6 * step["initial_residual"]


def test_pyamg_deck_migrates_and_runs(tmp_path, monkeypatch):
    """A reference deck naming the pyamg preconditioner arm (reference
    cmad/io/schemas/linear_solver.yaml 'pyamg' const +
    cmad/fem/sparse_solve.py:442 scipy_amg_cg) runs end to end: mapped
    to the device-native two_level arm with the provenance recorded in
    deck.resolved.yaml."""
    import yaml

    from cmad_tpu.cli.main import main

    deck = yaml.safe_load((REF / "elastic_plastic_uniaxial.yaml")
                          .read_text())
    deck["linear solver"] = {"type": "cg", "rtol": 1.0e-8,
                             "preconditioner": {
                                 "type": "pyamg",
                                 "kwargs": {"max_levels": 3}}}
    (tmp_path / "d.yaml").write_text(yaml.safe_dump(deck))
    _make_cube_mesh(tmp_path)
    monkeypatch.chdir(tmp_path)
    with pytest.warns(UserWarning, match="pyamg.*two_level"):
        assert main(["primal", "d.yaml"]) == 0

    resolved = yaml.safe_load(
        (tmp_path / "results" / "deck.resolved.yaml").read_text())
    ls = resolved["linear solver"]
    assert ls["preconditioner"]["type"] == "two_level"
    assert any("pyamg" in note for note in ls["migrated"])
    assert any("max_levels" in note for note in ls["migrated"])
