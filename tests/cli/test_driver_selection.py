"""Deck-selectable FE driver: `driver: host` matches the scan driver."""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.io.exodus import ExodusWriter, read_results
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType


@pytest.fixture
def deck(tmp_path):
    (tmp_path / "meshes").mkdir()
    ExodusWriter(tmp_path / "meshes" / "cube.exo",
                 StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))).close()
    d = yaml.safe_load(
        (Path(__file__).resolve().parents[2]
         / "examples/elastic_plastic_uniaxial.yaml").read_text())
    d["discretization"]["mesh file"] = "meshes/cube.exo"
    return tmp_path, d


def test_host_driver_matches_scan(deck, monkeypatch):
    tmp_path, d = deck
    monkeypatch.chdir(tmp_path)
    u = {}
    for driver in ("scan", "host"):
        d["residuals"]["global residual"]["driver"] = driver
        d["output"] = {"path": f"out_{driver}"}
        Path(f"d_{driver}.yaml").write_text(yaml.safe_dump(d))
        assert cmad_main(["primal", f"d_{driver}.yaml"]) == 0
        res = read_results(
            next(Path(f"out_{driver}").glob("*.exo")),
            nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
        u[driver] = res.nodal["u"]
    np.testing.assert_allclose(u["host"], u["scan"], rtol=1e-10,
                               atol=1e-12)


def test_stepped_driver_matches_scan(deck, monkeypatch):
    """`driver: stepped` (with and without the per-dispatch iteration
    cap) produces the scan driver's trajectory through the CLI."""
    tmp_path, d = deck
    monkeypatch.chdir(tmp_path)
    u = {}
    cases = {"scan": {}, "stepped": {}, "stepped_k": {
        "driver_name": "stepped", "max iters per dispatch": 2}}
    for tag, extra in cases.items():
        gr = d["residuals"]["global residual"]
        gr["driver"] = extra.get("driver_name",
                                 "stepped" if "stepped" in tag else tag)
        gr.pop("max iters per dispatch", None)
        if "max iters per dispatch" in extra:
            gr["max iters per dispatch"] = extra["max iters per dispatch"]
        d["output"] = {"path": f"out_{tag}"}
        Path(f"d_{tag}.yaml").write_text(yaml.safe_dump(d))
        assert cmad_main(["primal", f"d_{tag}.yaml"]) == 0
        res = read_results(
            next(Path(f"out_{tag}").glob("*.exo")),
            nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
        u[tag] = res.nodal["u"]
    np.testing.assert_allclose(u["stepped"], u["scan"], rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(u["stepped_k"], u["scan"], rtol=1e-10,
                               atol=1e-12)


def test_unknown_driver_rejected(deck, monkeypatch):
    tmp_path, d = deck
    monkeypatch.chdir(tmp_path)
    d["residuals"]["global residual"]["driver"] = "warp"
    Path("d.yaml").write_text(yaml.safe_dump(d))
    with pytest.raises(ValueError, match="driver"):
        cmad_main(["primal", "d.yaml"])


def test_windowed_stepped_driver_matches_scan(deck, monkeypatch):
    """`driver: stepped` + `steps per dispatch: W` batches W time steps
    into one device program through the CLI and reproduces the scan
    trajectory."""
    tmp_path, d = deck
    monkeypatch.chdir(tmp_path)
    u = {}
    for tag, extra in {"scan": {}, "stepped_w": {
            "driver_name": "stepped", "steps per dispatch": 2}}.items():
        gr = d["residuals"]["global residual"]
        gr["driver"] = extra.get("driver_name", tag)
        gr.pop("steps per dispatch", None)
        if "steps per dispatch" in extra:
            gr["steps per dispatch"] = extra["steps per dispatch"]
        d["output"] = {"path": f"out_w_{tag}"}
        Path(f"d_w_{tag}.yaml").write_text(yaml.safe_dump(d))
        assert cmad_main(["primal", f"d_w_{tag}.yaml"]) == 0
        res = read_results(
            next(Path(f"out_w_{tag}").glob("*.exo")),
            nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
        u[tag] = res.nodal["u"]
    np.testing.assert_allclose(u["stepped_w"], u["scan"], rtol=1e-10,
                               atol=1e-12)
