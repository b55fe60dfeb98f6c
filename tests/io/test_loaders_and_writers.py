"""IO breadth: QoI data loaders, params builder, artifact writers.

Mirrors the reference's ``tests/io`` coverage of the loader/writer
plumbing: extension dispatch and error text of the QoI data loaders,
deck parameters-section splitting into value/active/transform trees,
and the MP/calibrate artifact writers' on-disk formats.
"""
from __future__ import annotations

import json

import numpy as np
import pytest
import yaml

from cmad_tpu.io.params_builder import build_parameters
from cmad_tpu.io.qoi_data import (
    load_displacement_data,
    load_qoi_data,
    load_reaction_data,
)
from cmad_tpu.io.writers import (
    write_grad,
    write_J,
    write_opt_history,
    write_opt_status,
    write_resolved_deck,
)


# ----------------------------------------------------------------------
# loaders
# ----------------------------------------------------------------------
def test_load_qoi_data_npy_with_inline_weight(tmp_path):
    data = np.random.RandomState(0).normal(size=(3, 3, 5))
    np.save(tmp_path / "d.npy", data)
    got, w = load_qoi_data({"data_file": str(tmp_path / "d.npy"),
                            "weight": [[1, 0, 0], [0, 1, 0], [0, 0, 0]]})
    np.testing.assert_allclose(got, data)
    assert w.shape == (3, 3) and w[0, 0] == 1.0 and w[2, 2] == 0.0


def test_load_qoi_data_missing_file_names_field(tmp_path):
    with pytest.raises(FileNotFoundError, match="qoi.data_file"):
        load_qoi_data({"data_file": str(tmp_path / "nope.npy"),
                       "weight": [[1]]})


def test_load_qoi_data_rejects_non_npy(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("1,2\n")
    with pytest.raises(ValueError, match=".npy"):
        load_qoi_data({"data_file": str(p), "weight": [[1]]})


def test_load_displacement_from_exodus(tmp_path):
    from cmad_tpu.fem.mesh import StructuredHexMesh
    from cmad_tpu.io.exodus import ExodusWriter
    from cmad_tpu.io.results import component_names
    from cmad_tpu.models.var_types import VarType

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    comps = component_names("u", VarType.VECTOR)
    w = ExodusWriter(tmp_path / "u.exo", mesh, nodal_var_names=comps)
    u = np.arange(8 * 3, dtype=float).reshape(8, 3)
    w.write_step(1.0, nodal_values={c: u[:, k]
                                    for k, c in enumerate(comps)})
    w.close()

    arr = load_displacement_data({"data_file": str(tmp_path / "u.exo")})
    assert arr.shape == (1, 8, 3)
    np.testing.assert_allclose(arr[0], u)


def test_load_reaction_csv_and_npy(tmp_path):
    series = np.array([0.0, 1.5, 3.0])
    np.savetxt(tmp_path / "r.csv", series)
    np.save(tmp_path / "r.npy", series)
    np.testing.assert_allclose(
        load_reaction_data({"data_file": str(tmp_path / "r.csv")}), series)
    np.testing.assert_allclose(
        load_reaction_data({"data_file": str(tmp_path / "r.npy")}), series)
    bad = tmp_path / "r.dat"
    bad.write_text("1 2\n")
    with pytest.raises(ValueError, match="unsupported extension"):
        load_reaction_data({"data_file": str(bad)})


# ----------------------------------------------------------------------
# params builder
# ----------------------------------------------------------------------
def test_build_parameters_splits_trees():
    section = {
        "elastic": {"E": {"value": 100.0},
                    "nu": {"value": 0.3, "active": False}},
        "plastic": {"Y": {"value": 2.0, "active": True,
                          "transform": {"log": 2.0}},
                    "S": {"value": 5.0, "active": True,
                          "transform": {"bounds": [1.0, 9.0]}}},
    }
    params = build_parameters(section)
    vals = params.values
    assert float(vals["elastic"]["E"]) == 100.0
    assert float(vals["plastic"]["Y"]) == 2.0

    flat = np.asarray(params.flat_active_values())
    assert flat.shape == (2,)  # Y and S only

    canon = np.asarray(params.flat_active_values(return_canonical=True))
    # bounds transform maps the midpoint of [1, 9] to 0
    assert canon.shape == (2,)
    s_canon = canon[np.argsort(flat)][-1]  # S = 5.0 is the larger value
    np.testing.assert_allclose(s_canon, 0.0, atol=1e-12)


def test_build_parameters_rejects_bad_transform():
    with pytest.raises((ValueError, KeyError)):
        build_parameters({"Y": {"value": 1.0, "active": True,
                                "transform": {"sigmoid": 1.0}}})


# ----------------------------------------------------------------------
# writers
# ----------------------------------------------------------------------
def test_writers_emit_expected_artifacts(tmp_path):
    write_J(tmp_path, "", 1.25)
    assert json.loads((tmp_path / "J.json").read_text())["J"] == 1.25

    write_grad(tmp_path, "", np.array([1.0, 2.0]), "text")
    grad = np.loadtxt(tmp_path / "grad.csv", delimiter=",")
    np.testing.assert_allclose(grad, [1.0, 2.0])

    write_resolved_deck(tmp_path, "", {"problem": {"type": "fe"}})
    back = yaml.safe_load((tmp_path / "deck.resolved.yaml").read_text())
    assert back["problem"]["type"] == "fe"

    write_opt_history(tmp_path, "",
                      [{"iteration": 0, "J": 1.0, "grad_norm": 0.5,
                        "params": [1.0, 2.0]}],
                      ["plastic/Y", "plastic/S"])
    hist = json.loads((tmp_path / "opt_history.json").read_text())
    assert hist["history"][0]["J"] == 1.0
    assert hist["active_param_paths"] == ["plastic/Y", "plastic/S"]

    write_opt_status(tmp_path, "", {"success": True, "status": 0,
                                    "message": "ok", "nit": 2})
    status = json.loads((tmp_path / "opt_status.json").read_text())
    assert status["success"] is True and status["nit"] == 2


def test_writer_prefix_is_applied(tmp_path):
    write_J(tmp_path, "runA_", 2.0)
    assert (tmp_path / "runA_J.json").exists()
