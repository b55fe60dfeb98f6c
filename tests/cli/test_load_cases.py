"""Multi-load-case FE objectives (`load cases` deck section).

The FE analogue of the MP multi-experiment calibration (reference
``cmad/calibrations/al7079/multi_experiment_hill_calibration.py``):
the same problem driven through several load schedules, the objective
summing each case's QoI against its own data. Checks here: the summed
objective/gradient decomposes exactly into the per-case runs, the
stepped driver agrees with the scan driver case-by-case, and a
two-depth calibration recovers (Y, S) jointly.
"""
from __future__ import annotations

import json

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.io.exodus import read_results
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType

from tests.fem.test_stepped_adjoint import (  # noqa: F401  (fixture)
    _plastic_deck,
    _write,
    cube_exo,
)

_DEPTHS = {"shallow": 1.0 / 3.0, "deep": 2.0 / 3.0}


@pytest.fixture
def depth_data(tmp_path, cube_exo):
    """Truth displacement histories at two load depths (same step
    count, 2x the step size => 2x the final load)."""
    paths = {}
    for name, dt in _DEPTHS.items():
        out = tmp_path / f"truth_{name}"
        deck = _plastic_deck(cube_exo, out)
        deck["discretization"]["step size"] = dt
        deck_path = _write(tmp_path, deck, f"deck_truth_{name}.yaml")
        assert cmad_main(["primal", str(deck_path)]) == 0
        res = read_results(out / "cube_fe.exo",
                           nodal_field_specs=[FieldSpec("u",
                                                        VarType.VECTOR)])
        data = tmp_path / f"u_{name}.npy"
        np.save(data, res.nodal["u"])
        paths[name] = data
    return paths


def _qoi(data_file):
    return {"name": "fe_displacement_match",
            "data_file": str(data_file), "weight": 1.0e8}


def _multi_deck(tmp_path, cube_exo, depth_data, out, driver,
                active=("Y", "S")):
    deck = _plastic_deck(cube_exo, out, Y=230.0, driver=driver)
    mat = deck["residuals"]["local residual"]["materials"]["all"]
    fs = mat["plastic"]["flow stress"]
    if "Y" in active:
        fs["initial yield"]["Y"]["active"] = True
    if "S" in active:
        fs["hardening"]["voce"]["S"]["active"] = True
    # base schedule = shallow; the deep case overrides step size
    deck["qoi"] = _qoi(depth_data["shallow"])
    deck["load cases"] = [
        {"name": "shallow"},
        {"name": "deep", "step size": _DEPTHS["deep"],
         "qoi": {"data_file": str(depth_data["deep"])}},
    ]
    return deck


def test_multicase_objective_and_gradient_decompose(tmp_path, cube_exo,
                                                    depth_data):
    """J_multi == J_shallow + J_deep and grad likewise, for the scan
    driver; the stepped driver reproduces the multi-case gradient."""
    results = {}
    for name, dt in _DEPTHS.items():
        out = tmp_path / f"single_{name}"
        deck = _plastic_deck(cube_exo, out, Y=230.0)
        deck["discretization"]["step size"] = dt
        mat = deck["residuals"]["local residual"]["materials"]["all"]
        fs = mat["plastic"]["flow stress"]
        fs["initial yield"]["Y"]["active"] = True
        fs["hardening"]["voce"]["S"]["active"] = True
        deck["qoi"] = _qoi(depth_data[name])
        deck_path = _write(tmp_path, deck, f"deck_single_{name}.yaml")
        assert cmad_main(["gradient", str(deck_path)]) == 0
        assert cmad_main(["objective", str(deck_path)]) == 0
        results[name] = (
            np.load(out / "grad.npy"),
            json.loads((out / "J.json").read_text())["J"])

    multi = {}
    for driver in ("scan", "stepped"):
        out = tmp_path / f"multi_{driver}"
        deck = _multi_deck(tmp_path, cube_exo, depth_data, out, driver)
        deck_path = _write(tmp_path, deck, f"deck_multi_{driver}.yaml")
        assert cmad_main(["gradient", str(deck_path)]) == 0
        assert cmad_main(["objective", str(deck_path)]) == 0
        multi[driver] = (
            np.load(out / "grad.npy"),
            json.loads((out / "J.json").read_text())["J"])

    g_sum = results["shallow"][0] + results["deep"][0]
    J_sum = results["shallow"][1] + results["deep"][1]
    assert np.linalg.norm(g_sum) > 0.0
    np.testing.assert_allclose(multi["scan"][0], g_sum, rtol=1e-8)
    assert np.isclose(multi["scan"][1], J_sum, rtol=1e-10)
    np.testing.assert_allclose(multi["stepped"][0], multi["scan"][0],
                               rtol=5e-5)
    assert np.isclose(multi["stepped"][1], multi["scan"][1], rtol=5e-6)


def test_multicase_calibration_recovers_Y_and_S(tmp_path, cube_exo,
                                                depth_data):
    """Two depths jointly identify (Y, S) — the designed answer to the
    round-4 single-ramp identifiability study."""
    out = tmp_path / "cal_multi"
    deck = _multi_deck(tmp_path, cube_exo, depth_data, out, None)
    mat = deck["residuals"]["local residual"]["materials"]["all"]
    # start S off-truth as well (truth: Y=200, S=200)
    mat["plastic"]["flow stress"]["hardening"]["voce"]["S"]["value"] = 150.0
    deck["optimizer"] = {"algorithm": "L-BFGS-B",
                         "options": {"maxiter": 25}}
    deck_path = _write(tmp_path, deck, "deck_cal_multi.yaml")
    assert cmad_main(["calibrate", str(deck_path)]) == 0
    opt = yaml.safe_load((out / "opt_params.yaml").read_text())
    fs = opt["all"]["plastic"]["flow stress"]
    Y_fit = float(fs["initial yield"]["Y"]["value"])
    S_fit = float(fs["hardening"]["voce"]["S"]["value"])
    hist = json.loads((out / "opt_history.json").read_text())
    assert hist["history"][-1]["J"] < 1e-5 * hist["history"][0]["J"]
    assert abs(Y_fit - 200.0) / 200.0 < 5e-3, Y_fit
    assert abs(S_fit - 200.0) / 200.0 < 5e-2, S_fit
