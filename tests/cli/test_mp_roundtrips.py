"""End-to-end CLI round-trips (material point).

Mirrors the reference ``tests/cli`` strategy: write a deck + data files
into a tempdir, invoke ``cmad_tpu.cli.main.main([...])``, and assert on
the emitted artifacts.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic

from tests.support.drivers import run_strain_controlled_history
from tests.support.problems import J2AnalyticalProblem

NUM_STEPS = 20


def _params_section():
    return {
        "elastic": {"E": {"value": 200e3}, "nu": {"value": 0.3}},
        "plastic": {
            "effective stress": {"J2": {"value": 0.0}},
            "flow stress": {
                "initial yield": {
                    "Y": {"value": 200.0, "active": True,
                          "transform": {"log": 200.0}}},
                "hardening": {
                    "voce": {
                        "S": {"value": 200.0, "active": True,
                              "transform": {"bounds": [100.0, 300.0]}},
                        "D": {"value": 20.0, "active": True,
                              "transform": {"bounds": [10.0, 30.0]}}}}}},
    }


def _ramp_F(num_steps=NUM_STEPS):
    """Plane-stress eps_xx ramp to 1.5% (passes through yield)."""
    eps = np.r_[0.0, np.linspace(0.0008, 0.015, num_steps)]
    F = np.repeat(np.eye(2)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    return F


@pytest.fixture
def workspace(tmp_path):
    """Deck + drive + synthetic data files in a tempdir."""
    F = _ramp_F()
    np.save(tmp_path / "F.npy", F)

    # truth data from the model itself (plus an offset for nonzero J)
    problem = J2AnalyticalProblem(scale_params=False)
    model = SmallRateElasticPlastic(problem.J2_parameters,
                                    def_type=DefType.PLANE_STRESS)
    cauchy, _ = run_strain_controlled_history(model, F)
    np.save(tmp_path / "data.npy", cauchy)

    deck = {
        "problem": {"type": "material_point", "name": "roundtrip"},
        "model": {"name": "small_rate_elastic_plastic",
                  "def_type": "plane_stress"},
        "parameters": _params_section(),
        "deformation": {"history_file": str(tmp_path / "F.npy")},
        "solver": {"newton": {}},
        "qoi": {"name": "calibration",
                "data_file": str(tmp_path / "data.npy"),
                "weight": [[1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0],
                           [0.0, 0.0, 0.0]]},
        "sensitivity": {"type": "adjoint"},
        "output": {"path": str(tmp_path / "out")},
    }
    return tmp_path, deck, cauchy


def _write_deck(tmp_path, deck, drop=()):
    deck = {k: v for k, v in deck.items() if k not in drop}
    path = tmp_path / "deck.yaml"
    path.write_text(yaml.safe_dump(deck))
    return path


def test_primal_roundtrip(workspace):
    tmp_path, deck, cauchy_true = workspace
    deck_path = _write_deck(tmp_path, deck,
                            drop=("qoi", "sensitivity"))
    assert cmad_main(["primal", str(deck_path)]) == 0

    out = tmp_path / "out"
    written = np.load(out / "cauchy.npy")
    assert np.allclose(written, cauchy_true, atol=1e-8)
    solver_log = json.loads((out / "solver.json").read_text())
    assert len(solver_log) == NUM_STEPS
    assert all(e["final_residual"] < 1e-12 for e in solver_log)
    assert (out / "deck.resolved.yaml").exists()
    xi = np.load(out / "xi.npy")
    assert xi.shape[0] == NUM_STEPS + 1
    # alpha grows once plastic
    assert xi[-1, 6] > 0.0


def test_objective_roundtrip(workspace):
    tmp_path, deck, _ = workspace
    deck_path = _write_deck(tmp_path, deck, drop=("sensitivity",))
    assert cmad_main(["objective", str(deck_path)]) == 0
    J = json.loads((tmp_path / "out" / "J.json").read_text())["J"]
    # data came from the same parameters: perfect match
    assert J < 1e-12


def test_gradient_hessian_cross_check(workspace):
    tmp_path, deck, _ = workspace
    # offset the parameters so J, grad are nonzero
    deck["parameters"]["plastic"]["flow stress"]["initial yield"]["Y"][
        "value"] = 220.0

    grads = {}
    for strategy in ("adjoint", "direct", "jvp"):
        deck["sensitivity"] = {"type": strategy}
        deck["output"] = {"path": str(tmp_path / f"out_{strategy}")}
        deck_path = _write_deck(tmp_path, deck)
        assert cmad_main(["gradient", str(deck_path)]) == 0
        grads[strategy] = np.load(
            tmp_path / f"out_{strategy}" / "grad.npy")

    assert np.allclose(grads["adjoint"], grads["direct"], rtol=1e-8)
    assert np.allclose(grads["adjoint"], grads["jvp"], rtol=1e-6)

    hessians = {}
    for strategy in ("direct_adjoint", "jvp"):
        deck["sensitivity"] = {"type": strategy}
        deck["output"] = {"path": str(tmp_path / f"hess_{strategy}")}
        deck_path = _write_deck(tmp_path, deck)
        assert cmad_main(["hessian", str(deck_path)]) == 0
        hessians[strategy] = np.load(
            tmp_path / f"hess_{strategy}" / "hess.npy")
    assert np.allclose(hessians["direct_adjoint"], hessians["jvp"],
                       rtol=1e-6, atol=1e-10)


def test_hessian_rejects_first_order_strategy(workspace):
    tmp_path, deck, _ = workspace
    deck["sensitivity"] = {"type": "adjoint"}
    deck_path = _write_deck(tmp_path, deck)
    with pytest.raises(ValueError, match="direct_adjoint"):
        cmad_main(["hessian", str(deck_path)])


def test_calibrate_recovers_truth(workspace):
    tmp_path, deck, _ = workspace
    # start away from the data-generating truth
    fs = deck["parameters"]["plastic"]["flow stress"]
    fs["initial yield"]["Y"]["value"] = 160.0
    fs["hardening"]["voce"]["S"]["value"] = 150.0
    fs["hardening"]["voce"]["D"]["value"] = 25.0
    deck["sensitivity"] = {"type": "adjoint"}
    deck["optimizer"] = {"algorithm": "L-BFGS-B",
                         "options": {"maxiter": 60}}
    deck_path = _write_deck(tmp_path, deck)
    assert cmad_main(["calibrate", str(deck_path)]) == 0

    out = tmp_path / "out"
    status = json.loads((out / "opt_status.json").read_text())
    assert status["fun"] < 1e-6
    opt_params = yaml.safe_load((out / "opt_params.yaml").read_text())
    fs_opt = opt_params["plastic"]["flow stress"]
    assert abs(fs_opt["initial yield"]["Y"]["value"] - 200.0) < 1.0
    history = json.loads((out / "opt_history.json").read_text())
    assert len(history["history"]) >= 2
    assert "active_param_paths" in history


def test_schema_rejects_bad_deck(workspace):
    tmp_path, deck, _ = workspace
    deck["model"]["def_type"] = "bogus"
    deck_path = _write_deck(tmp_path, deck, drop=("qoi", "sensitivity"))
    with pytest.raises(ValueError, match="deck validation failed"):
        cmad_main(["primal", str(deck_path)])


def test_unknown_model_rejected(workspace):
    tmp_path, deck, _ = workspace
    deck["model"]["name"] = "not_a_model"
    deck_path = _write_deck(tmp_path, deck, drop=("qoi", "sensitivity"))
    with pytest.raises(ValueError, match="not registered"):
        cmad_main(["primal", str(deck_path)])


def test_uniaxial_calibration_roundtrip(tmp_path):
    """uniaxial_calibration QoI recovers the yield stress from axial
    stress + off-axis stretch data (parity: reference
    cmad/qois/uniaxial_calibration.py via the deck CLI)."""
    num_steps = 20
    eps = np.r_[0.0, np.linspace(0.0008, 0.012, num_steps)]
    F = np.repeat(np.eye(1)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    np.save(tmp_path / "F.npy", F)

    def deck_for(Y, active, out):
        params = _params_section()
        yld = params["plastic"]["flow stress"]["initial yield"]["Y"]
        yld["value"] = Y
        if not active:
            for leaf in (yld,
                         params["plastic"]["flow stress"]["hardening"]
                         ["voce"]["S"],
                         params["plastic"]["flow stress"]["hardening"]
                         ["voce"]["D"]):
                leaf.pop("active", None)
                leaf.pop("transform", None)
        return {
            "problem": {"type": "material_point", "name": "uniax"},
            "model": {"name": "small_rate_elastic_plastic",
                      "def_type": "uniaxial_stress"},
            "parameters": params,
            "deformation": {"history_file": str(tmp_path / "F.npy")},
            "solver": {"newton": {}},
            "output": {"path": str(out)},
        }

    # truth run at Y=200 -> data rows [sigma_axial, e_off1, e_off2]
    truth = deck_for(200.0, active=False, out=tmp_path / "truth")
    assert cmad_main(["primal", str(_write_deck(tmp_path, truth))]) == 0
    cauchy = np.load(tmp_path / "truth" / "cauchy.npy")
    xi = np.load(tmp_path / "truth" / "xi.npy")
    data = np.stack([cauchy[0, 0, :], xi[:, 7] - 1.0, xi[:, 8] - 1.0])
    np.save(tmp_path / "data.npy", data)

    # calibrate from a perturbed start
    deck = deck_for(240.0, active=True, out=tmp_path / "cal")
    deck["qoi"] = {"name": "uniaxial_calibration",
                   "data_file": str(tmp_path / "data.npy"),
                   "uniaxial_stress_idx": 0,
                   "weight": [[1.0], [1.0e4], [1.0e4]]}
    deck["sensitivity"] = {"type": "adjoint"}
    deck["optimizer"] = {"algorithm": "L-BFGS-B"}
    path = tmp_path / "deck_cal.yaml"
    path.write_text(yaml.safe_dump(deck))
    assert cmad_main(["calibrate", str(path)]) == 0

    opt = yaml.safe_load((tmp_path / "cal" / "opt_params.yaml").read_text())
    Y_fit = opt["plastic"]["flow stress"]["initial yield"]["Y"]["value"]
    assert abs(Y_fit - 200.0) < 0.5


def test_text_output_format(workspace):
    """output.format: text writes csv artifacts (parity: reference
    writers' txt arm)."""
    tmp_path, deck, cauchy_true = workspace
    deck["output"]["format"] = "text"
    deck_path = _write_deck(tmp_path, deck)
    assert cmad_main(["gradient", str(deck_path)]) == 0
    out = tmp_path / "out"
    grad = np.loadtxt(out / "grad.csv")
    assert grad.shape == (3,)
    assert np.all(np.isfinite(grad))

    deck_path = _write_deck(tmp_path, deck, drop=("qoi", "sensitivity"))
    assert cmad_main(["primal", str(deck_path)]) == 0
    flat = np.loadtxt(out / "cauchy.csv", delimiter=",")
    assert flat.shape[0] == NUM_STEPS + 1
    assert (out / "xi.csv").exists()


_YIELD_SECTIONS = {
    "hill": {"hill": {k: {"value": v} for k, v in (
        ("F", 0.45), ("G", 0.55), ("H", 0.5),
        ("L", 1.4), ("M", 1.6), ("N", 1.5))}},
    "hosford": {"hosford": {"a": {"value": 8.0}}},
    "hosford_principal": {"hosford_principal": {"a": {"value": 8.0}}},
}


@pytest.mark.parametrize("yield_name", sorted(_YIELD_SECTIONS))
def test_primal_roundtrip_yield_families(yield_name, tmp_path):
    """MP primal through the console entry for every non-J2 yield
    family (FULL_3D strain-controlled ramp through yield)."""
    num_steps = 8
    eps = np.r_[0.0, np.linspace(0.0008, 0.012, num_steps)]
    F = np.repeat(np.eye(3)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    F[1, 1, :] -= 0.45 * eps
    F[2, 2, :] -= 0.45 * eps
    np.save(tmp_path / "F.npy", F)

    params = _params_section()
    params["plastic"]["effective stress"] = _YIELD_SECTIONS[yield_name]
    deck = {
        "problem": {"type": "material_point",
                    "name": f"primal_{yield_name}"},
        "model": {"name": "small_rate_elastic_plastic",
                  "def_type": "full_3d"},
        "parameters": params,
        "deformation": {"history_file": str(tmp_path / "F.npy")},
        "solver": {"newton": {}},
        "output": {"path": str(tmp_path / "out")},
    }
    path = tmp_path / "deck.yaml"
    path.write_text(yaml.safe_dump(deck))
    assert cmad_main(["primal", str(path)]) == 0

    out = tmp_path / "out"
    solver_log = json.loads((out / "solver.json").read_text())
    assert len(solver_log) == num_steps
    assert all(e["final_residual"] < 1e-10 for e in solver_log)
    xi = np.load(out / "xi.npy")
    assert xi[-1, 6] > 0.0  # the ramp went plastic
    assert np.isfinite(np.load(out / "cauchy.npy")).all()


@pytest.mark.parametrize("model_name", ["small_rate_elastic_plastic",
                                        "small_elastic_plastic"])
def test_primal_roundtrip_plane_strain(model_name, tmp_path):
    """MP primal with def_type plane_strain through the CLI — a drive
    the reference cannot run (its plastic models raise
    NotImplementedError at PLANE_STRAIN,
    cmad/models/small_rate_elastic_plastic.py:150)."""
    num_steps = 8
    eps = np.r_[0.0, np.linspace(0.001, 0.012, num_steps)]
    F = np.repeat(np.eye(2)[:, :, None], num_steps + 1, axis=2)
    F[0, 0, :] += eps
    F[1, 1, :] -= 0.45 * eps
    np.save(tmp_path / "F.npy", F)

    deck = {
        "problem": {"type": "material_point", "name": "plane_strain"},
        "model": {"name": model_name, "def_type": "plane_strain"},
        "parameters": _params_section(),
        "deformation": {"history_file": str(tmp_path / "F.npy")},
        "solver": {"newton": {}},
        "output": {"path": str(tmp_path / "out")},
    }
    path = tmp_path / "deck.yaml"
    path.write_text(yaml.safe_dump(deck))
    assert cmad_main(["primal", str(path)]) == 0

    out = tmp_path / "out"
    solver_log = json.loads((out / "solver.json").read_text())
    assert all(e["final_residual"] < 1e-10 for e in solver_log)
    cauchy = np.load(out / "cauchy.npy")
    s = cauchy[:, :, -1]
    # plane strain: the out-of-plane constraint stress is nonzero,
    # in-plane/out-of-plane shears vanish
    assert abs(s[2, 2]) > 1.0
    np.testing.assert_allclose(s[0, 1], 0.0, atol=1e-8)
    np.testing.assert_allclose(s[0, 2], 0.0, atol=1e-8)
    xi = np.load(out / "xi.npy")
    assert xi.shape[1] == 7  # PLANE_STRAIN shares the FULL_3D layout
    assert xi[-1, 6] > 0.0  # the ramp went plastic
