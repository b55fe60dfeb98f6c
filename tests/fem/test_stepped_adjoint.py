"""Stepped (per-step-dispatch) FE sensitivities match the fused scan.

The stepped adjoint (``fem/stepped_adjoint.py``) computes J and
dJ/dparams with one forward and one reverse device program per time
step — the duration-bounded path for remote links — and must agree
with the fully traced scan gradient (``cli/fe_common.py
build_fe_J_of_params_flat``) to solver precision. Exercised through
the CLI so the deck wiring (``driver: stepped`` on gradient /
objective / calibrate) is covered too.
"""
from __future__ import annotations

import json
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
def cube_exo(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    w = ExodusWriter(path, mesh)
    w.close()
    return path


def _plastic_deck(mesh_file, out_dir, Y=200.0, driver=None):
    gr = {"type": "small_disp_equilibrium", "def_type": "full_3d"}
    if driver is not None:
        gr["driver"] = driver
    return {
        "problem": {"type": "fe", "name": "cube_fe"},
        "discretization": {"mesh file": str(mesh_file),
                           "num steps": 3, "step size": 1.0 / 3.0},
        "residuals": {
            "global residual": gr,
            "local residual": {
                "type": "small_elastic_plastic",
                "materials": {"all": {
                    "elastic": {"E": {"value": 200e3},
                                "nu": {"value": 0.3}},
                    "plastic": {
                        "effective stress": {"J2": {}},
                        "flow stress": {
                            "initial yield": {"Y": {"value": Y}},
                            "hardening": {"voce": {
                                "S": {"value": 200.0},
                                "D": {"value": 20.0}}}}}}}}},
        "dirichlet bcs": {"expression": {
            "pin_x": ["equilibrium", 0, "xmin_sides", "0.0"],
            "pin_y": ["equilibrium", 1, "ymin_sides", "0.0"],
            "pin_z": ["equilibrium", 2, "zmin_sides", "0.0"],
            "ramp_x": ["equilibrium", 0, "xmax_sides", "0.004 * t"]}},
        "output": {"path": str(out_dir)},
    }


def _write(tmp_path, deck, name):
    path = tmp_path / name
    path.write_text(yaml.safe_dump(deck))
    return path


@pytest.fixture
def truth_data(tmp_path, cube_exo):
    out_truth = tmp_path / "truth"
    deck_path = _write(tmp_path, _plastic_deck(cube_exo, out_truth),
                       "deck_truth.yaml")
    assert cmad_main(["primal", str(deck_path)]) == 0
    res = read_results(out_truth / "cube_fe.exo",
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
    data = tmp_path / "u_data.npy"
    np.save(data, res.nodal["u"])
    return data


def _sensitivity_deck(tmp_path, cube_exo, truth_data, out, driver):
    """Offset ACTIVE plastic parameters + displacement-match QoI."""
    deck = _plastic_deck(cube_exo, out, Y=230.0, driver=driver)
    mat = deck["residuals"]["local residual"]["materials"]["all"]
    fs = mat["plastic"]["flow stress"]
    fs["initial yield"]["Y"]["active"] = True
    fs["hardening"]["voce"]["S"]["active"] = True
    # weight lifts the objective off the float noise floor (the raw
    # displacement mismatch on the unit cube is O(1e-9)) so L-BFGS's
    # default gradient tolerance doesn't declare victory at the start
    deck["qoi"] = {"name": "fe_displacement_match",
                   "data_file": str(truth_data),
                   "weight": 1.0e8}
    return deck


def test_stepped_gradient_matches_scan(tmp_path, cube_exo, truth_data):
    grads, Js = {}, {}
    for driver in ("scan", "stepped"):
        out = tmp_path / f"out_{driver}"
        deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                                 driver)
        deck_path = _write(tmp_path, deck, f"deck_{driver}.yaml")
        assert cmad_main(["gradient", str(deck_path)]) == 0
        grads[driver] = np.load(out / "grad.npy")
        assert cmad_main(["objective", str(deck_path)]) == 0
        Js[driver] = json.loads((out / "J.json").read_text())["J"]

    assert grads["scan"].shape == grads["stepped"].shape == (2,)
    assert np.linalg.norm(grads["scan"]) > 0.0
    # same physics, same solves — agreement to solver/AD precision
    assert np.allclose(grads["stepped"], grads["scan"], rtol=5e-5), \
        (grads["stepped"], grads["scan"])
    assert np.isclose(Js["stepped"], Js["scan"], rtol=5e-6), \
        (Js["stepped"], Js["scan"])


def test_stepped_calibrate_recovers_Y(tmp_path, cube_exo, truth_data):
    out = tmp_path / "cal"
    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                             "stepped")
    # calibrate only Y (S stays fixed at truth for identifiability on
    # this tiny drive)
    mat = deck["residuals"]["local residual"]["materials"]["all"]
    mat["plastic"]["flow stress"]["hardening"]["voce"]["S"].pop("active")
    deck["optimizer"] = {"algorithm": "L-BFGS-B",
                         "options": {"maxiter": 12}}
    deck_path = _write(tmp_path, deck, "deck_cal.yaml")
    assert cmad_main(["calibrate", str(deck_path)]) == 0
    opt = yaml.safe_load((out / "opt_params.yaml").read_text())
    Y_fit = float(opt["all"]["plastic"]["flow stress"]["initial yield"]
                  ["Y"]["value"])
    hist = json.loads((out / "opt_history.json").read_text())
    assert hist["history"][0]["J"] > 1e-4, \
        "objective not lifted off the noise floor — weight wiring broke"
    assert hist["history"][-1]["J"] < 1e-6 * hist["history"][0]["J"]
    assert abs(Y_fit - 200.0) / 200.0 < 1e-3, Y_fit


def test_stepped_vg_rejects_dispatch_caps(tmp_path, cube_exo,
                                          truth_data):
    """Per-dispatch caps are primal-only; the sensitivity path must
    reject them actionably rather than silently ignore them."""
    out = tmp_path / "capped"
    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                             "stepped")
    deck["residuals"]["global residual"]["max iters per dispatch"] = 2
    deck_path = _write(tmp_path, deck, "deck_capped.yaml")
    with pytest.raises(ValueError, match="PRIMAL"):
        cmad_main(["gradient", str(deck_path)])


def test_reuse_primal_matches_resolve(tmp_path, cube_exo, truth_data):
    """The stored-solution reverse sweep (no Newton recompute,
    `_fe_solution_at_ad`) must produce the same gradient as the
    re-solving sweep — both are the same IFT transposition, evaluated
    at the same converged state."""
    from cmad_tpu.cli.fe_common import (
        build_fe_problem_from_deck,
        fe_params_overlay,
    )
    from cmad_tpu.fem.stepped_adjoint import (
        build_fe_stepped_value_and_grad,
    )
    from cmad_tpu.fem.fe_problem import FEState
    import jax.numpy as jnp

    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data,
                             tmp_path / "out_lib", "stepped")
    deck_path = _write(tmp_path, deck, "deck_lib.yaml")
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        bundle = build_fe_problem_from_deck(Path("deck_lib.yaml"),
                                            "gradient")
    finally:
        os.chdir(cwd)
    fe = bundle.fe_problem
    params_flat, overlay = fe_params_overlay(fe)
    st = FEState.from_problem(fe)
    state_init = (jnp.asarray(st.U_at(0)),
                  {b: jnp.asarray(st.xi_at(0, b))
                   for b in fe.models_by_block})
    for t in bundle.t_schedule[1:]:
        fe.dof_map.evaluate_prescribed_values(
            fe.kernel_arrays.dbc_arrays, float(t))

    results = {}
    for reuse in (True, False):
        vg = build_fe_stepped_value_and_grad(
            fe, overlay, bundle.qoi, reuse_primal=reuse)
        results[reuse] = vg(params_flat, state_init, bundle.t_schedule)

    J_fast, g_fast = results[True]
    J_slow, g_slow = results[False]
    assert np.isclose(J_fast, J_slow, rtol=1e-10), (J_fast, J_slow)
    assert np.allclose(g_fast, g_slow, rtol=1e-6), (g_fast, g_slow)
    assert np.linalg.norm(g_fast) > 0.0

    # host-offloaded checkpoints (device footprint O(1) in steps) must
    # be bit-identical math: same programs, same inputs, only the
    # checkpoint residency differs
    vg_off = build_fe_stepped_value_and_grad(
        fe, overlay, bundle.qoi, checkpoint_offload=True)
    J_off, g_off = vg_off(params_flat, state_init, bundle.t_schedule)
    assert np.isclose(J_off, J_fast, rtol=1e-12), (J_off, J_fast)
    np.testing.assert_allclose(g_off, g_fast, rtol=1e-10)


def test_windowed_stepped_gradient_matches_scan(tmp_path, cube_exo,
                                                truth_data):
    """steps per dispatch on the SENSITIVITY path: W forward + W
    reverse steps per program must reproduce the per-step stepped
    gradient (same math, re-batched dispatches) — including a
    remainder window (W=2 over 3 steps)."""
    grads, Js = {}, {}
    for tag, extra in (("stepped", {}),
                       ("w2", {"steps per dispatch": 2}),
                       ("w8", {"steps per dispatch": 8})):
        out = tmp_path / f"out_{tag}"
        deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                                 "stepped")
        deck["residuals"]["global residual"].update(extra)
        deck_path = _write(tmp_path, deck, f"deck_{tag}.yaml")
        assert cmad_main(["gradient", str(deck_path)]) == 0
        grads[tag] = np.load(out / "grad.npy")

    assert np.linalg.norm(grads["stepped"]) > 0.0
    # identical step math, only dispatch batching differs
    np.testing.assert_allclose(grads["w2"], grads["stepped"], rtol=1e-6)
    # W > n_steps: one window is the whole schedule (the fused scan
    # plus per-step checkpoints)
    np.testing.assert_allclose(grads["w8"], grads["stepped"], rtol=1e-6)


def test_host_driver_rejected_for_sensitivities(tmp_path, cube_exo,
                                                truth_data):
    """driver: host is primal-only; gradient/calibrate decks naming it
    must error actionably instead of silently tracing the fused scan
    the user opted out of."""
    out = tmp_path / "host_rej"
    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out, "host")
    deck_path = _write(tmp_path, deck, "deck_host_grad.yaml")
    with pytest.raises(ValueError, match="primal-only"):
        cmad_main(["gradient", str(deck_path)])
    deck["optimizer"] = {"algorithm": "L-BFGS-B",
                         "options": {"maxiter": 2}}
    deck_path = _write(tmp_path, deck, "deck_host_cal.yaml")
    with pytest.raises(ValueError, match="primal-only"):
        cmad_main(["calibrate", str(deck_path)])


def test_stepped_hessian_rejects_dispatch_caps(tmp_path, cube_exo,
                                               truth_data):
    """The stepped hessian path (tests/fem/test_stepped_hessian.py
    pins its values) supports neither dispatch cap; decks naming one
    must error actionably."""
    out = tmp_path / "hess"
    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                             "stepped")
    deck["residuals"]["global residual"]["steps per dispatch"] = 2
    deck_path = _write(tmp_path, deck, "deck_hess.yaml")
    with pytest.raises(ValueError, match="HESSIAN"):
        cmad_main(["hessian", str(deck_path)])


def test_stepped_gradient_matches_scan_load_match(tmp_path, cube_exo):
    """Same parity bar for the load-match QoI — the other FE QoI whose
    step contribution itself depends on the parameters (it assembles
    reactions, re-running local solves inside the QoI closure)."""
    reaction_csv = tmp_path / "reaction.csv"
    deck = _plastic_deck(cube_exo, tmp_path / "truth_lm")
    deck["qoi"] = {"name": "fe_load_match", "sideset": "xmax_sides",
                   "components": [0],
                   "output_file": str(reaction_csv)}
    assert cmad_main(["primal", str(_write(tmp_path, deck,
                                           "deck_lm_truth.yaml"))]) == 0

    grads = {}
    for driver in ("scan", "stepped"):
        out = tmp_path / f"lm_{driver}"
        deck = _plastic_deck(cube_exo, out, Y=230.0, driver=driver)
        mat = deck["residuals"]["local residual"]["materials"]["all"]
        mat["plastic"]["flow stress"]["initial yield"]["Y"][
            "active"] = True
        deck["qoi"] = {"name": "fe_load_match", "sideset": "xmax_sides",
                       "components": [0],
                       "data_file": str(reaction_csv)}
        deck_path = _write(tmp_path, deck, f"deck_lm_{driver}.yaml")
        assert cmad_main(["gradient", str(deck_path)]) == 0
        grads[driver] = np.load(out / "grad.npy")

    assert np.linalg.norm(grads["scan"]) > 0.0
    assert np.allclose(grads["stepped"], grads["scan"], rtol=5e-5), \
        (grads["stepped"], grads["scan"])


def test_stepped_gradient_matches_scan_two_blocks(tmp_path):
    """Multi-block coverage: per-block xi dicts flow through the
    stepped reverse sweep's cotangents, and per-block active
    parameters concatenate in the same order as the scan overlay."""
    from cmad_tpu.fem.mesh import Mesh

    base = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    centroids = base.nodes[base.connectivity].mean(axis=1)
    mesh = Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={
            "soft": np.where(centroids[:, 0] < 0.5)[0].astype(np.intp),
            "stiff": np.where(centroids[:, 0] >= 0.5)[0].astype(np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets)
    (tmp_path / "meshes").mkdir()
    ExodusWriter(tmp_path / "meshes" / "two.exo", mesh).close()

    def mat(Y):
        return {"elastic": {"E": {"value": 200e3}, "nu": {"value": 0.3}},
                "plastic": {
                    "effective stress": {"J2": {}},
                    "flow stress": {
                        "initial yield": {"Y": {"value": Y}},
                        "hardening": {"voce": {"S": {"value": 200.0},
                                               "D": {"value": 20.0}}}}}}

    def deck(out, Y_soft, Y_stiff, driver=None, qoi=False):
        gr = {"type": "small_disp_equilibrium", "def_type": "full_3d"}
        if driver:
            gr["driver"] = driver
        d = {"problem": {"type": "fe", "name": "two_fe"},
             "discretization": {"mesh file": "meshes/two.exo",
                                "num steps": 3, "step size": 1.0 / 3.0},
             "residuals": {
                 "global residual": gr,
                 "local residual": {
                     "type": "small_elastic_plastic",
                     "materials": {"soft": mat(Y_soft),
                                   "stiff": mat(Y_stiff)}}},
             "dirichlet bcs": {"expression": {
                 "pin_x": ["equilibrium", 0, "xmin_sides", "0.0"],
                 "pin_y": ["equilibrium", 1, "ymin_sides", "0.0"],
                 "pin_z": ["equilibrium", 2, "zmin_sides", "0.0"],
                 "ramp_x": ["equilibrium", 0, "xmax_sides",
                            "0.004 * t"]}},
             "output": {"path": str(out)}}
        if qoi:
            for b in ("soft", "stiff"):
                d["residuals"]["local residual"]["materials"][b][
                    "plastic"]["flow stress"]["initial yield"]["Y"][
                    "active"] = True
            d["qoi"] = {"name": "fe_displacement_match",
                        "data_file": "u_data.npy", "weight": 1.0e8}
        return d

    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        _write(tmp_path, deck("truth", 180.0, 220.0), "deck_t.yaml")
        assert cmad_main(["primal", "deck_t.yaml"]) == 0
        res = read_results(Path("truth/two_fe.exo"),
                           nodal_field_specs=[FieldSpec("u",
                                                        VarType.VECTOR)])
        np.save("u_data.npy", res.nodal["u"])

        grads = {}
        for driver in ("scan", "stepped"):
            _write(tmp_path,
                   deck(f"o_{driver}", 200.0, 245.0, driver, qoi=True),
                   f"deck_{driver}.yaml")
            assert cmad_main(["gradient", f"deck_{driver}.yaml"]) == 0
            grads[driver] = np.load(Path(f"o_{driver}") / "grad.npy")
    finally:
        os.chdir(cwd)

    assert grads["scan"].shape == grads["stepped"].shape == (2,)
    assert np.all(np.abs(grads["scan"]) > 0.0)  # both blocks sensitive
    assert np.allclose(grads["stepped"], grads["scan"], rtol=5e-5), \
        (grads["stepped"], grads["scan"])
