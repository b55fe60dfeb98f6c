"""notch_hosford calibration end-to-end (SURVEY.md §7 milestone 3).

Recovers the initial yield stress Y of the Hosford a=100 notch from
synthetic displacement data: a primal run at the true parameters
produces the nodal displacement history, the deck restarts from a
perturbed Y with a log transform, and `cmad calibrate` (FE arm:
jit(value_and_grad) of the scan trajectory through the FE Newton's
IFT rule, L-BFGS-B) drives the mismatch to the floor.

Writes benchmarks/notch_hosford/calibrate_<backend>.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO_ROOT = HERE.parent.parent
REFERENCE_MESH = "/root/reference/examples/meshes/notch.exo"
Y_TRUE, Y_START = 2.0, 2.6


def main() -> None:
    sys.path.insert(0, str(REPO_ROOT))
    import numpy as np
    import yaml

    import jax

    backend = jax.default_backend()

    from cmad_tpu.cli.main import main as cmad_main
    from cmad_tpu.io.exodus import read_results
    from cmad_tpu.io.results import FieldSpec
    from cmad_tpu.models.var_types import VarType

    workdir = Path(tempfile.mkdtemp(prefix="notch_cal_"))
    (workdir / "meshes").mkdir()
    mesh = (Path(REFERENCE_MESH) if Path(REFERENCE_MESH).exists()
            else REPO_ROOT / "examples/meshes/notch_h0.080.exo")
    shutil.copy(mesh, workdir / "meshes/notch.exo")

    base = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    base["discretization"]["mesh file"] = "meshes/notch.exo"
    if backend == "tpu":
        # two_level: 3.5x fewer CG iterations than jacobi at scale and
        # full convergence where jacobi hits the iteration cap
        base["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "two_level"}}

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        # 1) truth primal at Y_TRUE
        deck = yaml.safe_load(yaml.safe_dump(base))
        deck["output"] = {"path": "truth",
                          "exodus filename": "truth.exo",
                          "global residual": ["u"],
                          "local residual": {"block_1": ["cauchy"]}}
        Path("deck_truth.yaml").write_text(yaml.safe_dump(deck))
        assert cmad_main(["primal", "deck_truth.yaml"]) == 0
        res = read_results(Path("truth/truth.exo"),
                           nodal_field_specs=[FieldSpec("u",
                                                        VarType.VECTOR)])
        np.save("u_data.npy", res.nodal["u"])

        # 2) calibrate from Y_START
        deck = yaml.safe_load(yaml.safe_dump(base))
        mat = deck["residuals"]["local residual"]["materials"]["block_1"]
        mat["plastic"]["flow stress"]["initial yield"] = {
            "Y": {"value": Y_START, "active": True,
                  "transform": {"log": Y_TRUE}}}
        deck["qoi"] = {"name": "fe_displacement_match",
                       "data_file": "u_data.npy", "weight": 1.0e6}
        deck["optimizer"] = {"algorithm": "L-BFGS-B",
                             "options": {"maxiter": 25}}
        deck["output"] = {"path": "cal", "write exodus": False}
        Path("deck_cal.yaml").write_text(yaml.safe_dump(deck))

        t0 = time.perf_counter()
        assert cmad_main(["calibrate", "deck_cal.yaml"]) == 0
        wall = time.perf_counter() - t0

        opt = yaml.safe_load(Path("cal/opt_params.yaml").read_text())
        Y_fit = float(opt["block_1"]["plastic"]["flow stress"]
                      ["initial yield"]["Y"]["value"])
        hist = json.loads(Path("cal/opt_history.json").read_text())
    finally:
        os.chdir(cwd)

    out = {
        "metric": "notch_hosford_calibration_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "backend": backend,
        "Y_true": Y_TRUE, "Y_start": Y_START, "Y_fit": round(Y_fit, 5),
        "J0": hist["history"][0]["J"], "J_final": hist["history"][-1]["J"],
        "n_evals": len(hist["history"]),
    }
    (HERE / f"calibrate_{backend}.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
