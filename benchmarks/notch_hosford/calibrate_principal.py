"""Frame-invariant (principal-stress) Hosford calibration at scale
(VERDICT r2 item 9): recover the initial yield stress Y on the 7k-tet
structured notch under BOTH Hosford forms —

- ``hosford_principal`` (ours, no reference counterpart): the textbook
  yield on principal stresses, frame-invariant; reduced 4-dof
  trial-eigenbasis return map.
- ``hosford`` (the reference's form): evaluates only the DIAGONAL of
  the stress tensor (reference ``cmad/models/effective_stress.py:167``:
  "only working for diagonal cauchy stress now").

Same harness as ``calibrate_ours.py`` (truth primal -> perturbed-Y
restart -> `cmad calibrate` L-BFGS-B over jit(value_and_grad) of the
scanned trajectory); the mesh is the h=0.03 mapped structured notch
(7128 tets) from ``examples/notch_mesh.py``. Records wall + recovery
for each form in calibrate_principal_<backend>.json.

    python benchmarks/notch_hosford/calibrate_principal.py [--h 0.03]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO_ROOT = HERE.parent.parent
Y_TRUE, Y_START = 2.0, 2.6


def run_form(form: str, mesh: Path, backend: str) -> dict:
    import numpy as np
    import yaml

    from cmad_tpu.cli.main import main as cmad_main
    from cmad_tpu.io.exodus import read_results
    from cmad_tpu.io.results import FieldSpec
    from cmad_tpu.models.var_types import VarType

    workdir = Path(tempfile.mkdtemp(prefix=f"notch_cal_{form}_"))
    (workdir / "meshes").mkdir()
    shutil.copy(mesh, workdir / "meshes/notch.exo")

    base = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    base["discretization"]["mesh file"] = "meshes/notch.exo"
    mat = base["residuals"]["local residual"]["materials"]["block_1"]
    mat["plastic"]["effective stress"] = {form: {"a": 100.0}}
    if backend == "tpu":
        base["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "two_level"}}

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        deck = yaml.safe_load(yaml.safe_dump(base))
        deck["output"] = {"path": "truth",
                          "exodus filename": "truth.exo",
                          "global residual": ["u"],
                          "local residual": {"block_1": ["cauchy"]}}
        Path("deck_truth.yaml").write_text(yaml.safe_dump(deck))
        t0 = time.perf_counter()
        assert cmad_main(["primal", "deck_truth.yaml"]) == 0
        primal_wall = time.perf_counter() - t0
        res = read_results(
            Path("truth/truth.exo"),
            nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
        np.save("u_data.npy", res.nodal["u"])

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

    return {"form": form, "wall_s": round(wall, 1),
            "primal_wall_s": round(primal_wall, 1),
            "Y_true": Y_TRUE, "Y_start": Y_START,
            "Y_fit": round(Y_fit, 6),
            "J0": hist["history"][0]["J"],
            "J_final": hist["history"][-1]["J"],
            "n_evals": len(hist["history"])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=0.03)
    ap.add_argument("--forms", nargs="+",
                    default=["hosford_principal", "hosford"])
    args = ap.parse_args()

    sys.path.insert(0, str(REPO_ROOT))
    import jax
    backend = jax.default_backend()

    mesh = Path(tempfile.mkdtemp(prefix="notch_mesh_")) / "notch.exo"
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "examples/notch_mesh.py"),
         "--h", str(args.h), "--kind", "tet", "--out", str(mesh)],
        check=True)

    rows = [run_form(f, mesh, backend) for f in args.forms]
    out = {"metric": "notch_principal_calibration",
           "backend": backend, "h": args.h, "rows": rows}
    path = HERE / f"calibrate_principal_{backend}.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
