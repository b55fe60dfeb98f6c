"""FE calibration AT SCALE through the stepped adjoint.

Recovers the initial yield Y of the J2+Voce notch from synthetic
displacement data on a mesh far beyond the reference's own notch
(its shipped mesh is 1550 tets; the reference's forward solve alone
takes 2874 s at 47.6k tets — `scale_reference_47628.json` — putting a
multi-eval gradient calibration out of reach there). Ours runs the
`driver: stepped` sensitivity path (`fem/stepped_adjoint.py`): per-step
forward + per-step adjoint device programs, each bounded under the
remote link's per-execution ceiling (benchmarks/tunnel_repro/).

    python benchmarks/notch_hosford/calibrate_scale.py \
        --mesh examples/meshes/notch_h0.015.exo [--maxiter 12]

Writes calibrate_scale_<n_elems>_<backend>.json.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO_ROOT = HERE.parent.parent
Y_TRUE, Y_START = 2.0, 2.6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", required=True, type=Path)
    ap.add_argument("--maxiter", type=int, default=12)
    ap.add_argument("--weight", type=float, default=1.0e6)
    ap.add_argument("--params", default="y", choices=["y", "ysd"],
                    help="'y': recover Y only; 'ysd': recover the full "
                         "flow triple (Y, S, D) from offset starts")
    ap.add_argument("--load", default=None,
                    help="override the load_y expression (e.g. "
                         "'0.025 * t'): the deck's 1%%-strain ramp "
                         "leaves S and D identifiable only through "
                         "their product S*D (Voce saturation barely "
                         "sampled) — a deeper drive separates them")
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override the deck's time-step count (same "
                         "final load): more steps sample the hardening "
                         "curve at more depths")
    ap.add_argument("--steps-per-dispatch", type=int, default=None,
                    help="window the stepped adjoint: W forward + W "
                         "reverse steps per device program (amortizes "
                         "the link's ~30 ms dispatch floor on small "
                         "meshes)")
    ap.add_argument("--two-depth", action="store_true",
                    help="multi-load-case calibration ('load cases' "
                         "deck section): the deck's schedule is the "
                         "SHALLOW case and a 2x-step-size DEEP case "
                         "is added, each with its own truth data — "
                         "the designed answer to the r4 single-ramp "
                         "S/D identifiability collapse")
    args = ap.parse_args()
    mesh_path = args.mesh.resolve()

    sys.path.insert(0, str(REPO_ROOT))
    import numpy as np
    import yaml

    import jax

    backend = jax.default_backend()

    from cmad_tpu.cli.main import main as cmad_main
    from cmad_tpu.io.exodus import read_results
    from cmad_tpu.io.results import FieldSpec
    from cmad_tpu.models.var_types import VarType

    workdir = Path(tempfile.mkdtemp(prefix="notch_cal_scale_"))
    (workdir / "meshes").mkdir()
    shutil.copy(mesh_path, workdir / "meshes/notch.exo")

    base = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    base["discretization"]["mesh file"] = "meshes/notch.exo"
    # J2 form: the workhorse yield the FE block fast path specializes —
    # what makes one fused Newton step fit under the link ceiling at
    # this size (benchmarks/notch_hosford/README.md r3 J2 re-record)
    mats = base["residuals"]["local residual"]["materials"]
    for mat in mats.values():
        mat["plastic"]["effective stress"] = {"J2": {}}
    base["residuals"]["global residual"]["driver"] = "stepped"
    if args.load is not None:
        base["dirichlet bcs"]["expression"]["load_y"][3] = args.load
    if args.num_steps is not None:
        # keep the same final load: total time comes from the deck's own
        # schedule, not a literal (the deck's num steps x step size)
        total_t = (float(base["discretization"]["num steps"])
                   * float(base["discretization"]["step size"]))
        base["discretization"]["num steps"] = args.num_steps
        base["discretization"]["step size"] = total_t / args.num_steps
    if backend == "tpu":
        base["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "two_level"}}

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        # 1) truth primal(s) at Y_TRUE (stepped driver); --two-depth
        # adds a second truth at 2x the step size (twice the final
        # load, same step count)
        depths = {"": 1.0}
        if args.two_depth:
            depths = {"_shallow": 1.0, "_deep": 2.0}
        base_dt = float(base["discretization"]["step size"])
        primal_wall = 0.0
        for tag_d, scale in depths.items():
            deck = yaml.safe_load(yaml.safe_dump(base))
            deck["discretization"]["step size"] = base_dt * scale
            deck["output"] = {"path": f"truth{tag_d}",
                              "exodus filename": "truth.exo",
                              "global residual": ["u"]}
            Path(f"deck_truth{tag_d}.yaml").write_text(
                yaml.safe_dump(deck))
            t0 = time.perf_counter()
            assert cmad_main(["primal", f"deck_truth{tag_d}.yaml"]) == 0
            primal_wall += time.perf_counter() - t0
            res = read_results(Path(f"truth{tag_d}/truth.exo"),
                               nodal_field_specs=[FieldSpec(
                                   "u", VarType.VECTOR)])
            np.save(f"u_data{tag_d}.npy", res.nodal["u"])

        # 2) calibrate from offset starts through the stepped adjoint
        deck = yaml.safe_load(yaml.safe_dump(base))
        mat = deck["residuals"]["local residual"]["materials"]["block_1"]
        mat["plastic"]["flow stress"]["initial yield"] = {
            "Y": {"value": Y_START, "active": True,
                  "transform": {"log": Y_TRUE}}}
        if args.params == "ysd":
            # truth (deck): S=10, D=2 — start 30-40% off
            mat["plastic"]["flow stress"]["hardening"]["voce"] = {
                "S": {"value": 13.0, "active": True,
                      "transform": {"log": 10.0}},
                "D": {"value": 1.3, "active": True,
                      "transform": {"log": 2.0}}}
        if args.two_depth:
            deck["qoi"] = {"name": "fe_displacement_match",
                           "data_file": "u_data_shallow.npy",
                           "weight": args.weight}
            deck["load cases"] = [
                {"name": "shallow"},
                {"name": "deep",
                 "step size": base_dt * 2.0,
                 "qoi": {"data_file": "u_data_deep.npy"}},
            ]
        else:
            deck["qoi"] = {"name": "fe_displacement_match",
                           "data_file": "u_data.npy",
                           "weight": args.weight}
        if args.steps_per_dispatch is not None:
            deck["residuals"]["global residual"][
                "steps per dispatch"] = args.steps_per_dispatch
        deck["optimizer"] = {"algorithm": "L-BFGS-B",
                             "options": {"maxiter": args.maxiter,
                                         "ftol": 1.0e-14,
                                         "gtol": 1.0e-10}}
        deck["output"] = {"path": "cal", "write exodus": False}
        Path("deck_cal.yaml").write_text(yaml.safe_dump(deck))

        t0 = time.perf_counter()
        assert cmad_main(["calibrate", "deck_cal.yaml"]) == 0
        wall = time.perf_counter() - t0

        opt = yaml.safe_load(Path("cal/opt_params.yaml").read_text())
        fs = opt["block_1"]["plastic"]["flow stress"]
        Y_fit = float(fs["initial yield"]["Y"]["value"])
        fit_extra = {}
        if args.params == "ysd":
            fit_extra = {
                "S_true": 10.0, "S_start": 13.0,
                "S_fit": round(float(
                    fs["hardening"]["voce"]["S"]["value"]), 6),
                "D_true": 2.0, "D_start": 1.3,
                "D_fit": round(float(
                    fs["hardening"]["voce"]["D"]["value"]), 6)}
        hist = json.loads(Path("cal/opt_history.json").read_text())
    finally:
        os.chdir(cwd)

    from cmad_tpu.io.exodus import read_mesh
    n_elems = int(read_mesh(mesh_path).connectivity.shape[0])

    out = {
        "metric": "notch_J2_calibration_scale_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "backend": backend,
        "driver": "stepped (per-step adjoint)",
        "reverse_mode": "stored-solution (_fe_solution_at_ad; no "
                        "Newton recompute in the reverse sweep)",
        "n_elems": n_elems,
        "primal_wall_s": round(primal_wall, 1),
        "Y_true": Y_TRUE, "Y_start": Y_START, "Y_fit": round(Y_fit, 6),
        **fit_extra,
        "J0": hist["history"][0]["J"], "J_final": hist["history"][-1]["J"],
        "n_evals": len(hist["history"]),
        "reference_context": "reference forward solve ALONE is 2874 s "
                             "at 47628 tets (scale_reference_47628."
                             "json, CPU f64 direct); a multi-eval "
                             "gradient calibration at this scale is "
                             "out of its practical reach",
    }
    if args.load is not None:
        out["load_y"] = args.load
    if args.steps_per_dispatch is not None:
        out["steps_per_dispatch"] = args.steps_per_dispatch
    if args.two_depth:
        out["load_cases"] = ["shallow (deck schedule)",
                             "deep (2x step size)"]
    tag = f"{n_elems}_{backend}" + ("" if args.params == "y"
                                    else f"_{args.params}")
    if args.two_depth:
        tag += "_twodepth"
    if args.steps_per_dispatch is not None:
        tag += f"_w{args.steps_per_dispatch}"
    (HERE / f"calibrate_scale_{tag}.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
