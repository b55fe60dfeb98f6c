"""FE Hessian AT SCALE through the stepped forward-over-reverse HVP.

The reference computes FE Hessians by tracing the whole trajectory
(``cmad/cli/hessian.py:44`` via ``common.py:149``); at the mesh scales
our scale records live at (47.6k+ tets) that fused trace cannot
execute through a duration-limited link — and the reference's own
forward solve alone is 2874 s at 47.6k tets
(``scale_reference_47628.json``), putting a second-derivative pass far
out of its reach. This records ``cmad hessian`` with
``driver: stepped`` (``fem/stepped_adjoint.py build_fe_stepped_hvp``:
per-step tangent-forward + tangent-reverse programs, one HVP column
per active parameter) on the J2 notch.

    python benchmarks/notch_hosford/hessian_scale.py \
        --mesh examples/meshes/notch_h0.015.exo

Writes hessian_scale_<n_elems>_<backend>.json.
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
Y_TRUE, Y_EVAL = 2.0, 2.3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", required=True, type=Path)
    ap.add_argument("--weight", type=float, default=1.0e6)
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

    workdir = Path(tempfile.mkdtemp(prefix="notch_hess_scale_"))
    (workdir / "meshes").mkdir()
    shutil.copy(mesh_path, workdir / "meshes/notch.exo")

    base = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    base["discretization"]["mesh file"] = "meshes/notch.exo"
    mats = base["residuals"]["local residual"]["materials"]
    for mat in mats.values():
        mat["plastic"]["effective stress"] = {"J2": {}}
    base["residuals"]["global residual"]["driver"] = "stepped"
    if backend == "tpu":
        base["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "two_level"}}

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        # truth primal at Y_TRUE (stepped driver)
        deck = yaml.safe_load(yaml.safe_dump(base))
        deck["output"] = {"path": "truth",
                          "exodus filename": "truth.exo",
                          "global residual": ["u"]}
        Path("deck_truth.yaml").write_text(yaml.safe_dump(deck))
        t0 = time.perf_counter()
        assert cmad_main(["primal", "deck_truth.yaml"]) == 0
        primal_wall = time.perf_counter() - t0
        res = read_results(Path("truth/truth.exo"),
                           nodal_field_specs=[FieldSpec("u",
                                                        VarType.VECTOR)])
        np.save("u_data.npy", res.nodal["u"])

        # hessian of the displacement-match objective w.r.t. Y,
        # evaluated off-truth (a nontrivial gradient/curvature point)
        deck = yaml.safe_load(yaml.safe_dump(base))
        mat = deck["residuals"]["local residual"]["materials"]["block_1"]
        mat["plastic"]["flow stress"]["initial yield"] = {
            "Y": {"value": Y_EVAL, "active": True}}
        deck["qoi"] = {"name": "fe_displacement_match",
                       "data_file": "u_data.npy",
                       "weight": args.weight}
        deck["output"] = {"path": "hess", "write exodus": False}
        Path("deck_hess.yaml").write_text(yaml.safe_dump(deck))
        t0 = time.perf_counter()
        assert cmad_main(["hessian", "deck_hess.yaml"]) == 0
        wall = time.perf_counter() - t0
        H = np.load("hess/hess.npy")
    finally:
        os.chdir(cwd)

    from cmad_tpu.io.exodus import read_mesh
    n_elems = int(read_mesh(mesh_path).connectivity.shape[0])

    out = {
        "metric": "notch_J2_hessian_scale_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "backend": backend,
        "driver": "stepped (per-step forward-over-reverse HVP)",
        "n_elems": n_elems,
        "n_active_params": int(H.shape[0]),
        "primal_wall_s": round(primal_wall, 1),
        "Y_true": Y_TRUE, "Y_eval": Y_EVAL,
        "hessian": [[float(x) for x in row] for row in np.atleast_2d(H)],
        "reference_context": "the reference's fused-trace hessian is "
                             "unreachable at this scale: its FORWARD "
                             "solve alone takes 2874 s at 47628 tets "
                             "(scale_reference_47628.json, CPU f64)",
    }
    (HERE / f"hessian_scale_{n_elems}_{backend}.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
