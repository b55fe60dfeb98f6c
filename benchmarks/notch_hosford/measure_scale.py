"""Scale-point head-to-head: notch_hosford on a finer mesh.

The reference's shipped notch mesh is tiny (1550 tets / 546 nodes), so
the single-chip TPU run there is latency-bound. This harness runs the
SAME deck physics on a finer structured notch mesh (examples/
notch_mesh.py) through BOTH frameworks:

    python benchmarks/notch_hosford/measure_scale.py ours --mesh M.exo
    python benchmarks/notch_hosford/measure_scale.py reference --mesh M.exo

and writes scale_<who>_<n_elems>.json. The reference runs its own CLI
unmodified on host CPU (f64, SuperLU direct, netCDF4/pyamg/gmsh
stubbed as in measure_reference.py); ours runs the default backend
(TPU: f32 adaptive Jacobi-CG; CPU: f64 direct).
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
REFERENCE = "/root/reference"


def measure_ours(mesh_path: Path, driver: str = "scan",
                 precon: str = "jacobi",
                 chunk_iters: int | None = None,
                 window_steps: int | None = None,
                 nls_json: str | None = None,
                 yield_form: str = "hosford") -> dict:
    sys.path.insert(0, str(REPO_ROOT))
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    backend = jax.default_backend()
    extra_record: dict = {}
    workdir = Path(tempfile.mkdtemp(prefix="scale_ours_"))
    (workdir / "meshes").mkdir()
    shutil.copy(mesh_path, workdir / "meshes/notch.exo")
    deck = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    deck["discretization"]["mesh file"] = "meshes/notch.exo"
    deck.pop("output", None)
    if yield_form == "j2":
        # same deck physics with the J2 yield (total-form J2+Voce):
        # the workhorse case the FE block fast path specializes
        mats = deck["residuals"]["local residual"]["materials"]
        for mat in mats.values():
            mat["plastic"]["effective stress"] = {"J2": {}}
    if backend == "tpu":
        pc = {"jacobi": {"type": "jacobi"},
              "chebyshev": {"type": "chebyshev", "degree": 3},
              "two_level": {"type": "two_level"}}[precon]
        deck["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": pc}
    (workdir / "deck.yaml").write_text(yaml.safe_dump(deck))

    from cmad_tpu.cli.fe_common import build_fe_problem_from_deck
    from cmad_tpu.fem.assembly import params_by_block_from_models
    from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
    from cmad_tpu.fem.fe_problem import FEState

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        bundle = build_fe_problem_from_deck("deck.yaml", "primal")
        fe = bundle.fe_problem
        kwargs = {}
        if "linear solver" in deck:
            kwargs["linear_solver_settings"] = dict(deck["linear solver"])
        if nls_json:
            kwargs["nonlinear_solver_settings"] = json.loads(nls_json)
        ts = [float(t) for t in bundle.t_schedule]

        if driver == "host":
            # one dispatch per Newton iteration with a host sync: the
            # robust path for large meshes through the device tunnel
            # (a fused multi-minute Newton-x-Krylov-x-time scan can
            # crash the remote worker)
            from cmad_tpu.fem.nonlinear_solver import (
                fe_quasistatic_drive_host,
            )

            def run_once():
                state, _log = fe_quasistatic_drive_host(fe, ts, **kwargs)
                return np.asarray(state.U_at(len(ts) - 1))

            u_final = run_once()  # compile
            t0 = time.perf_counter()
            u_final = run_once()
            warm = time.perf_counter() - t0
            cold = warm
        elif driver == "stepped":
            # one fused device program per TIME STEP (full Newton +
            # Krylov + true-residual check in one dispatch): bounds
            # each execution under the remote worker's ~50 s ceiling
            # (benchmarks/tunnel_repro/) while paying n_steps
            # dispatches instead of the host loop's
            # n_steps x newton_iters
            from cmad_tpu.fem.driver import fe_quasistatic_drive_stepped

            def run_once():
                state, log = fe_quasistatic_drive_stepped(
                    fe, ts, max_iters_per_dispatch=chunk_iters,
                    steps_per_dispatch=window_steps, **kwargs)
                return np.asarray(state.U_at(len(ts) - 1)), log

            t0 = time.perf_counter()
            u_final, log = run_once()  # compile + run
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            u_final, log = run_once()
            warm = time.perf_counter() - t0
            worst = max(e["final_residual"] for e in log)
            print(f"stepped: worst final residual {worst:.3e}",
                  file=sys.stderr)
            extra_record["worst_final_residual"] = float(worst)
        else:
            trajectory = build_fe_quasistatic_trajectory(fe, **kwargs)
            params = params_by_block_from_models(fe)
            st0 = FEState.from_problem(fe)
            state_init = (jnp.asarray(st0.U_at(0)),
                          {b: jnp.asarray(st0.xi_at(0, b))
                           for b in fe.models_by_block})
            t_jax = jnp.asarray(ts)
            run = jax.jit(lambda p, s: trajectory(fe.kernel_arrays, p, s,
                                                  t_jax))
            t0 = time.perf_counter()
            U_steps, _, _ = run(params, state_init)
            _ = float(jnp.sum(U_steps))
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            U_steps, _, _ = run(params, state_init)
            _ = float(jnp.sum(U_steps))
            warm = time.perf_counter() - t0
            u_final = np.asarray(U_steps[-1])
    finally:
        os.chdir(cwd)

    return {
        "metric": ("notch_hosford_scale_wall_s" if yield_form == "hosford"
                   else "notch_J2_scale_wall_s"),
        "who": "cmad_tpu",
        "yield_form": yield_form,
        "value": round(warm, 2),
        "cold_value": round(cold, 2),
        "unit": "s",
        "backend": backend,
        "driver": {"host": "host-loop", "stepped": "stepped",
                   "scan": "scan"}[driver]
        + (f"-K{chunk_iters}" if driver == "stepped" and chunk_iters
           else "")
        + (f"-W{window_steps}" if driver == "stepped" and window_steps
           else ""),
        "preconditioner": precon if backend == "tpu" else "direct",
        "n_elems": int(fe.mesh.connectivity.shape[0]),
        "n_dofs": int(fe.dof_map.num_total_dofs),
        "u_norm_final": float(np.linalg.norm(u_final)),
        **extra_record,
    }


def measure_reference(mesh_path: Path) -> dict:
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    sys.path.insert(0, str(REPO_ROOT))
    from benchmarks.notch_hosford.measure_reference import _install_stubs
    _install_stubs()
    sys.path.insert(0, REFERENCE)

    import jax
    jax.config.update("jax_platform_name", "cpu")
    import numpy as np

    workdir = Path(tempfile.mkdtemp(prefix="scale_ref_"))
    (workdir / "meshes").mkdir()
    shutil.copy(Path(REFERENCE) / "examples/notch_hosford.yaml",
                workdir / "notch_hosford.yaml")
    shutil.copy(mesh_path, workdir / "meshes/notch.exo")

    from cmad.cli.main import main as ref_main

    sys.path.insert(0, str(REPO_ROOT))
    from cmad_tpu.io.exodus import read_mesh
    n_elems = int(read_mesh(mesh_path).connectivity.shape[0])

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        t0 = time.perf_counter()
        rc = ref_main(["primal", "notch_hosford.yaml"])
        wall = time.perf_counter() - t0
        u_norm = None
        res_dir = workdir / "results"
        exo = sorted(res_dir.rglob("*.exo")) if res_dir.exists() else []
        if exo:
            try:
                sys.path.insert(0, str(REPO_ROOT))
                from cmad_tpu.io.exodus import read_results
                from cmad_tpu.io.results import FieldSpec
                from cmad_tpu.models.var_types import VarType
                res = read_results(exo[0],
                                   nodal_field_specs=[
                                       FieldSpec("u", VarType.VECTOR)])
                u_norm = float(np.linalg.norm(res.nodal["u"][-1]))
            except Exception as e:  # noqa: BLE001 - diagnostic only
                u_norm = f"unreadable: {e}"
    finally:
        os.chdir(cwd)
    assert rc == 0, f"reference primal failed rc={rc}"

    return {
        "metric": "notch_hosford_scale_wall_s",
        "who": "reference",
        "value": round(wall, 2),
        "unit": "s",
        "hardware": "host CPU (float64, SuperLU direct)",
        "n_elems": n_elems,
        "u_norm_final": u_norm,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("who", choices=["ours", "reference"])
    ap.add_argument("--mesh", required=True, type=Path)
    ap.add_argument("--host-loop", action="store_true",
                    help="deprecated alias for --driver host")
    ap.add_argument("--driver", default=None,
                    choices=["scan", "host", "stepped"])
    ap.add_argument("--chunk-iters", type=int, default=None,
                    help="stepped driver: max Newton iterations fused "
                         "per dispatch (bounds device-program duration)")
    ap.add_argument("--window", type=int, default=None,
                    help="stepped driver: batch W time steps per device "
                         "program (amortizes link dispatch latency)")
    ap.add_argument("--precon", default="jacobi",
                    choices=["jacobi", "chebyshev", "two_level"])
    ap.add_argument("--yield-form", default="hosford",
                    choices=["hosford", "j2"],
                    help="swap the deck's effective stress (j2 = the "
                         "total-form J2+Voce workhorse the block fast "
                         "path specializes)")
    ap.add_argument("--nls", default=None,
                    help="JSON dict of nonlinear-solver setting overrides"
                         " (e.g. '{\"line search\": {\"max evals\": 0}}')")
    args = ap.parse_args()
    driver = args.driver or ("host" if args.host_loop else "scan")
    if args.window is not None and driver != "stepped":
        ap.error("--window only applies to --driver stepped "
                 f"(got --driver {driver}); it would be silently "
                 "ignored and mislabel the output file")
    if args.chunk_iters is not None and driver != "stepped":
        ap.error("--chunk-iters only applies to --driver stepped "
                 f"(got --driver {driver})")
    if args.window is not None and args.chunk_iters is not None:
        ap.error("--window and --chunk-iters are mutually exclusive: "
                 "the first batches W time steps into one dispatch, "
                 "the second splits one step across dispatches")
    if args.who == "ours":
        out = measure_ours(args.mesh.resolve(), driver=driver,
                           precon=args.precon,
                           chunk_iters=args.chunk_iters,
                           window_steps=args.window,
                           nls_json=args.nls,
                           yield_form=args.yield_form)
    else:
        out = measure_reference(args.mesh.resolve())
    tag = f"{args.who}_{out.get('n_elems', 'ref')}"
    if args.who == "ours":
        if args.yield_form != "hosford":
            tag += f"_{args.yield_form}"
        tag += f"_{args.precon}"
        if driver != "scan":
            tag += f"_{driver}" if driver != "host" else ""
        if args.window:
            tag += f"_w{args.window}"
    (HERE / f"scale_{tag}.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
