"""Linear-solver sweep on the mixed u-p plastic notch problem.

Parity: reference ``benchmarks/block_solver/benchmark.py``: builds the FE
problem per mesh size, AOT-compiles the full quasi-static run for each
linear-solver configuration, and reports compile vs warm seconds. The
AMG arms of the reference are replaced by the device-native
block-Chebyshev preconditioner (no pyamg in this image; on TPU the
on-device sweep is the point).

Usage:  python benchmarks/block_solver/benchmark.py [--h H ...] [--steps N]

``--driver stepped`` swaps the fused whole-run program for the stepped
driver (``fem/driver.py fe_quasistatic_drive_stepped``): one fused
device program per TIME step (full Newton + Krylov + true-residual
check per dispatch), optionally chunked with
``--max-iters-per-dispatch``. This is the arm that survives
remote-attached accelerators that kill any single device execution in
the ~50-68 s band (measured: ``benchmarks/tunnel_repro/``); the
whole-run AOT arm is the reference-parity design for directly-attached
hardware. The stepped arm reports (cold_s, warm_s) wall of the full
drive instead of (compile_s, warm_s).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "examples"))

SOLVER_CONFIGS: dict[str, dict] = {
    "direct": {"type": "direct"},
    "block-jacobi": {
        "type": "gmres", "rtol": 1e-10, "restart": 40,
        "preconditioner": {"type": "block", "coupling": "lower",
                           "inner": "jacobi",
                           "diagonal_block": "assembled"}},
    "block-chebyshev-d3-assembled": {
        "type": "gmres", "rtol": 1e-10, "restart": 40,
        "preconditioner": {"type": "block", "coupling": "lower",
                           "inner": "chebyshev", "degree": 3,
                           "diagonal_block": "assembled"}},
    "block-chebyshev-d3-schur": {
        "type": "gmres", "rtol": 1e-10, "restart": 40,
        "preconditioner": {"type": "block", "coupling": "lower",
                           "inner": "chebyshev", "degree": 3,
                           "diagonal_block": "schur"}},
    "two-level": {
        "type": "gmres", "rtol": 1e-10, "restart": 40,
        "preconditioner": {"type": "two_level"}},
}


def build_problem(h: float):
    from notch_mesh import notch_mesh

    from cmad_tpu.fem.bcs import DirichletBC
    from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
    from cmad_tpu.fem.elements import P1_TET
    from cmad_tpu.fem.fe_problem import build_fe_problem
    from cmad_tpu.fem.mesh import coordinate_side_sets
    from cmad_tpu.fem.quadrature import tet_quadrature
    from cmad_tpu.fem.topology import ElementFamily
    from cmad_tpu.global_residuals.modes import GlobalResidualMode
    from cmad_tpu.global_residuals.small_disp_equilibrium import (
        SmallDispEquilibrium,
    )
    from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
    from cmad_tpu.parameters.parameters import Parameters
    from dataclasses import replace

    mesh = notch_mesh(h, kind="tet")
    mesh = replace(mesh, side_sets={**mesh.side_sets,
                                    **coordinate_side_sets(mesh)})

    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 1000.0, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 2.0},
                                    "hardening": {"voce": {"S": 10.0,
                                                           "D": 2.0}}}}}
    model = SmallElasticPlastic(Parameters(values))
    gr = SmallDispEquilibrium(ndims=3, mixed=True)

    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["ymax_sides"], "u", [1],
                    lambda c, t: 0.01 * t * jnp.ones((c.shape[0], 1))),
    ]
    from cmad_tpu.fem.elements import P1_TET as P1
    dof_map = build_dof_map(
        mesh, [GlobalFieldLayout("u", P1), GlobalFieldLayout("p", P1)],
        bcs, {"u": 3, "p": 1})
    fe = build_fe_problem(
        mesh, dof_map, gr, {"block_1": model},
        modes_by_block={"block_1": GlobalResidualMode.COUPLED},
        assembly_quadrature={ElementFamily.TET_LINEAR: tet_quadrature(2)})
    return fe, dof_map


def run_config(fe, dof_map, name: str, lss: dict, n_steps: int):
    from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
    from cmad_tpu.fem.fe_problem import FEState

    trajectory = build_fe_quasistatic_trajectory(
        fe, nonlinear_solver_settings={"abs tol": 1e-8, "rel tol": 1e-8},
        linear_solver_settings=lss)
    st0 = FEState.from_problem(fe)
    state_init = (jnp.zeros(dof_map.num_total_dofs),
                  {"block_1": jnp.asarray(st0.xi_at(0, "block_1"))})
    t_sched = jnp.linspace(0.0, 1.0, n_steps + 1)
    params = {"block_1": fe.models_by_block["block_1"].parameters.values}

    run = jax.jit(lambda p, s: trajectory(fe.kernel_arrays, p, s, t_sched))

    t0 = time.perf_counter()
    lowered = run.lower(params, state_init)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0

    out = compiled(params, state_init)
    _ = float(jnp.sum(out[0]))  # readback barrier (block_until_ready
    t0 = time.perf_counter()    # does not sync through the axon tunnel)
    out = compiled(params, state_init)
    _ = float(jnp.sum(out[0]))
    warm_s = time.perf_counter() - t0

    U_final = np.asarray(out[0][-1])
    return compile_s, warm_s, float(np.abs(U_final).max())


def run_config_stepped(fe, name: str, lss: dict, n_steps: int,
                       chunk_iters: int | None, nl_tol: float):
    from cmad_tpu.fem.driver import fe_quasistatic_drive_stepped

    ts = [i / n_steps for i in range(n_steps + 1)]

    def run_once():
        state, log = fe_quasistatic_drive_stepped(
            fe, ts,
            nonlinear_solver_settings={"abs tol": nl_tol,
                                       "rel tol": nl_tol},
            linear_solver_settings=lss,
            max_iters_per_dispatch=chunk_iters)
        return np.asarray(state.U_at(n_steps)), log

    t0 = time.perf_counter()
    u_final, log = run_once()  # compile + run
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    u_final, log = run_once()
    warm_s = time.perf_counter() - t0
    worst = max(e["final_residual"] for e in log)
    return cold_s, warm_s, float(np.abs(u_final).max()), worst


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--h", type=float, nargs="+",
                        default=[0.12, 0.07])
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--configs", nargs="+",
                        default=list(SOLVER_CONFIGS))
    parser.add_argument("--driver", choices=["scan", "stepped"],
                        default="scan")
    parser.add_argument("--max-iters-per-dispatch", type=int,
                        default=None,
                        help="stepped driver: max Newton iterations "
                             "fused per device program")
    parser.add_argument("--rtol", type=float, default=None,
                        help="override every iterative config's linear "
                             "rtol (f32 backends need >= 1e-7; the "
                             "defaults are the f64 reference settings)")
    parser.add_argument("--nl-tol", type=float, default=1e-8,
                        help="nonlinear abs/rel tol for the stepped "
                             "driver (f32 backends floor above the "
                             "f64 default)")
    args = parser.parse_args()
    configs = {n: dict(SOLVER_CONFIGS[n]) for n in args.configs}
    if args.rtol is not None:
        for cfg in configs.values():
            if "rtol" in cfg:
                cfg["rtol"] = args.rtol

    for h in args.h:
        fe, dof_map = build_problem(h)
        n_elems = fe.mesh.connectivity.shape[0]
        print(f"\n=== h = {h}: {n_elems} tets, "
              f"{dof_map.num_total_dofs} dofs, driver={args.driver} ===")
        results = {}
        for name in args.configs:
            if args.driver == "stepped":
                cold_s, warm_s, u_max, worst_r = run_config_stepped(
                    fe, name, configs[name], args.steps,
                    args.max_iters_per_dispatch, args.nl_tol)
                results[name] = (cold_s, warm_s, u_max)
                print(f"{name:32s} cold    {cold_s:7.2f}s  "
                      f"warm {warm_s:7.3f}s  max|U| {u_max:.6f}  "
                      f"worst||r|| {worst_r:.2e}")
                continue
            compile_s, warm_s, u_max = run_config(
                fe, dof_map, name, configs[name], args.steps)
            results[name] = (compile_s, warm_s, u_max)
            print(f"{name:32s} compile {compile_s:7.2f}s  "
                  f"warm {warm_s:7.3f}s  max|U| {u_max:.6f}")
        vals = [r[2] for r in results.values()]
        from cmad_tpu import config
        agree_tol = 1e-6 if config.real_dtype() == np.float64 else 2e-5
        if max(vals) - min(vals) > agree_tol * max(vals):
            print("WARNING: solver configs disagree on the solution!")


if __name__ == "__main__":
    main()
