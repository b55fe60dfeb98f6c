"""Measure cmad_tpu's notch_hosford forward-solve wall-clock.

Head-to-head with benchmarks/notch_hosford/measure_reference.py: the
SAME mesh (the reference's shipped ``examples/meshes/notch.exo``), the
same physics (Hosford a=100, Voce), the same 4-step load schedule and
BCs. Two configurations:

- default backend = TPU: float32, device-native Jacobi-CG linear solves
  (the ``direct``/host-callback arm cannot run through the axon tunnel)
- CPU (CMAD_X64=1 JAX_PLATFORM_NAME=cpu): float64, SuperLU direct —
  the apples-to-apples software comparison with the reference.

Writes benchmarks/notch_hosford/ours_notch_<backend>.json. Wall-clock
is split into compile+first-run (cold) and a second run (warm) — the
reference pays its dispatch overhead per step, a jitted scan pays it
once.
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


def main() -> None:
    sys.path.insert(0, str(REPO_ROOT))
    import jax
    import yaml

    backend = jax.default_backend()

    workdir = Path(tempfile.mkdtemp(prefix="ours_notch_"))
    (workdir / "meshes").mkdir()
    shutil.copy(REFERENCE_MESH, workdir / "meshes/notch.exo")
    deck = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    deck["discretization"]["mesh file"] = "meshes/notch.exo"
    deck["output"]["path"] = str(workdir / "results")
    if backend == "tpu":
        deck["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "jacobi"}}
    (workdir / "deck.yaml").write_text(yaml.safe_dump(deck))

    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.cli.fe_common import build_fe_problem_from_deck
    from cmad_tpu.fem.assembly import params_by_block_from_models
    from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
    from cmad_tpu.fem.fe_problem import FEState

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        bundle = build_fe_problem_from_deck("deck.yaml", "primal")
        fe = bundle.fe_problem
        ts = [float(t) for t in bundle.t_schedule]
        kwargs = {}
        if "linear solver" in deck:
            ls = deck["linear solver"]
            kwargs["linear_solver_settings"] = dict(ls)

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
        _ = float(jnp.sum(U_steps))  # readback barrier (axon tunnel)
        cold = time.perf_counter() - t0

        t0 = time.perf_counter()
        U_steps, _, _ = run(params, state_init)
        _ = float(jnp.sum(U_steps))
        warm = time.perf_counter() - t0
    finally:
        os.chdir(cwd)

    u_final = np.asarray(U_steps[-1])
    out = {
        "metric": "notch_hosford_primal_wall_s",
        "value": round(warm, 2),
        "cold_value": round(cold, 2),
        "unit": "s",
        "backend": backend,
        "n_elems": int(bundle.fe_problem.mesh.connectivity.shape[0]),
        "u_norm_final": float(np.linalg.norm(u_final)),
        "deck": "reference notch.exo mesh, Hosford a=100, 4 steps",
    }
    (HERE / f"ours_notch_{backend}.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
