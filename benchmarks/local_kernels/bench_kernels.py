"""Consolidated per-point kernel table: reduced vs generic updates/s
on the default backend, batch straddling yield.

Batch size via CMAD_KERNEL_BATCH (default 20k — sized for single-core
CPU f64; on TPU use >= 1M so kernel time dominates the ~30 ms link
dispatch floor). Writes results_<backend>.json next to this file.
"""
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters

B = int(os.environ.get("CMAD_KERNEL_BATCH", 20000))
rng = np.random.RandomState(0)
eps = rng.normal(0.0, 2.5e-3, size=(B, 3, 3))
eps_diag = np.zeros_like(eps)
eps_diag[:, np.arange(3), np.arange(3)] = eps[:, np.arange(3), np.arange(3)]


def fields(g):
    return GlobalFieldsAtPoint(fields={"u": jnp.zeros(3, dtype=g.dtype)},
                               grad_fields={"u": g})


def bench(solve, grad_u):
    gu = jnp.asarray(grad_u)
    gu0 = jnp.zeros_like(gu)
    xi_prev = jnp.zeros((B, model.num_dofs))
    f = jax.jit(jax.vmap(lambda xp, g, g0: solve(
        xp, xp, params.values, fields(g), fields(g0))))
    xi = f(xi_prev, gu, gu0)
    _ = float(jnp.sum(xi))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        xi = f(xi_prev, gu, gu0)
        _ = float(jnp.sum(xi))
        best = min(best, time.perf_counter() - t0)
    return B / best


def es(kind):
    return {"J2": {"J2": 0.0},
            "hill": {"hill": {"F": 0.45, "G": 0.55, "H": 0.5,
                              "L": 1.4, "M": 1.6, "N": 1.5}},
            "hosford": {"hosford": {"a": 100.0}},
            "hosford_principal": {"hosford_principal": {"a": 100.0}}}[kind]


results = {"batch": B, "backend": jax.default_backend(),
           "dtype": str(jnp.zeros(()).dtype), "rows": {}}
if jax.default_backend() == "tpu" and B < 1_000_000:
    # make the artifact self-describing: at sub-1M batch on TPU the
    # ~30 ms link dispatch floor is a visible fraction of each timed
    # call, so these are NOT kernel-isolated figures (see README)
    results["note"] = (
        f"batch {B} < 1M on TPU: numbers include the link's ~30 ms "
        "per-dispatch floor and understate kernel throughput; "
        "recorded at FE-realistic batch deliberately (README)")
    results["includes_dispatch_floor"] = True
for kind in ("J2", "hill", "hosford", "hosford_principal"):
    params = Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": es(kind),
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}})
    model = SmallRateElasticPlastic(params)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    gu = eps_diag if kind == "hosford" else eps

    if kind == "J2":
        from cmad_tpu.ops.return_map import make_j2_radial_return_for
        radial = make_j2_radial_return_for(model, prefer_pallas=False)
        reduced = lambda xp, xp2, pv, U, U0: radial(  # noqa: E731
            xp2, U.grad_fields["u"], U0.grad_fields["u"], pv)[0]
    elif kind == "hill":
        from cmad_tpu.ops.hill_return import make_hill_local_solve
        reduced = make_hill_local_solve(model, max_iters=40)
    elif kind == "hosford":
        from cmad_tpu.ops.hosford_return import make_hosford_local_solve
        reduced = make_hosford_local_solve(model, max_iters=40)
    else:
        from cmad_tpu.ops.principal_return import (
            make_principal_hosford_local_solve,
        )
        reduced = make_principal_hosford_local_solve(model, max_iters=40)

    ups_g = bench(generic, gu)
    ups_r = bench(reduced, gu)
    print(f"{kind:18s} generic {ups_g:10.0f}/s  reduced {ups_r:10.0f}/s"
          f"  speedup {ups_r / ups_g:5.1f}x")
    results["rows"][kind] = {"generic_updates_per_sec": round(ups_g),
                             "reduced_updates_per_sec": round(ups_r)}

out = (Path(__file__).resolve().parent
       / f"results_{results['backend']}.json")
out.write_text(json.dumps(results, indent=2))
