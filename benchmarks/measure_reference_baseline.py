"""Measure the reference (sandialabs/cmad, CPU JAX) return-map throughput.

BASELINE.md: the reference publishes no numbers, so the comparison target
must be measured (north-star metric: integration-point stress updates/sec).
This script runs the REFERENCE code (PYTHONPATH=/root/reference) on the
host CPU: vmap of its ``make_newton_solve`` over a batch of J2+Voce
elastic-plastic points — exactly the per-IP local Newton its COUPLED FE
assembly performs (cmad/fem/assembly.py:416-537).

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE = "/root/reference"


def main(batch: int = 16384, reps: int = 5) -> None:
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    sys.path.insert(0, REFERENCE)

    import types

    # the reference hard-imports netCDF4 (Exodus IO) at package import;
    # it is absent in this image and unused by this benchmark — stub it
    if "netCDF4" not in sys.modules:
        stub = types.ModuleType("netCDF4")
        stub.Dataset = object
        sys.modules["netCDF4"] = stub

    import jax
    jax.config.update("jax_platform_name", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax import vmap

    from cmad.models.global_fields import GlobalFieldsAtPoint
    from cmad.models.nonlinear_solver import make_newton_solve
    from cmad.models.small_rate_elastic_plastic import SmallRateElasticPlastic
    from cmad.parameters.parameters import Parameters

    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"J2": 0.0},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0, "D": 20.0}}}}}
    from jax.tree_util import tree_map

    flags = tree_map(lambda _: False, values)
    flags["plastic"]["flow stress"]["initial yield"]["Y"] = True
    transforms = tree_map(lambda _: None, values)
    params = Parameters(values, flags, transforms)
    model = SmallRateElasticPlastic(params)
    solve = make_newton_solve(model._residual)

    rng = np.random.RandomState(0)
    # strain increments straddling yield: ~half the batch goes plastic
    eps = rng.normal(0.0, 1.5e-3, size=(batch, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    zeros3 = jnp.zeros((batch, 3))
    z33 = jnp.zeros((batch, 3, 3))

    U = GlobalFieldsAtPoint(fields={"u": zeros3}, grad_fields={"u": grad_u})
    U_prev = GlobalFieldsAtPoint(fields={"u": zeros3},
                                 grad_fields={"u": z33})
    xi_prev = [jnp.zeros((batch, 6)), jnp.zeros((batch, 1))]

    step = jax.jit(vmap(
        lambda xp, U, Up: solve(xp, params.values, U, Up),
        in_axes=(0, 0, 0)))

    out = step(xi_prev, U, U_prev)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(xi_prev, U, U_prev)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ups = batch * reps / dt
    frac_plastic = float((np.asarray(out[1]) > 0).mean())
    result = {
        "metric": "ip_stress_updates_per_sec",
        "value": ups,
        "unit": "updates/s",
        "hardware": "host CPU (reference cmad, float64)",
        "batch": batch,
        "reps": reps,
        "frac_plastic": frac_plastic,
        "source": "vmap(make_newton_solve) over J2+Voce points, "
                  "cmad/models/nonlinear_solver.py:88",
    }
    print(json.dumps(result))
    (REPO_ROOT / "BASELINE_MEASURED.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
