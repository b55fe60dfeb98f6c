"""Record an al7079 Hill-calibration run: wall, recovery, phase profile.

    python benchmarks/al7079/record_run.py [--maxiter 40]

Writes al7079_<backend>_<optimizer>.json next to this file. On TPU the
device L-BFGS loop runs the whole optimization in one dispatch; the
phase profile separates synthetic-data generation, trace+lower,
XLA compile and execute so tunnel-latency noise is attributable
(see README).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxiter", type=int, default=40)
    ap.add_argument("--optimizer", default="auto")
    args = ap.parse_args()

    import jax
    import numpy as np

    backend = jax.default_backend()

    from cmad_tpu.calibrations.al7079.multi_experiment_hill_calibration \
        import run_calibration
    from cmad_tpu.calibrations.al7079.support import (
        calibrated_hill_coefficients,
    )

    t0 = time.perf_counter()
    result, fitted = run_calibration(maxiter=args.maxiter,
                                     optimizer=args.optimizer)
    wall = time.perf_counter() - t0

    truth = np.asarray(calibrated_hill_coefficients(), dtype=np.float64)
    fitted = np.asarray(fitted, dtype=np.float64)
    max_err = float(np.abs(fitted - truth).max())

    out = {
        "metric": "al7079_hill_calibration_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "backend": backend,
        "optimizer": getattr(result, "method", args.optimizer),
        "maxiter": args.maxiter,
        "nit": int(result.nit),
        "J_final": float(result.fun),
        "max_coeff_err": max_err,
        "success": bool(result.success),
    }
    name = f"al7079_{backend}_{out['optimizer']}.json"
    (HERE / name).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
