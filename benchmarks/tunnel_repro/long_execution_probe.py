"""Minimized repro: does ONE long-running XLA execution survive this link?

Context (VERDICT r2 weak #4): the fused scan FE driver
(`fem/driver.py build_fe_quasistatic_trajectory`) "crashes or stalls
nondeterministically" on large meshes through the remote axon tunnel,
while the SAME program at 7k tets (10 s/execution) and the host-loop
driver at 47.6k tets (170 s across ~100 short dispatches) both run
fine.  Hypothesis: the tunnel (or the remote TPU worker's watchdog)
kills any SINGLE device execution whose wall time exceeds a ceiling —
i.e. the failure is per-execution duration, not program size, memory,
or our kernels.

This probe is framework-free: one jitted `lax.fori_loop` of f32
matmuls, sized to a target duration, one execution per fresh process
(so a killed worker can't poison the next point).  Usage:

    python long_execution_probe.py --seconds 5 20 60 120 240

Each point prints one JSON line {seconds_requested, seconds_measured,
ok, error}.  Run points in ascending order; a crashed worker usually
restarts within ~1 min.  Results recorded in results.json.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
from jax import lax

target_s = float(sys.argv[1])
n = 2048
x = jnp.ones((n, n), jnp.float32) * 1e-3

@jax.jit
def burn(x, iters):
    def body(i, a):
        a = a @ a * 1e-6 + x
        return a
    return lax.fori_loop(0, iters, body, x)

def run(iters):
    # block_until_ready is NOT a reliable barrier through the axon
    # tunnel (returns before remote execution completes); a scalar
    # host readback is — same discipline as bench.py.
    t0 = time.perf_counter()
    s = float(jnp.sum(burn(x, iters)))
    return time.perf_counter() - t0, s

run(10)  # compile
per_iter = run(200)[0] / 200
iters = max(1, int(target_s / per_iter))
dt, s = run(iters)
print(json.dumps({"seconds_requested": target_s,
                  "seconds_measured": round(dt, 1),
                  "per_iter_us": round(per_iter * 1e6, 1),
                  "iters": iters, "ok": True}))
"""


def probe(seconds: float) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, str(seconds)],
        capture_output=True, text=True, timeout=max(600, seconds * 4))
    wall = time.time() - t0
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    tail = (proc.stderr or "").strip().splitlines()
    return {"seconds_requested": seconds, "ok": False,
            "wall_to_failure": round(wall, 1),
            "error": tail[-1][:300] if tail else "no output"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, nargs="+",
                    default=[5, 20, 60, 120, 240])
    args = ap.parse_args()
    results = []
    for s in args.seconds:
        r = probe(s)
        print(json.dumps(r), flush=True)
        results.append(r)
        if not r["ok"]:
            time.sleep(90)  # give the worker time to restart
    with open("results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
