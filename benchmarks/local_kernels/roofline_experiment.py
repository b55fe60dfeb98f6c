"""Is the fused SoA history kernel HBM-bound or VPU-bound?

Two controlled sweeps over the fused-history Pallas kernel
(``ops/pallas_radial_return.py _kernel_soa_hist``), on device:

1. **Newton-iteration sweep** at fixed chunk (t_steps=8): the HBM
   traffic is identical for every point; only the arithmetic per update
   changes (one exp + div + ~8 VPU ops per iteration). If wall time
   scales ~linearly with the iteration count, the kernel is
   compute(VPU)-bound; if it is flat, it is HBM-bound.
2. **Chunk (t_steps) sweep** at fixed iterations: bytes/update =
   32 + 64/t_steps (strain rows always stream; state amortizes across
   the chunk). If throughput keeps rising as traffic falls, HBM was the
   limiter; if it saturates, the VPU is.

Writes ``roofline_experiment.json`` next to this file and prints a
table. Run on the TPU (takes ~1 min).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmad_tpu.ops import pallas_radial_return as prr

_TILE = prr._TILE_SOA
N = 2_097_152          # 256 tiles
T = 16                 # history steps timed per call
REPS = 8


def _make_hist_call(t_steps: int, newton_iters: int):
    def kernel(scalars_ref, xi_ref, de_hist_ref, out_ref):
        mu, lam = scalars_ref[0], scalars_ref[1]
        Y, S, D = scalars_ref[2], scalars_ref[3], scalars_ref[4]
        xi_rows = tuple(xi_ref[r:r + 1, :] for r in range(7))
        for t in range(t_steps):
            de_rows = tuple(de_hist_ref[t, r:r + 1, :] for r in range(6))
            xi_rows = prr._radial_rows(xi_rows, de_rows, mu, lam, Y, S, D,
                                       newton_iters=newton_iters)
        for r in range(7):
            out_ref[r:r + 1, :] = xi_rows[r]
        out_ref[7:8, :] = jnp.zeros_like(xi_rows[6])

    @jax.jit
    def call(xi_soa, de_hist, scalars):
        B = xi_soa.shape[1]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // _TILE,),
                in_specs=[
                    pl.BlockSpec((8, _TILE), lambda i, s: (0, i)),
                    pl.BlockSpec((t_steps, 8, _TILE),
                                 lambda i, s: (0, 0, i)),
                ],
                out_specs=pl.BlockSpec((8, _TILE), lambda i, s: (0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, B), xi_soa.dtype),
        )(scalars, xi_soa, de_hist)
    return call


def _drive(call, chunks, xi0, scalars):
    xi = xi0
    for ch in chunks:
        xi = call(xi, ch, scalars)
    return xi


def _stage(de_np, t_steps):
    """Per-chunk device arrays, staged OUTSIDE the timed region (an
    in-loop de_hist[a:b] materializes a copy per call inside the
    measurement; staging from a device array via numpy would
    round-trip GBs through the tunnel). ~30-90 s/row on this link —
    reuse across rows with the same t_steps."""
    return [jnp.asarray(de_np[c * t_steps:(c + 1) * t_steps])
            for c in range(T // t_steps)]


def _time(call, chunks, xi0, scalars):
    # block_until_ready does NOT synchronize through the axon tunnel:
    # chain xi through REPS full drives and use ONE host readback as
    # the barrier (bench.py timed_chain discipline), best of 3
    float(jnp.sum(_drive(call, chunks, xi0, scalars)))
    best = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        xi = xi0
        for _ in range(REPS):
            xi = _drive(call, chunks, xi, scalars)
        float(jnp.sum(xi))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main() -> None:
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    xi0_np = rng.normal(0, 50.0, (8, N)).astype(np.float32)
    xi0_np[6] = np.abs(xi0_np[6]) * 1e-3
    xi0_np[7] = 0.0
    xi0 = jnp.asarray(xi0_np, dtype)
    de = rng.normal(0, 2e-3, (T, 8, N)).astype(np.float32)
    de[:, 6:] = 0.0
    # mu, lam, Y, S, D — the bench.py material
    scalars = jnp.asarray([76923.1, 115384.6, 250.0, 200.0, 20.0], dtype)

    out = {"n_points": N, "t_hist": T, "device":
           jax.devices()[0].device_kind, "iters_sweep": [],
           "chunk_sweep": []}

    print(f"== Newton-iteration sweep (t_steps=8, {N} pts, T={T}) ==")
    chunks8 = _stage(de, 8)
    base = None
    for iters in (1, 2, 4, 8, 12):
        call = _make_hist_call(8, iters)
        wall = _time(call, chunks8, xi0, scalars)
        ups = N * T / wall
        base = base or wall
        row = {"newton_iters": iters, "wall_s": round(wall, 4),
               "updates_per_sec": round(ups / 1e9, 3),
               "wall_vs_iters1": round(wall / base, 2)}
        out["iters_sweep"].append(row)
        print(row)

    print("== chunk sweep (iters=8) ==")
    for t_steps in (1, 2, 4, 8, 16):
        call = _make_hist_call(t_steps, 8)
        chunks = chunks8 if t_steps == 8 else _stage(de, t_steps)
        wall = _time(call, chunks, xi0, scalars)
        ups = N * T / wall
        bpu = 32 + 64 / t_steps
        row = {"t_steps": t_steps, "wall_s": round(wall, 4),
               "updates_per_sec": round(ups / 1e9, 3),
               "bytes_per_update": round(bpu, 1),
               "hbm_gbps": round(ups * bpu / 1e9, 1)}
        out["chunk_sweep"].append(row)
        print(row)
        path = Path(__file__).parent / "roofline_experiment.json"
        path.write_text(json.dumps(out, indent=1))

    path = Path(__file__).parent / "roofline_experiment.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
