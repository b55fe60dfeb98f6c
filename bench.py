"""cmad_tpu headline benchmark: integration-point stress updates/sec.

The north-star metric (BASELINE.json) is J2+Voce elastic-plastic
return-map throughput, reported for the three dispatch surfaces a user
actually hits, all on the default jax backend (TPU when present, f32)
against the reference measured on host CPU
(``benchmarks/measure_reference_baseline.py``):

- ``value`` (headline): the PUBLIC streaming-history API
  ``ops/return_map.py make_j2_history_drive`` — a DRIVE_T-step strain
  history against component-major state, tile-padded once. On TPU the
  whole history is ONE pallas_call (grid = tiles x chunks, state
  VMEM-resident end to end) in the ``layout='wide'`` form (component c
  on sublane rows [8c, 8c+8)), with the history GENERATED in that
  layout; ``soa8_updates_per_sec`` is the same drive in the default
  (8, N) layout. This is the held-state workload: time-stepped point
  histories / calibration ensembles. No grad_u conversion or sigma
  materialization in the timed region; ``bytes_per_update`` and the
  roofline figures are for exactly this workload.
- ``fe_dispatch_updates_per_sec``: what COUPLED FE assembly dispatches
  per call since the fem/j2_block.py fast path — AoS (N, 7) state
  packed to SoA, the differentiable SoA kernel (ops/j2_soa_ad.py), and
  the state unpacked back to the AoS carry, chained through the
  pack/unpack boundary each step (conservative: inside the FE Newton
  loop the pack is loop-invariant and XLA may hoist it).
- ``generic_newton_updates_per_sec``: the generic vmapped IFT-Newton
  kernel — what non-specializable yields run.
- ``mixed_regime_updates_per_sec``: the headline workload at a
  majority-ELASTIC plastic fraction (realistic FE step mix), since the
  default batch is ~99% plastic, which flatters a branch-free kernel.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("CMAD_X64", "0")  # float32 on the accelerator

REPO_ROOT = Path(__file__).resolve().parent


def _guard_dead_tunnel() -> None:
    """If the axon TPU relay is dead, EVERY ``import jax`` hangs forever
    in the plugin's reconnect loop (the sitecustomize on PYTHONPATH
    registers it unconditionally). Probe the relay port before touching
    jax; on a dead tunnel re-exec with the hook stripped so the bench
    still reports a (CPU) number instead of wedging the harness."""
    if os.environ.get("CMAD_BENCH_NO_TUNNEL_GUARD"):
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=5):
            return  # relay alive
    except OSError:
        pass
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CMAD_BENCH_NO_TUNNEL_GUARD"] = "1"
    env["CMAD_BENCH_TUNNEL_DOWN"] = "1"
    env.setdefault("CMAD_BENCH_BATCH", "100000")  # CPU-sized batch
    sys.stderr.write(
        "bench.py: TPU relay port 8082 closed — tunnel daemon dead; "
        "re-executing on CPU so a benchmark line is still emitted\n")
    os.execve(sys.executable, [sys.executable, __file__], env)


_guard_dead_tunnel()


def measure_ours(batch: int | None = None, reps: int = 5):
    if batch is None:
        # tile multiple (512 x 8192): no padding copies inside the
        # timed regions
        batch = int(os.environ.get("CMAD_BENCH_BATCH", 4_194_304))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )
    from cmad_tpu.ops.return_map import make_batched_return_map
    from cmad_tpu.parameters.parameters import Parameters

    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"J2": 0.0},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0, "D": 20.0}}}}}
    params = Parameters(values)
    model = SmallRateElasticPlastic(params)
    # the generic IFT-Newton kernel (what non-specializable yields run)
    step = make_batched_return_map(model)

    rng = np.random.RandomState(0)
    eps = rng.normal(0.0, 1.5e-3, size=(batch, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    dtype = jnp.float32
    grad_u = jnp.asarray(eps, dtype=dtype)
    grad_u_prev = jnp.zeros((batch, 3, 3), dtype=dtype)
    xi_prev = jnp.zeros((batch, model.num_dofs), dtype=dtype)
    # push params to device once: host numpy leaves would otherwise be
    # re-uploaded through the tunnel on every dispatch
    pv = jax.tree.map(lambda x: jnp.asarray(x, dtype), params.values)

    def timed(fn, xi0, gu, gu0, n_reps, inner=8):
        # Timing rules for this platform: block_until_ready() does NOT
        # reliably synchronize through the device tunnel, so force a
        # host readback as the barrier. The kernel is chained ``inner``
        # times INSIDE one jit (lax.scan carrying xi) so per-dispatch
        # tunnel latency (~10 ms) is amortized and the number measures
        # device throughput, not dispatch overhead; chaining also stops
        # XLA from eliding duplicate dispatches.
        import jax as _jax
        from jax import lax as _lax

        @_jax.jit
        def chained(xi0, gu, gu0, pv):
            def one(xi, _):
                xi_new, sigma = fn(xi, gu, gu0, pv)
                return xi_new, sigma

            xi_fin, sigmas = _lax.scan(one, xi0, None, length=inner)
            return xi_fin, sigmas[-1]

        xi, sigma = chained(xi0, gu, gu0, pv)
        _ = float(jnp.sum(sigma))  # compile barrier
        best = float("inf")
        for _round in range(3):  # best-of-3: tunnel warmup fades over ~1s
            t0 = time.perf_counter()
            xi_c = xi0
            for _ in range(n_reps):
                xi_c, sigma = chained(xi_c, gu, gu0, pv)
            _ = float(jnp.sum(sigma)) + float(jnp.sum(xi_c[0]))  # readback
            best = min(best, time.perf_counter() - t0)
        return xi0.shape[0] * inner * n_reps / best, xi

    # the generic IFT-Newton kernel on a quarter slice (it is ~400x
    # slower than the streaming kernels; the slice keeps the wall sane)
    nq = max(batch // 4, 1)
    ups_generic, _ = timed(step, xi_prev[:nq], grad_u[:nq],
                           grad_u_prev[:nq], reps, inner=2)
    # single un-chained application for the residual sanity check (the
    # chained timing state accumulates the strain increment repeatedly)
    xi, _sigma = jax.jit(step)(xi_prev, grad_u, grad_u_prev, pv)

    from cmad_tpu.ops.j2_radial_return import (
        j2_voce_scalars,
        pack_state_soa,
        strain_increment_soa,
        unpack_state_soa,
    )
    from cmad_tpu.ops.j2_soa_ad import make_soa_step_ad
    from cmad_tpu.ops.return_map import make_j2_history_drive

    de_soa = strain_increment_soa(grad_u, grad_u_prev)
    xi_aos = xi_prev[:, :7]
    scalars = j2_voce_scalars(pv, de_soa.dtype)
    inner = 8

    # the FE COUPLED dispatch (fem/j2_block.py fast path): AoS state ->
    # pack -> differentiable SoA kernel -> unpack to the AoS carry.
    # Chained through the pack/unpack boundary each step — conservative
    # for the FE Newton loop, where the pack is loop-invariant.
    step_ad = make_soa_step_ad()

    @jax.jit
    def fe_chain(xi_a, de, sc):
        for _ in range(inner):
            xi_a = unpack_state_soa(step_ad(pack_state_soa(xi_a), de, sc))
        return xi_a

    def timed_chain(run, state0, *args):
        out = run(state0, *args)
        _ = float(jnp.sum(out[0]))  # compile barrier
        best = float("inf")
        for _round in range(3):  # best-of-3: tunnel warmup fades ~1s
            t0 = time.perf_counter()
            st = state0
            for _ in range(reps):
                st = run(st, *args)
            _ = float(jnp.sum(st[0]))  # readback barrier
            best = min(best, time.perf_counter() - t0)
        return batch * inner * reps / best

    ups_fe = timed_chain(fe_chain, xi_aos, de_soa, scalars)

    # THE HEADLINE: the public streaming-history API — a T-step strain
    # history against tile-aligned component-major state. On TPU the
    # whole chunk-aligned history runs as ONE pallas_call (grid =
    # tiles x chunks, state resident in VMEM end to end; HBM traffic
    # 32 + 64/T B/update) in the WIDE layout (``layout='wide'``:
    # component c on rows [8c, 8c+8) of a (64, N/8) array — 1.21x the
    # default layout, 52% of HBM roofline). The history is GENERATED in
    # that layout (one conversion outside the timed region — a
    # boundary relayout inside the loop would cost ~4x the kernel;
    # pallas_radial_return.py layout note). ``soa8_updates_per_sec``
    # reports the default-layout drive on the identical history.
    # T = DRIVE_T steps on half the point batch keeps the history ~2 GB.
    drive = make_j2_history_drive(params)
    n_drive = batch // 2
    xi0_soa = pack_state_soa(xi_aos[:n_drive])
    de_drive = de_soa[:, :n_drive]

    def timed_drive(drive_fn, x0, dh):
        out = drive_fn(x0, dh, pv)
        _ = float(jnp.sum(out))  # compile barrier
        best = float("inf")
        for _round in range(3):
            t0 = time.perf_counter()
            st = x0
            for _ in range(reps):
                st = drive_fn(st, dh, pv)
            _ = float(jnp.sum(st))
            best = min(best, time.perf_counter() - t0)
        return n_drive * DRIVE_T * reps / best

    # the histories are ~4.3 GB each at T=64 — build/convert/free one
    # at a time (two may coexist at any moment; HBM is 16 GB)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from cmad_tpu.ops.pallas_radial_return import _from_wide, _to_wide

        drive_wide = make_j2_history_drive(params, layout="wide")
        xi0_wide = _to_wide(xi0_soa)

    de_hist = jnp.tile(de_drive[None], (DRIVE_T, 1, 1))
    ups_soa8 = timed_drive(drive, xi0_soa, de_hist)
    if on_tpu:
        # one-time conversion OUTSIDE the timed region (the documented
        # usage: produce the history in the device-preferred layout)
        de_hist_wide = _to_wide(de_hist)
        del de_hist
        ups = timed_drive(drive_wide, xi0_wide, de_hist_wide)
        del de_hist_wide
    else:
        ups = ups_soa8
        del de_hist

    # mixed-regime row: same workload at a majority-elastic mix (the
    # default batch is ~99% plastic after the chained steps, which
    # flatters a branch-free kernel — a realistic FE step is mostly
    # elastic). ~60% of points stay below yield at the END of one
    # drive (DRIVE_T chained steps accumulate the increment linearly)
    de_hist_mixed = jnp.tile((de_drive * (0.045 * 8 / DRIVE_T))[None],
                             (DRIVE_T, 1, 1))
    if on_tpu:
        de_mixed_wide = _to_wide(de_hist_mixed)
        del de_hist_mixed
        ups_mixed = timed_drive(drive_wide, xi0_wide, de_mixed_wide)
        xi_mix_fin = _from_wide(drive_wide(xi0_wide, de_mixed_wide, pv))
        del de_mixed_wide
    else:
        ups_mixed = timed_drive(drive, xi0_soa, de_hist_mixed)
        xi_mix_fin = drive(xi0_soa, de_hist_mixed, pv)
        del de_hist_mixed
    frac_mixed = float((np.asarray(xi_mix_fin[6]) > 0).mean())

    # convergence sanity: residual at the returned state
    C = model.C_batched(xi, xi_prev, params.values,
                        _fields(grad_u), _fields(grad_u_prev))
    max_res = float(jnp.max(jnp.linalg.norm(C, axis=-1)))
    frac_plastic = float((np.asarray(xi[:, 6]) > 0).mean())

    backend = jax.default_backend()
    return (ups, ups_soa8, ups_fe, ups_generic, ups_mixed, frac_mixed,
            max_res, frac_plastic, backend)


def _fields(grad_u):
    import jax.numpy as jnp

    from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
    batch = grad_u.shape[0]
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros((batch, 3), dtype=grad_u.dtype)},
        grad_fields={"u": grad_u})


def measure_notch_wall():
    """Warm wall-clock of the notch_hosford forward solve (north star
    #2; see benchmarks/notch_hosford/). Uses the reference's own mesh
    when mounted, else the repo's generated notch mesh. Returns
    (warm_s, baseline_s_or_None) or None if no mesh is available."""
    import shutil
    import tempfile

    import yaml

    mesh = Path("/root/reference/examples/meshes/notch.exo")
    ref_json = REPO_ROOT / "benchmarks/notch_hosford/reference_notch.json"
    ref_wall = (json.loads(ref_json.read_text())["value"]
                if ref_json.exists() else None)
    if not mesh.exists():
        mesh = REPO_ROOT / "examples/meshes/notch_h0.080.exo"
        ref_wall = None  # different mesh — not comparable
        if not mesh.exists():
            return None

    import jax
    import jax.numpy as jnp

    workdir = Path(tempfile.mkdtemp(prefix="bench_notch_"))
    (workdir / "meshes").mkdir()
    shutil.copy(mesh, workdir / "meshes/notch.exo")
    deck = yaml.safe_load(
        (REPO_ROOT / "examples/notch_hosford.yaml").read_text())
    deck["discretization"]["mesh file"] = "meshes/notch.exo"
    deck.pop("output", None)
    if jax.default_backend() == "tpu":
        # two_level: aggregation/RBM coarse correction — at h=0.03 scale
        # it is 3.5x faster than jacobi AND restores 6-digit agreement
        # with the f64 direct solve (jacobi hits the iteration cap)
        deck["linear solver"] = {"type": "cg", "rtol": 1.0e-6,
                                 "max iters": 2000,
                                 "adaptive rtol": True,
                                 "preconditioner": {"type": "two_level"}}
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
            ls = deck["linear solver"]
            kwargs["linear_solver_settings"] = dict(ls)
        trajectory = build_fe_quasistatic_trajectory(fe, **kwargs)
        params = params_by_block_from_models(fe)
        st0 = FEState.from_problem(fe)
        state_init = (jnp.asarray(st0.U_at(0)),
                      {b: jnp.asarray(st0.xi_at(0, b))
                       for b in fe.models_by_block})
        t_jax = jnp.asarray([float(t) for t in bundle.t_schedule])
        import jax as _jax
        run = _jax.jit(lambda p, s: trajectory(fe.kernel_arrays, p, s,
                                               t_jax))
        U_steps, _, _ = run(params, state_init)
        _ = float(jnp.sum(U_steps))  # compile + readback barrier
        t0 = time.perf_counter()
        U_steps, _, _ = run(params, state_init)
        _ = float(jnp.sum(U_steps))
        warm = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    return warm, ref_wall


# Physical HBM traffic per SoA radial-return update, f32 component-major
# layout (8-row padded streams). Per-step dispatch: reads xi_soa (8) +
# de_soa (8), writes xi_soa (8) -> 96 B/update. The TPU history drive
# runs the WHOLE-HISTORY kernel (pallas_radial_return.py
# _kernel_soa_hist_full: one pallas_call, grid = tiles x chunks, state
# resident in VMEM for the full T steps), so the state traffic
# amortizes over the history: 32 (de stream) + 64/T (xi in+out once)
# B/update. Useful (unpadded) traffic is 5/8 (de) resp. 7/8 (xi) of
# either figure; charging the padding rows is the honest accounting.
# Per the r3 roofline experiment (benchmarks/local_kernels/
# roofline_experiment.json) the NARROW kernel saturates on issue rate
# past ~40 B/update; the wide layout lifts part of that (1.21x, 52% of
# roofline) — the residual gap is dispatch overhead + issue rate, so
# the roofline % is context, not the ceiling.
# history steps per headline drive call (8 chunks). 64 is a realistic
# calibration-history length; it also amortizes the link's measured
# fixed per-dispatch overhead (~4.3 ms/call through the axon tunnel —
# see benchmarks/local_kernels/README.md r3 wide-layout section) over
# 2x the work. The (T, 8, N) history is ~4.3 GB at the default batch.
DRIVE_T = 64
_BYTES_PER_UPDATE_STEP = 24 * 4
_BYTES_PER_UPDATE_FUSED = 8 * 4 + (16 * 4) // DRIVE_T


def _bytes_per_update(backend: str) -> int:
    return (_BYTES_PER_UPDATE_FUSED if backend == "tpu"
            else _BYTES_PER_UPDATE_STEP)

# peak HBM bandwidth by TPU generation (public spec sheets), bytes/s
_HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6e": 1640e9,
}


def _hbm_bw_for_device():
    import jax

    kind = jax.devices()[0].device_kind
    for key, bw in _HBM_BW.items():
        if key.lower() in kind.lower():
            return bw, kind
    return None, kind


def main() -> None:
    baseline_file = REPO_ROOT / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["value"]
    else:
        baseline = None

    (ups, ups_soa8, ups_fe, ups_generic, ups_mixed, frac_mixed, max_res,
     frac_plastic, backend) = measure_ours()
    notch = None
    try:
        notch = measure_notch_wall()
    except Exception:
        pass

    bw, device_kind = _hbm_bw_for_device()
    bpu = _bytes_per_update(backend)
    roofline_ups = bw / bpu if bw else None

    result = {
        "metric": "ip_stress_updates_per_sec",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / baseline, 2) if baseline else None,
        "backend": backend,
        "device_kind": device_kind,
        "dispatch": "public streaming-history API (ops/return_map.py "
                    f"make_j2_history_drive), T={DRIVE_T}-step history: "
                    "ONE whole-history pallas_call on TPU (state "
                    "VMEM-resident across the grid's chunk axis) in the "
                    "layout='wide' form, history generated in that "
                    "layout; lax.scan of XLA-fused steps off-TPU",
        "soa8_updates_per_sec": round(ups_soa8, 1),
        "soa8_note": "the same drive in the default (8, N) "
                     "component-major layout",
        "fe_dispatch_updates_per_sec": round(ups_fe, 1),
        "fe_dispatch_vs_baseline": (round(ups_fe / baseline, 2)
                                    if baseline else None),
        "fe_dispatch_note": "fem/j2_block.py COUPLED fast path boundary:"
                            " AoS (N,7) pack -> differentiable SoA "
                            "kernel -> AoS unpack, chained per step",
        "generic_newton_updates_per_sec": round(ups_generic, 1),
        "generic_newton_vs_baseline": (round(ups_generic / baseline, 2)
                                       if baseline else None),
        "mixed_regime_updates_per_sec": round(ups_mixed, 1),
        "mixed_regime_frac_plastic": frac_mixed,
        "bytes_per_update": bpu,
        "hbm_gbps_sustained": round(ups * bpu / 1e9, 1),
        "pct_hbm_roofline": (round(100.0 * ups / roofline_ups, 1)
                             if roofline_ups else None),
        "max_residual": max_res,
        "frac_plastic": frac_plastic,
        "baseline": baseline,
        "baseline_hardware": "reference cmad on host CPU (float64)",
    }
    if os.environ.get("CMAD_BENCH_TUNNEL_DOWN"):
        result["note"] = ("TPU tunnel daemon was dead at bench time; "
                         "this is the CPU fallback, not a TPU number "
                         "(see the last recorded TPU run)")
    if notch is not None:
        warm, ref_wall = notch
        result["notch_hosford_wall_s"] = round(warm, 2)
        if ref_wall is not None:
            result["notch_vs_baseline"] = round(ref_wall / warm, 2)
            result["notch_baseline_wall_s"] = ref_wall
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
