"""cmad_tpu headline benchmark: integration-point stress updates/sec.

The north-star metric (BASELINE.json) is J2+Voce elastic-plastic
return-map throughput, reported for the dispatch surfaces a user
actually hits, all on the default jax backend (TPU when present, f32)
against the reference measured on host CPU
(``benchmarks/measure_reference_baseline.py``):

- ``value`` (headline): the PUBLIC streaming-history API
  ``ops/return_map.py make_j2_history_drive`` — a DRIVE_T-step strain
  history against component-major state, tile-padded once. On TPU the
  whole history is ONE pallas_call (grid = tiles x chunks, state
  VMEM-resident end to end); the headline is the faster of the two
  public layouts (``soa8`` default / ``layout='wide'``) as measured in
  the same run. This is the held-state workload: time-stepped point
  histories / calibration ensembles.
- ``fe_dispatch_updates_per_sec``: what COUPLED FE assembly dispatches
  per call since the fem/j2_block.py fast path — AoS (N, 7) state
  packed to SoA, the differentiable SoA kernel (ops/j2_soa_ad.py), and
  the state unpacked back to the AoS carry, chained through the
  pack/unpack boundary each step.
- ``generic_newton_updates_per_sec``: the generic vmapped IFT-Newton
  kernel — what non-specializable yields run.
- ``mixed_regime_updates_per_sec``: the headline workload at a
  majority-ELASTIC plastic fraction (realistic FE step mix).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Structure: the top-level process is a thin ORCHESTRATOR that never
imports jax. It launches the measurement (``bench.py --worker``) in a
subprocess and falls back to a CPU worker if the TPU worker produces
nothing. The WORKER carries an internal watchdog thread that publishes
whatever stages have completed if the deadline arrives mid-stage (a
device call wedged in the tunnel cannot block the thread), so one json
line is printed well inside the harness timeout — the round-3 record
was lost to an rc=124 timeout through a cold tunnel (BENCH_r03.json).
Stages run most-important-first: the headline drive lands within ~4 min
even cold; the expensive auxiliary compiles (notch wall, generic
IFT-Newton) run last.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

os.environ.setdefault("CMAD_X64", "0")  # float32 on the accelerator

REPO_ROOT = Path(__file__).resolve().parent


# --------------------------------------------------------------------
# orchestrator (no jax imports here)
# --------------------------------------------------------------------

def _tunnel_alive() -> bool:
    """The axon TPU relay: if the daemon is dead, EVERY ``import jax``
    hangs forever in the plugin's reconnect loop (the sitecustomize on
    PYTHONPATH registers it unconditionally). Probe the relay port
    before launching any jax-importing worker."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # no tunnel configured: default backend is fine
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=5):
            return True
    except OSError:
        return False


def _cpu_env(env: dict) -> dict:
    env = dict(env)
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CMAD_BENCH_TUNNEL_DOWN"] = "1"
    env.setdefault("CMAD_BENCH_BATCH", "100000")  # CPU-sized batch
    env.setdefault("CMAD_BENCH_SKIP", "notch")   # CPU notch is minutes
    return env


def _orchestrate() -> int:
    import subprocess

    budget = float(os.environ.get("CMAD_BENCH_BUDGET_S", "540"))
    t_start = time.monotonic()

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    base = dict(os.environ)
    attempts = []
    tpu_cap = min(430.0, budget - 130.0)
    if _tunnel_alive() and tpu_cap > 0:
        # leave 130 s for the CPU fallback should the TPU worker die
        # before measuring anything (watchdog partials cover mid-run
        # stalls, so this only triggers on a wedged startup)
        attempts.append(("tpu", base, tpu_cap))
    elif _tunnel_alive():
        sys.stderr.write(
            "bench.py: budget too small to attempt TPU (needs > 130 s "
            "headroom); going straight to CPU\n")
    else:
        sys.stderr.write(
            "bench.py: TPU relay port 8082 closed — tunnel daemon dead; "
            "falling straight back to CPU\n")
    attempts.append(("cpu", _cpu_env(base), 150.0))

    last_err = ""
    for name, env, cap in attempts:
        tmo = min(cap, max(remaining() - 15.0, 30.0))
        if remaining() < 25.0:
            break
        env = dict(env)
        env["CMAD_BENCH_WORKER_BUDGET_S"] = str(max(tmo - 10.0, 20.0))
        sys.stderr.write(
            f"bench.py: attempt '{name}' (timeout {tmo:.0f}s)\n")
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker"],
                env=env, capture_output=True, text=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            last_err = f"attempt '{name}' timed out after {tmo:.0f}s"
            sys.stderr.write("bench.py: " + last_err + "\n")
            continue
        sys.stderr.write(proc.stderr)
        line = next((ln for ln in reversed(proc.stdout.splitlines())
                     if ln.startswith("{")), None)
        if line:
            print(line)
            return 0
        last_err = (f"attempt '{name}' rc={proc.returncode}: "
                    + proc.stderr.strip().splitlines()[-1][:300]
                    if proc.stderr.strip() else
                    f"attempt '{name}' rc={proc.returncode}")
        sys.stderr.write("bench.py: " + last_err + "\n")
    # every attempt failed: still print one parseable line
    print(json.dumps({
        "metric": "ip_stress_updates_per_sec", "value": 0.0,
        "unit": "updates/s", "vs_baseline": 0.0,
        "error": "all bench attempts failed or timed out",
        "last_error": last_err}))
    return 0


# --------------------------------------------------------------------
# worker
# --------------------------------------------------------------------

_T0 = time.monotonic()

# stages publish into RESULT as they complete; the watchdog thread
# prints whatever is here if the deadline arrives mid-stage
RESULT: dict = {}
_RESULT_LOCK = threading.Lock()
_DONE = threading.Event()


def _stage(msg: str) -> None:
    sys.stderr.write(f"bench.py[worker] +{time.monotonic() - _T0:6.1f}s "
                     f"{msg}\n")
    sys.stderr.flush()


def _publish(**kv) -> None:
    with _RESULT_LOCK:
        RESULT.update(kv)


def _emit(partial_stage: str | None = None) -> None:
    with _RESULT_LOCK:
        out = dict(RESULT)
    if partial_stage is not None:
        out["note_partial"] = (
            "worker deadline hit during stage "
            f"'{partial_stage}'; later stages omitted")
    if os.environ.get("CMAD_BENCH_TUNNEL_DOWN"):
        out["note"] = ("TPU tunnel daemon was dead at bench time; "
                       "this is the CPU fallback, not a TPU number "
                       "(see the last recorded TPU run)")
    print(json.dumps(out))
    sys.stdout.flush()


_CURRENT_STAGE = ["startup"]


def _watchdog(deadline_s: float) -> None:
    if not _DONE.wait(timeout=deadline_s):
        stage = _CURRENT_STAGE[0]
        _stage(f"WATCHDOG fired during '{stage}'")
        with _RESULT_LOCK:
            have_headline = "value" in RESULT
        if have_headline:
            _emit(partial_stage=stage)
            os._exit(0)
        os._exit(3)  # nothing measured — let the orchestrator fall back


def _enter(stage: str) -> None:
    _CURRENT_STAGE[0] = stage
    _stage(f"stage '{stage}'")


def _skips() -> set:
    return set(filter(None, os.environ.get(
        "CMAD_BENCH_SKIP", "").split(",")))


# history steps per headline drive call (8 chunks). 64 is a realistic
# calibration-history length; it also amortizes the link's measured
# fixed per-dispatch overhead (~4.3 ms/call through the axon tunnel —
# see benchmarks/local_kernels/README.md r3 wide-layout section).
# The (T, 8, N) history is ~4.3 GB at the default batch.
DRIVE_T = int(os.environ.get("CMAD_BENCH_DRIVE_T", 64))

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
# past ~40 B/update; the wide layout lifts part of that — the residual
# gap is dispatch overhead + issue rate, so the roofline % is context,
# not the ceiling.
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


def _worker_main() -> int:
    deadline = float(os.environ.get("CMAD_BENCH_WORKER_BUDGET_S", "420"))
    threading.Thread(target=_watchdog, args=(deadline,),
                     daemon=True).start()

    batch = int(os.environ.get("CMAD_BENCH_BATCH", 4_194_304))
    reps = int(os.environ.get("CMAD_BENCH_REPS", 5))
    skips = _skips()
    _stage(f"worker start (batch={batch}, reps={reps}, T={DRIVE_T}, "
           f"skip={sorted(skips)}, deadline={deadline:.0f}s)")

    baseline_file = REPO_ROOT / "BASELINE_MEASURED.json"
    baseline = (json.loads(baseline_file.read_text())["value"]
                if baseline_file.exists() else None)

    def _vs(x):
        return round(x / baseline, 2) if (baseline and x) else None

    _enter("jax-init")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )
    from cmad_tpu.parameters.parameters import Parameters

    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"J2": 0.0},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0,
                                                   "D": 20.0}}}}}
    params = Parameters(values)
    model = SmallRateElasticPlastic(params)
    dtype = jnp.float32
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    bw, device_kind = _hbm_bw_for_device()
    bpu = _bytes_per_update(backend)
    roofline_ups = bw / bpu if bw else None
    _publish(
        metric="ip_stress_updates_per_sec", unit="updates/s",
        backend=backend, device_kind=device_kind,
        bytes_per_update=bpu, baseline=baseline,
        baseline_hardware="reference cmad on host CPU (float64)")

    _enter("inputs")
    # generate the strain batch ON DEVICE: a host-side 151 MB upload
    # through the tunnel costs tens of seconds cold
    @jax.jit
    def _gen_inputs(key):
        eps = 1.5e-3 * jax.random.normal(key, (batch, 3, 3), dtype=dtype)
        eps = 0.5 * (eps + jnp.swapaxes(eps, 1, 2))
        return eps

    grad_u = _gen_inputs(jax.random.PRNGKey(0))
    grad_u_prev = jnp.zeros((batch, 3, 3), dtype=dtype)
    xi_prev = jnp.zeros((batch, model.num_dofs), dtype=dtype)
    # push params to device once: host numpy leaves would otherwise be
    # re-uploaded through the tunnel on every dispatch
    pv = jax.tree.map(lambda x: jnp.asarray(x, dtype), params.values)
    jax.block_until_ready(grad_u)
    _ = float(grad_u[0, 0, 0])  # tunnel barrier: block_until_ready lies
    _stage(f"jax ready: backend={backend}, inputs staged on device")

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

    # ---------------- headline: streaming history drive ----------------
    _enter("history-drive")
    drive = make_j2_history_drive(params)
    n_drive = batch // 2
    xi0_soa = pack_state_soa(xi_aos[:n_drive])
    de_drive = de_soa[:, :n_drive]

    def timed_drive(drive_fn, x0, dh):
        out = drive_fn(x0, dh, pv)
        _ = float(jnp.sum(out))  # compile barrier
        best = float("inf")
        for _round in range(3):  # best-of-3: tunnel warmup fades ~1s
            t0 = time.perf_counter()
            st = x0
            for _ in range(reps):
                st = drive_fn(st, dh, pv)
            _ = float(jnp.sum(st))
            best = min(best, time.perf_counter() - t0)
        return n_drive * DRIVE_T * reps / best

    if on_tpu:
        from cmad_tpu.ops.pallas_radial_return import _from_wide, _to_wide

        drive_wide = make_j2_history_drive(params, layout="wide")
        xi0_wide = _to_wide(xi0_soa)

    de_hist = jnp.tile(de_drive[None], (DRIVE_T, 1, 1))
    ups_soa8 = timed_drive(drive, xi0_soa, de_hist)
    _stage(f"soa8 history drive done: {ups_soa8:.3g} ups")
    if on_tpu:
        # one-time conversion OUTSIDE the timed region (the documented
        # usage: produce the history in the device-preferred layout; a
        # boundary relayout inside the loop would cost ~4x the kernel)
        de_hist_wide = _to_wide(de_hist)
        del de_hist
        ups_wide = timed_drive(drive_wide, xi0_wide, de_hist_wide)
        _stage(f"wide history drive done: {ups_wide:.3g} ups")
        del de_hist_wide
        # HEADLINE: the better of the two public layouts as measured in
        # THIS run — through the shared tunnel either layout can win on
        # a given day (both are one pallas_call; the layout is a user
        # knob on make_j2_history_drive)
        ups = max(ups_wide, ups_soa8)
        headline_layout = "wide" if ups_wide >= ups_soa8 else "soa8"
    else:
        ups = ups_soa8
        ups_wide = None
        headline_layout = "soa8"
        del de_hist
    _publish(
        value=round(ups, 1), vs_baseline=_vs(ups),
        headline_layout=headline_layout,
        dispatch="public streaming-history API (ops/return_map.py "
                 f"make_j2_history_drive), T={DRIVE_T}-step history: "
                 "ONE whole-history pallas_call on TPU (state "
                 "VMEM-resident across the grid's chunk axis); headline "
                 "is the faster of the two public layouts as measured "
                 f"this run (won: {headline_layout}); lax.scan of "
                 "XLA-fused steps off-TPU",
        soa8_updates_per_sec=round(ups_soa8, 1),
        soa8_note="the same drive in the default (8, N) "
                  "component-major layout",
        wide_updates_per_sec=(round(ups_wide, 1)
                              if ups_wide is not None else None),
        hbm_gbps_sustained=round(ups * bpu / 1e9, 1),
        pct_hbm_roofline=(round(100.0 * ups / roofline_ups, 1)
                          if roofline_ups else None))

    # ---------------- mixed-regime row ----------------
    # same workload at a majority-elastic mix (the default batch is
    # ~99% plastic after the chained steps, which flatters a
    # branch-free kernel — a realistic FE step is mostly elastic).
    # ~60% of points stay below yield at the END of one drive (DRIVE_T
    # chained steps accumulate the increment linearly)
    if "mixed" not in skips:
        _enter("mixed-regime")
        de_hist_mixed = jnp.tile(
            (de_drive * (0.045 * 8 / DRIVE_T))[None], (DRIVE_T, 1, 1))
        if on_tpu:
            de_mixed_wide = _to_wide(de_hist_mixed)
            del de_hist_mixed
            ups_mixed = timed_drive(drive_wide, xi0_wide, de_mixed_wide)
            xi_mix_fin = _from_wide(drive_wide(xi0_wide, de_mixed_wide,
                                               pv))
            del de_mixed_wide
        else:
            ups_mixed = timed_drive(drive, xi0_soa, de_hist_mixed)
            xi_mix_fin = drive(xi0_soa, de_hist_mixed, pv)
            del de_hist_mixed
        frac_mixed = float((np.asarray(xi_mix_fin[6]) > 0).mean())
        del xi_mix_fin
        _stage(f"mixed regime done: {ups_mixed:.3g} ups")
        _publish(mixed_regime_updates_per_sec=round(ups_mixed, 1),
                 mixed_regime_frac_plastic=frac_mixed)

    # ---------------- FE COUPLED dispatch ----------------
    # (fem/j2_block.py fast path): since round 5 the FE drivers keep
    # the per-IP state CARRIER-resident (component-major (8, N),
    # fem/xi_carrier.py) across the whole drive — packed once at
    # trajectory entry, consumed/produced by every Newton iteration and
    # time step with zero relayouts, unpacked once where the history
    # materializes. This stage times exactly that boundary: one pack,
    # `inner` chained differentiable SoA-kernel steps, one unpack.
    # The r4 shape of this stage (pack+unpack per step) measured the
    # OLD boundary at 2.30 G updates/s vs 10.37 G for the pure kernel.
    _enter("fe-dispatch")
    step_ad = make_soa_step_ad()

    @jax.jit
    def fe_chain(xi_a, de, sc):
        xi_c = pack_state_soa(xi_a)       # trajectory-entry pack
        for _ in range(inner):
            xi_c = step_ad(xi_c, de, sc)  # carrier-resident steps
        return unpack_state_soa(xi_c)     # history materialization

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
    _stage(f"fe dispatch done: {ups_fe:.3g} ups")
    # per-step traffic: read xi (8 rows f32) + read de (8) + write xi
    # (8) = 96 B/update — unlike the history drive (one pallas_call,
    # state VMEM-resident across steps, 33 B/update amortized), a
    # chained per-STEP dispatch must round-trip state through HBM
    # every step (the FE Newton sits between steps), so its roofline
    # is bandwidth x (1/96B). Report the operating point against the
    # bandwidth the history kernel just sustained in THIS run.
    fe_bpu = 96
    sustained_gbps = ups * bpu / 1e9
    _publish(
        fe_dispatch_updates_per_sec=round(ups_fe, 1),
        fe_dispatch_vs_baseline=_vs(ups_fe),
        fe_dispatch_bytes_per_update=fe_bpu,
        fe_dispatch_gbps=round(ups_fe * fe_bpu / 1e9, 1),
        fe_dispatch_pct_sustained_bw=round(
            100.0 * ups_fe * fe_bpu / 1e9 / sustained_gbps, 1)
        if (on_tpu and sustained_gbps) else None,
        fe_dispatch_note="fem/j2_block.py COUPLED fast path boundary "
                         "as the drivers now dispatch it: ONE AoS->SoA "
                         "pack at trajectory entry, carrier-resident "
                         "differentiable SoA kernel steps "
                         "(fem/xi_carrier.py), ONE unpack at history "
                         "materialization. Per-step dispatches are "
                         "bandwidth-bound at 96 B/update (state must "
                         "cross HBM between FE Newton steps); "
                         "fe_dispatch_pct_sustained_bw is the fraction "
                         "of the bandwidth the whole-history kernel "
                         "sustained this run")

    # ---------------- residual sanity check ----------------
    # one SoA kernel step from the zero state, checked against the
    # model's own residual C (the thing the return map solves). This
    # validates the HEADLINE kernel's output; the generic IFT-Newton
    # path is FD-verified in tests/ops/.
    _enter("residual-check")
    xi1 = unpack_state_soa(jax.jit(step_ad)(pack_state_soa(xi_aos),
                                            de_soa, scalars))
    if model.num_dofs > 7:
        xi1 = jnp.concatenate(
            [xi1, jnp.zeros((batch, model.num_dofs - 7), dtype=dtype)],
            axis=1)
    C = model.C_batched(xi1, xi_prev, params.values,
                        _fields(grad_u), _fields(grad_u_prev))
    max_res = float(jnp.max(jnp.linalg.norm(C, axis=-1)))
    # scale context: the residual BEFORE the solve (zero update), in
    # the same (stress-like) units — the kernel reduces it to f32
    # roundoff at that scale, which reads as ~1e-2 absolute here
    C0 = model.C_batched(xi_prev, xi_prev, params.values,
                         _fields(grad_u), _fields(grad_u_prev))
    res_scale = float(jnp.max(jnp.linalg.norm(C0, axis=-1)))
    frac_plastic = float((np.asarray(xi1[:, 6]) > 0).mean())
    _stage(f"residual check done: max_res={max_res:.3g} "
           f"(initial scale {res_scale:.3g})")
    _publish(
        max_residual=max_res,
        residual_initial_scale=res_scale,
        residual_note="residual of ONE SoA-kernel step, evaluated via "
                      "the model's C in f32 — this number is the f32 "
                      "EVALUATION floor of C itself, not solution "
                      "error: C evaluated in f32 at the exact f64 "
                      "solution shows the same magnitude, and the same "
                      "step in f64 satisfies C to ~6e-16 (pinned by "
                      "tests/ops/test_soa_radial_return.py::"
                      "test_f32_step_residual_sits_on_the_evaluation_"
                      "floor)",
        frac_plastic=frac_plastic)

    # ---------------- notch forward-solve wall ----------------
    if "notch" not in skips:
        _enter("notch-wall")
        try:
            notch = measure_notch_wall()
        except Exception as exc:
            _stage(f"notch wall failed: {exc!r}")
            notch = None
        if notch is not None:
            warm, ref_wall = notch
            _stage(f"notch wall done: {warm:.2f}s")
            _publish(notch_hosford_wall_s=round(warm, 2))
            if ref_wall is not None:
                _publish(notch_vs_baseline=round(ref_wall / warm, 2),
                         notch_baseline_wall_s=ref_wall)

    # ---------------- generic IFT-Newton kernel ----------------
    # LAST: its compile alone is ~2.5 min through a cold tunnel. Timed
    # on a slice (it is ~1000x slower than the streaming kernels).
    if "generic" not in skips:
        _enter("generic-newton")
        from cmad_tpu.ops.return_map import make_batched_return_map

        step = make_batched_return_map(model)
        nq = max(batch // 4, 1)
        from jax import lax as _lax

        @jax.jit
        def chained(xi0, gu, gu0, pv):
            def one(xi, _):
                xi_new, sigma = step(xi, gu, gu0, pv)
                return xi_new, sigma

            xi_fin, sigmas = _lax.scan(one, xi0, None, length=2)
            return xi_fin, sigmas[-1]

        xi_c, sigma = chained(xi_prev[:nq], grad_u[:nq],
                              grad_u_prev[:nq], pv)
        _ = float(jnp.sum(sigma))  # compile barrier
        best = float("inf")
        for _round in range(3):
            t0 = time.perf_counter()
            st = xi_prev[:nq]
            for _ in range(reps):
                st, sigma = chained(st, grad_u[:nq], grad_u_prev[:nq],
                                    pv)
            _ = float(jnp.sum(sigma)) + float(jnp.sum(st[0]))
            best = min(best, time.perf_counter() - t0)
        ups_generic = nq * 2 * reps / best
        _stage(f"generic newton done: {ups_generic:.3g} ups")
        _publish(
            generic_newton_updates_per_sec=round(ups_generic, 1),
            generic_newton_vs_baseline=_vs(ups_generic))

    if skips:
        _publish(skipped_stages=sorted(skips))
    _DONE.set()
    _emit()
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.exit(_worker_main())
    sys.exit(_orchestrate())
