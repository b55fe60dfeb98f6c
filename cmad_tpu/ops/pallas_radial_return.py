"""Pallas TPU kernel for the analytic J2 radial return.

Hand-scheduled variant of :mod:`cmad_tpu.ops.j2_radial_return`: one
fused VMEM-resident pass per point tile — elastic predictor, trial
deviator, scalar Newton on the plastic multiplier, and the radial
corrector — with no intermediate HBM round-trips.

Layout is component-major: the batch rides the TPU lane axis and the
(few) state components ride sublanes, so every op in the kernel is a
full-width VPU op. Rows of the packed input (16, B):

    0:6   sigma_prev  (internal sym-vec order xx, xy, xz, yy, yz, zz)
    6     alpha_prev
    7:13  delta strain (same order)
    13:16 padding (sublane alignment)

Output (8, B): rows 0:6 updated stress, row 6 alpha, row 7 padding.
Material scalars arrive via scalar prefetch (SMEM).

Semantics (and the verification oracle) match the XLA-fused kernel in
ops/j2_radial_return.py; parity with reference
``cmad/models/small_rate_elastic_plastic.py:249`` J2 branch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.typing import JaxArray

_NEWTON_ITERS = 8
_TILE = 2048  # lanes per grid step (16 sublane-rows x 2048 f32 = 128 KiB)


def _kernel(scalars_ref, packed_ref, out_ref):
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    # per-row ref loads (block loads + value slicing cost sublane
    # relayouts per extract — see _kernel_soa)
    alpha_prev = packed_ref[6:7, :]

    # elastic predictor: dsig = lam tr(de) I + 2 mu de
    # rows 0:6 sigma_prev, rows 7:13 delta strain
    tr = packed_ref[7:8, :] + packed_ref[10:11, :] + packed_ref[12:13, :]
    two_mu = 2.0 * mu
    diag = lam * tr
    s_tr0 = packed_ref[0:1, :] + diag + two_mu * packed_ref[7:8, :]
    s_tr3 = packed_ref[3:4, :] + diag + two_mu * packed_ref[10:11, :]
    s_tr5 = packed_ref[5:6, :] + diag + two_mu * packed_ref[12:13, :]
    s_tr1 = packed_ref[1:2, :] + two_mu * packed_ref[8:9, :]
    s_tr2 = packed_ref[2:3, :] + two_mu * packed_ref[9:10, :]
    s_tr4 = packed_ref[4:5, :] + two_mu * packed_ref[11:12, :]

    p_tr = (s_tr0 + s_tr3 + s_tr5) / 3.0
    d0 = s_tr0 - p_tr
    d3 = s_tr3 - p_tr
    d5 = s_tr5 - p_tr
    phi_sq = d0 * d0 + d3 * d3 + d5 * d5 + \
        2.0 * (s_tr1 * s_tr1 + s_tr2 * s_tr2 + s_tr4 * s_tr4)
    phi_tr = jnp.sqrt(1.5 * phi_sq)

    f_trial = phi_tr - Y - S * (1.0 - jnp.exp(-D * alpha_prev))
    plastic = f_trial > 0.0

    # statically unrolled: a lax.fori_loop here is a REAL loop in the
    # Mosaic kernel and costs ~3x end-to-end (measured r2: 1.2 vs
    # 3.3 G updates/s on the SoA form); eight unrolled iterations of
    # ~10 VPU ops fuse into the surrounding elementwise pass instead
    dg = jnp.zeros_like(alpha_prev)
    for _ in range(_NEWTON_ITERS):
        e = jnp.exp(-D * (alpha_prev + dg))
        g = phi_tr - 3.0 * mu * dg - Y - S * (1.0 - e)
        dgd = -3.0 * mu - S * D * e
        dg = jnp.where(plastic, jnp.maximum(dg - g / dgd, 0.0), 0.0)

    safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
    scale = jnp.where(plastic, 3.0 * mu * dg / safe_phi, 0.0)

    out_ref[0:1, :] = s_tr0 - scale * d0
    out_ref[1:2, :] = s_tr1 - scale * s_tr1
    out_ref[2:3, :] = s_tr2 - scale * s_tr2
    out_ref[3:4, :] = s_tr3 - scale * d3
    out_ref[4:5, :] = s_tr4 - scale * s_tr4
    out_ref[5:6, :] = s_tr5 - scale * d5
    out_ref[6:7, :] = alpha_prev + dg
    out_ref[7:8, :] = jnp.zeros_like(alpha_prev)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(packed: JaxArray, scalars: JaxArray,
          interpret: bool = False) -> JaxArray:
    B = packed.shape[1]
    grid = (B // _TILE,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((16, _TILE), lambda i, s: (0, i))],
            out_specs=pl.BlockSpec((8, _TILE), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), packed.dtype),
        interpret=interpret,
    )(scalars, packed)


# lanes per grid step for the SoA kernel: 8 rows x 8192 f32 = 256 KiB
# per buffer; measured at 4M points this is the best tile (2.46 G
# updates/s scanned, 3.26 G unrolled vs 1.9 G at 2048)
_TILE_SOA = 8192
TILE_SOA = _TILE_SOA  # public: callers pre-pad streaming batches once


def _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D,
                 newton_iters: int = _NEWTON_ITERS):
    """Value-level radial return on seven state rows + six strain rows
    (all (1, tile)); returns the seven updated rows. Shared by the
    single-step and fused-history SoA kernels. ``newton_iters`` is
    exposed for the roofline experiments in benchmarks/local_kernels."""
    x0, x1, x2, x3, x4, x5, alpha_prev = xi_rows
    e0, e1, e2, e3, e4, e5 = de_rows

    tr = e0 + e3 + e5
    two_mu = 2.0 * mu
    diag = lam * tr
    s_tr0 = x0 + diag + two_mu * e0
    s_tr1 = x1 + two_mu * e1
    s_tr2 = x2 + two_mu * e2
    s_tr3 = x3 + diag + two_mu * e3
    s_tr4 = x4 + two_mu * e4
    s_tr5 = x5 + diag + two_mu * e5

    p_tr = (s_tr0 + s_tr3 + s_tr5) / 3.0
    d0 = s_tr0 - p_tr
    d3 = s_tr3 - p_tr
    d5 = s_tr5 - p_tr
    phi_sq = d0 * d0 + d3 * d3 + d5 * d5 + \
        2.0 * (s_tr1 * s_tr1 + s_tr2 * s_tr2 + s_tr4 * s_tr4)
    phi_tr = jnp.sqrt(1.5 * phi_sq)

    f_trial = phi_tr - Y - S * (1.0 - jnp.exp(-D * alpha_prev))
    plastic = f_trial > 0.0

    # statically unrolled: a lax.fori_loop here is a REAL loop in the
    # Mosaic kernel and costs ~3x end-to-end (measured r2: 1.2 vs
    # 3.3 G updates/s on the SoA form); the unrolled iterations of
    # ~10 VPU ops fuse into the surrounding elementwise pass instead
    dg = jnp.zeros_like(alpha_prev)
    for _ in range(newton_iters):
        e = jnp.exp(-D * (alpha_prev + dg))
        g = phi_tr - 3.0 * mu * dg - Y - S * (1.0 - e)
        dgd = -3.0 * mu - S * D * e
        dg = jnp.where(plastic, jnp.maximum(dg - g / dgd, 0.0), 0.0)

    safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
    scale = jnp.where(plastic, 3.0 * mu * dg / safe_phi, 0.0)

    return (s_tr0 - scale * d0, s_tr1 * (1.0 - scale),
            s_tr2 * (1.0 - scale), s_tr3 - scale * d3,
            s_tr4 * (1.0 - scale), s_tr5 - scale * d5,
            alpha_prev + dg)


def _kernel_soa(scalars_ref, xi_ref, de_ref, out_ref):
    """Component-major radial return: state and strain increment arrive
    as separate (8, tile) row blocks (contract in
    ops/j2_radial_return.py SoA section); no AoS<->SoA transposes
    anywhere in the pass."""
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    # slice ROWS off the refs directly: loading a (6, tile) block and
    # value-slicing it costs sublane relayouts per extract (~2.5x
    # end-to-end, measured r2); per-row ref loads are free
    xi_rows = tuple(xi_ref[r:r + 1, :] for r in range(7))
    de_rows = tuple(de_ref[r:r + 1, :] for r in range(6))
    out = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[r:r + 1, :] = out[r]
    out_ref[7:8, :] = jnp.zeros_like(out[6])


def _kernel_soa_hist(scalars_ref, xi_ref, de_hist_ref, out_ref, *,
                     t_steps: int):
    """Fused multi-step history: the state rows stay in VMEM/registers
    across ``t_steps`` radial returns, so HBM sees the state once per
    CHUNK instead of once per step — 96 B/update drops to
    ``32 + 64/t_steps`` B/update (40 B at t_steps=8)."""
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    xi_rows = tuple(xi_ref[r:r + 1, :] for r in range(7))
    for t in range(t_steps):  # static unroll (t_steps is a chunk, <= 8)
        de_rows = tuple(de_hist_ref[t, r:r + 1, :] for r in range(6))
        xi_rows = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[r:r + 1, :] = xi_rows[r]
    out_ref[7:8, :] = jnp.zeros_like(xi_rows[6])


@functools.partial(jax.jit, static_argnames=("t_steps", "interpret"))
def _call_soa_hist(xi_soa: JaxArray, de_hist: JaxArray, scalars: JaxArray,
                   t_steps: int, interpret: bool = False) -> JaxArray:
    B = xi_soa.shape[1]
    grid = (B // _TILE_SOA,)
    return pl.pallas_call(
        functools.partial(_kernel_soa_hist, t_steps=t_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, _TILE_SOA), lambda i, s: (0, i)),
                pl.BlockSpec((t_steps, 8, _TILE_SOA),
                             lambda i, s: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((8, _TILE_SOA), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), xi_soa.dtype),
        interpret=interpret,
    )(scalars, xi_soa, de_hist)


# steps fused per kernel invocation in the history drive: VMEM per grid
# step is t_steps * 8 * _TILE_SOA * 4 B for the strain block (2 MiB at
# 8) plus pipeline buffers — comfortably inside VMEM, and 8 already
# drops the traffic to 40 B/update (the xi term is 1/t_steps)
HIST_CHUNK = 8

# ---------------------------------------------------------------------------
# WIDE (full-sublane) layout — measured results (r3)
#
# Hypothesis from the roofline experiment: every row op above is a
# (1, tile) value using 1 of the VPU's 8 sublanes, so viewing the
# component-major (8, N) state as (64, N/8) — component c on the EIGHT
# sublane rows [8c, 8c+8), every op a full (8, W) VPU op — should lift
# the issue-rate ceiling. Point j of component c lives at
# (8c + j // (N/8), j % (N/8)) on both sides: the same fixed
# point-permutation for state and strain, so the pointwise radial
# return is bit-identical (tests/ops/test_soa_radial_return.py).
#
# MEASURED (whole-history kernel, 4.19M pts, T=32, TPU v5e):
#   - wide kernel with inputs ALREADY wide: 12.62 G updates/s vs
#     narrow 10.44 — 1.21x, i.e. the narrow kernel was only mildly
#     issue-limited (Mosaic evidently packs multiple (1, tile) rows
#     per vreg better than the 8x-waste model assumed).
#   - converting at the call boundary: ~4x SLOWDOWN. (8, N)->(64, N/8)
#     is row-major-contiguous but TPU arrays are TILED, so XLA emits a
#     physical relayout copy (~150 GB/s) that swamps the kernel.
#
# Hence: the default drive stays narrow; `layout='wide'` on
# make_j2_history_drive accepts wide-laid-out histories for callers
# that can produce them at generation time (and gets the 1.21x).
# ---------------------------------------------------------------------------

_SUB = 8            # sublane rows per component in the wide layout
_TILE_WIDE = 1024   # lane columns per grid step: 64 x 1024 f32 = 256 KiB
                    # per buffer — same points/tile (8192) as _TILE_SOA


def _wide_rows(ref, n_comp: int):
    """Slice ``n_comp`` (8, W) component blocks off a (64, W) ref.
    Row offsets are multiples of 8, so every slice is sublane-aligned —
    no relayout."""
    return tuple(ref[_SUB * c:_SUB * (c + 1), :] for c in range(n_comp))


def _kernel_soa_hist_full_wide(scalars_ref, xi_ref, de_ref, out_ref, *,
                               t_steps: int):
    """Whole-history kernel in the wide layout; structure identical to
    :func:`_kernel_soa_hist_full` (chunk axis innermost, out ref doubles
    as the VMEM-resident state carrier), but each component is an
    (8, W) block so the VPU runs at full sublane occupancy."""
    c = pl.program_id(1)
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    @pl.when(c == 0)
    def _seed():
        out_ref[...] = xi_ref[...]

    xi_rows = _wide_rows(out_ref, 7)
    for t in range(t_steps):  # static unroll (one chunk)
        de_rows = tuple(de_ref[t, _SUB * r:_SUB * (r + 1), :]
                        for r in range(6))
        xi_rows = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[_SUB * r:_SUB * (r + 1), :] = xi_rows[r]


@functools.partial(jax.jit, static_argnames=("t_steps", "interpret"))
def _call_soa_hist_full_wide(xi_wide: JaxArray, de_hist_wide: JaxArray,
                             scalars: JaxArray, t_steps: int,
                             interpret: bool = False) -> JaxArray:
    T, _, W = de_hist_wide.shape
    n_chunks = T // t_steps
    grid = (W // _TILE_WIDE, n_chunks)
    return pl.pallas_call(
        functools.partial(_kernel_soa_hist_full_wide, t_steps=t_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((64, _TILE_WIDE), lambda i, c, s: (0, i)),
                pl.BlockSpec((t_steps, 64, _TILE_WIDE),
                             lambda i, c, s: (c, 0, i)),
            ],
            out_specs=pl.BlockSpec((64, _TILE_WIDE),
                                   lambda i, c, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((64, W), xi_wide.dtype),
        interpret=interpret,
    )(scalars, xi_wide, de_hist_wide)


def _kernel_soa_hist_wide(scalars_ref, xi_ref, de_hist_ref, out_ref, *,
                          t_steps: int):
    """Fused multi-step chunk in the wide layout (state resident across
    the chunk); wide twin of :func:`_kernel_soa_hist`."""
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    xi_rows = _wide_rows(xi_ref, 7)
    for t in range(t_steps):  # static unroll (one chunk, <= 8)
        de_rows = tuple(de_hist_ref[t, _SUB * r:_SUB * (r + 1), :]
                        for r in range(6))
        xi_rows = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[_SUB * r:_SUB * (r + 1), :] = xi_rows[r]
    out_ref[_SUB * 7:, :] = jnp.zeros_like(xi_rows[0])


@functools.partial(jax.jit, static_argnames=("t_steps", "interpret"))
def _call_soa_hist_wide(xi_wide: JaxArray, de_hist_wide: JaxArray,
                        scalars: JaxArray, t_steps: int,
                        interpret: bool = False) -> JaxArray:
    W = xi_wide.shape[1]
    grid = (W // _TILE_WIDE,)
    return pl.pallas_call(
        functools.partial(_kernel_soa_hist_wide, t_steps=t_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((64, _TILE_WIDE), lambda i, s: (0, i)),
                pl.BlockSpec((t_steps, 64, _TILE_WIDE),
                             lambda i, s: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((64, _TILE_WIDE), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((64, W), xi_wide.dtype),
        interpret=interpret,
    )(scalars, xi_wide, de_hist_wide)


def _kernel_soa_wide(scalars_ref, xi_ref, de_ref, out_ref):
    """Single-step radial return in the wide layout; wide twin of
    :func:`_kernel_soa` (the FE COUPLED fast-path kernel)."""
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    xi_rows = _wide_rows(xi_ref, 7)
    de_rows = _wide_rows(de_ref, 6)
    out = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[_SUB * r:_SUB * (r + 1), :] = out[r]
    out_ref[_SUB * 7:, :] = jnp.zeros_like(out[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_soa_wide(xi_wide: JaxArray, de_wide: JaxArray,
                   scalars: JaxArray, interpret: bool = False) -> JaxArray:
    W = xi_wide.shape[1]
    grid = (W // _TILE_WIDE,)
    return pl.pallas_call(
        _kernel_soa_wide,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((64, _TILE_WIDE), lambda i, s: (0, i)),
                      pl.BlockSpec((64, _TILE_WIDE), lambda i, s: (0, i))],
            out_specs=pl.BlockSpec((64, _TILE_WIDE), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((64, W), xi_wide.dtype),
        interpret=interpret,
    )(scalars, xi_wide, de_wide)


def _to_wide(a: JaxArray) -> JaxArray:
    """(…, 8, N) component-major -> (…, 64, N/8) wide: row-major
    contiguous, but on TPU a PHYSICAL tiled-layout relayout (~4x the
    kernel, measured) — for tests and one-time host-side conversion,
    never inside a hot loop."""
    *lead, r, n = a.shape
    return a.reshape(*lead, r * _SUB, n // _SUB)


def _from_wide(a: JaxArray) -> JaxArray:
    *lead, r, w = a.shape
    return a.reshape(*lead, r // _SUB, w * _SUB)


def soa_history_full_pallas_wide(xi_wide: JaxArray, de_hist_wide: JaxArray,
                                 scalars: JaxArray,
                                 interpret: bool = False) -> JaxArray:
    """Whole-history drive, WIDE layout: ``xi (64, W), de_hist
    (T, 64, W) -> xi' (64, W)`` with W = N/8 and component c on rows
    [8c, 8c+8). W must be _TILE_WIDE-aligned, T a HIST_CHUNK multiple.
    1.21x the narrow kernel when the data is generated wide (52% of
    HBM roofline measured); see the layout note above."""
    if xi_wide.shape[0] != _SUB * 8:
        raise ValueError(
            f"wide layout state must have 64 rows; got {xi_wide.shape[0]}")
    if xi_wide.shape[1] % _TILE_WIDE:
        raise ValueError(
            f"wide whole-history kernel requires W aligned to "
            f"{_TILE_WIDE}; got {xi_wide.shape[1]}")
    if de_hist_wide.shape[0] % HIST_CHUNK:
        raise ValueError(
            f"whole-history kernel requires T a multiple of "
            f"{HIST_CHUNK}; got {de_hist_wide.shape[0]}")
    return _call_soa_hist_full_wide(xi_wide, de_hist_wide, scalars,
                                    t_steps=HIST_CHUNK,
                                    interpret=interpret)


def soa_history_chunk_pallas_wide(xi_wide: JaxArray, de_chunk_wide: JaxArray,
                                  scalars: JaxArray,
                                  interpret: bool = False) -> JaxArray:
    """``t_steps`` fused radial returns in the wide layout; wide twin
    of :func:`soa_history_chunk_pallas`."""
    if xi_wide.shape[1] % _TILE_WIDE:
        raise ValueError(
            f"wide fused chunk requires W aligned to {_TILE_WIDE}; "
            f"got {xi_wide.shape[1]}")
    return _call_soa_hist_wide(xi_wide, de_chunk_wide, scalars,
                               t_steps=de_chunk_wide.shape[0],
                               interpret=interpret)


def _kernel_soa_hist_full(scalars_ref, xi_ref, de_ref, out_ref, *,
                          t_steps: int):
    """Whole-history kernel: grid = (tiles, chunks) with the CHUNK axis
    innermost, so the output block index (0, i) is constant across a
    tile's chunk steps and Mosaic keeps the state resident in VMEM for
    the ENTIRE history — the out ref doubles as the xi carrier. One
    pallas_call replaces the lax.scan over chunk blocks, whose
    per-iteration dynamic-slice copies add ~64 B/update of hidden HBM
    traffic (measured r3: public scan drive 4.6 G vs raw chunk kernel
    6.4 G updates/s). HBM per update falls to 24 + 64/T B."""
    c = pl.program_id(1)
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    @pl.when(c == 0)
    def _seed():
        out_ref[...] = xi_ref[...]

    xi_rows = tuple(out_ref[r:r + 1, :] for r in range(7))
    for t in range(t_steps):  # static unroll (one chunk)
        de_rows = tuple(de_ref[t, r:r + 1, :] for r in range(6))
        xi_rows = _radial_rows(xi_rows, de_rows, mu, lam, Y, S, D)
    for r in range(7):
        out_ref[r:r + 1, :] = xi_rows[r]


@functools.partial(jax.jit, static_argnames=("t_steps", "interpret"))
def _call_soa_hist_full(xi_soa: JaxArray, de_hist: JaxArray,
                        scalars: JaxArray, t_steps: int,
                        interpret: bool = False) -> JaxArray:
    T, _, B = de_hist.shape
    n_chunks = T // t_steps
    grid = (B // _TILE_SOA, n_chunks)
    return pl.pallas_call(
        functools.partial(_kernel_soa_hist_full, t_steps=t_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, _TILE_SOA), lambda i, c, s: (0, i)),
                pl.BlockSpec((t_steps, 8, _TILE_SOA),
                             lambda i, c, s: (c, 0, i)),
            ],
            out_specs=pl.BlockSpec((8, _TILE_SOA),
                                   lambda i, c, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), xi_soa.dtype),
        interpret=interpret,
    )(scalars, xi_soa, de_hist)


def soa_history_full_pallas(xi_soa: JaxArray, de_hist: JaxArray,
                            scalars: JaxArray,
                            interpret: bool = False) -> JaxArray:
    """Whole-history drive in ONE pallas_call:
    ``xi (8, N), de_hist (T, 8, N) -> xi' (8, N)``. N must be
    tile-aligned and T a multiple of HIST_CHUNK (the public drive pads
    N once and routes any T remainder through the chunk kernel).
    Stays in the NARROW layout: the wide (full-sublane) kernel is 1.21x
    faster per se, but converting (8, N) -> (64, N/8) at this boundary
    is a physical tiled-layout relayout on TPU (NOT a free row-major
    bitcast) costing ~4x the kernel itself (measured r3) — callers who
    can produce wide-layout data use the ``layout='wide'`` drive."""
    if xi_soa.shape[1] % _TILE_SOA:
        raise ValueError(
            f"whole-history kernel requires tile-aligned N "
            f"(multiple of {_TILE_SOA}); got {xi_soa.shape[1]}")
    if de_hist.shape[0] % HIST_CHUNK:
        raise ValueError(
            f"whole-history kernel requires T a multiple of "
            f"{HIST_CHUNK}; got {de_hist.shape[0]}")
    return _call_soa_hist_full(xi_soa, de_hist, scalars,
                               t_steps=HIST_CHUNK, interpret=interpret)


def soa_history_chunk_pallas(xi_soa: JaxArray, de_chunk: JaxArray,
                             scalars: JaxArray,
                             interpret: bool = False) -> JaxArray:
    """``t_steps`` fused radial returns: ``xi (8, N), de_chunk
    (t_steps, 8, N) -> xi' (8, N)``. N must be tile-aligned (the
    history drive pads once up front). Narrow layout; see
    :func:`soa_history_full_pallas` for why."""
    if xi_soa.shape[1] % _TILE_SOA:
        raise ValueError(
            f"fused history chunk requires tile-aligned N "
            f"(multiple of {_TILE_SOA}); got {xi_soa.shape[1]}")
    return _call_soa_hist(xi_soa, de_chunk, scalars,
                          t_steps=de_chunk.shape[0], interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_soa(xi_soa: JaxArray, de_soa: JaxArray, scalars: JaxArray,
              interpret: bool = False) -> JaxArray:
    B = xi_soa.shape[1]
    grid = (B // _TILE_SOA,)
    return pl.pallas_call(
        _kernel_soa,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((8, _TILE_SOA), lambda i, s: (0, i)),
                      pl.BlockSpec((8, _TILE_SOA), lambda i, s: (0, i))],
            out_specs=pl.BlockSpec((8, _TILE_SOA), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), xi_soa.dtype),
        interpret=interpret,
    )(scalars, xi_soa, de_soa)


def _material_scalars(params, dtype):
    ec = ElasticConstants.from_params(params["elastic"])
    plastic = params["plastic"]
    return jnp.stack([
        ec.mu, ec.lmbda,
        plastic["flow stress"]["initial yield"]["Y"],
        plastic["flow stress"]["hardening"]["voce"]["S"],
        plastic["flow stress"]["hardening"]["voce"]["D"],
    ]).astype(dtype)


def soa_step_scalars_pallas(xi_soa: JaxArray, de_soa: JaxArray,
                            scalars: JaxArray,
                            interpret: bool = False) -> JaxArray:
    """Tile-padding wrapper over the SoA Pallas kernel with the material
    constants pre-stacked (``j2_voce_scalars``); semantics identical to
    ``j2_radial_return.soa_step_scalars``."""
    B = xi_soa.shape[1]
    pad = (-B) % _TILE_SOA
    if pad:
        xi_soa = jnp.pad(xi_soa, ((0, 0), (0, pad)))
        de_soa = jnp.pad(de_soa, ((0, 0), (0, pad)))
    out = _call_soa(xi_soa, de_soa, scalars, interpret=interpret)
    return out[:, :B] if pad else out


def make_pallas_j2_radial_return_soa(parameters,
                                     interpret: bool | None = None):
    """Component-major Pallas radial return:
    ``step(xi_soa: (8, N), de_soa: (8, N), params) -> (8, N)`` — the
    contract documented in ops/j2_radial_return.py's SoA section, with
    semantics identical to :func:`make_j2_radial_return_soa`. The
    throughput kernel for streamed histories: no transposes, no sigma
    materialization (rate-form stress IS the state). ``interpret=None``
    auto-enables interpreter mode off-TPU."""
    del parameters

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def step(xi_soa: JaxArray, de_soa: JaxArray, params) -> JaxArray:
        scalars = _material_scalars(params, xi_soa.dtype)
        return soa_step_scalars_pallas(xi_soa, de_soa, scalars,
                                       interpret=interpret)

    return jax.jit(step)


def _kernel_total(scalars_ref, packed_ref, out_ref):
    """Total-form variant: rows 0:6 plastic strain, 6 alpha, 7:13 total
    strain in; rows 0:6 plastic strain, 6 alpha, 7:13 stress out."""
    mu = scalars_ref[0]
    lam = scalars_ref[1]
    Y = scalars_ref[2]
    S = scalars_ref[3]
    D = scalars_ref[4]

    # per-row ref loads (block loads + value slicing cost sublane
    # relayouts per extract — see _kernel_soa)
    alpha_prev = packed_ref[6:7, :]

    # trial stress from the elastic strain eps - pe
    # (rows 0:6 plastic strain pe, rows 7:13 total strain eps)
    e0 = packed_ref[7:8, :] - packed_ref[0:1, :]
    e1 = packed_ref[8:9, :] - packed_ref[1:2, :]
    e2 = packed_ref[9:10, :] - packed_ref[2:3, :]
    e3 = packed_ref[10:11, :] - packed_ref[3:4, :]
    e4 = packed_ref[11:12, :] - packed_ref[4:5, :]
    e5 = packed_ref[12:13, :] - packed_ref[5:6, :]
    tr = e0 + e3 + e5
    two_mu = 2.0 * mu
    diag = lam * tr
    s_tr0 = diag + two_mu * e0
    s_tr3 = diag + two_mu * e3
    s_tr5 = diag + two_mu * e5
    s_tr1 = two_mu * e1
    s_tr2 = two_mu * e2
    s_tr4 = two_mu * e4

    p_tr = (s_tr0 + s_tr3 + s_tr5) / 3.0
    d0 = s_tr0 - p_tr
    d3 = s_tr3 - p_tr
    d5 = s_tr5 - p_tr
    phi_sq = d0 * d0 + d3 * d3 + d5 * d5 + \
        2.0 * (s_tr1 * s_tr1 + s_tr2 * s_tr2 + s_tr4 * s_tr4)
    phi_tr = jnp.sqrt(1.5 * phi_sq)

    f_trial = phi_tr - Y - S * (1.0 - jnp.exp(-D * alpha_prev))
    plastic = f_trial > 0.0

    # statically unrolled: a lax.fori_loop here is a REAL loop in the
    # Mosaic kernel and costs ~3x end-to-end (measured r2: 1.2 vs
    # 3.3 G updates/s on the SoA form); eight unrolled iterations of
    # ~10 VPU ops fuse into the surrounding elementwise pass instead
    dg = jnp.zeros_like(alpha_prev)
    for _ in range(_NEWTON_ITERS):
        e = jnp.exp(-D * (alpha_prev + dg))
        g = phi_tr - 3.0 * mu * dg - Y - S * (1.0 - e)
        dgd = -3.0 * mu - S * D * e
        dg = jnp.where(plastic, jnp.maximum(dg - g / dgd, 0.0), 0.0)

    safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
    coef = jnp.where(plastic, 1.5 * dg / safe_phi, 0.0)

    out_ref[0:1, :] = packed_ref[0:1, :] + coef * d0
    out_ref[1:2, :] = packed_ref[1:2, :] + coef * s_tr1
    out_ref[2:3, :] = packed_ref[2:3, :] + coef * s_tr2
    out_ref[3:4, :] = packed_ref[3:4, :] + coef * d3
    out_ref[4:5, :] = packed_ref[4:5, :] + coef * s_tr4
    out_ref[5:6, :] = packed_ref[5:6, :] + coef * d5
    out_ref[6:7, :] = alpha_prev + dg
    out_ref[7:8, :] = s_tr0 - two_mu * coef * d0
    out_ref[8:9, :] = s_tr1 - two_mu * coef * s_tr1
    out_ref[9:10, :] = s_tr2 - two_mu * coef * s_tr2
    out_ref[10:11, :] = s_tr3 - two_mu * coef * d3
    out_ref[11:12, :] = s_tr4 - two_mu * coef * s_tr4
    out_ref[12:13, :] = s_tr5 - two_mu * coef * d5
    out_ref[13:16, :] = jnp.zeros_like(packed_ref[13:16, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_total(packed: JaxArray, scalars: JaxArray,
                interpret: bool = False) -> JaxArray:
    B = packed.shape[1]
    grid = (B // _TILE,)
    return pl.pallas_call(
        _kernel_total,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((16, _TILE), lambda i, s: (0, i))],
            out_specs=pl.BlockSpec((16, _TILE), lambda i, s: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((16, B), packed.dtype),
        interpret=interpret,
    )(scalars, packed)


def make_pallas_j2_radial_return_total(parameters,
                                       interpret: bool | None = None):
    """Pallas TPU kernel for the TOTAL-form J2+Voce radial return
    (xi = [plastic_strain6, alpha]); contract matches
    :func:`cmad_tpu.ops.j2_radial_return.make_j2_radial_return_total`."""
    del parameters

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def step(xi_prev: JaxArray, grad_u: JaxArray, grad_u_prev: JaxArray,
             params) -> tuple[JaxArray, JaxArray]:
        del grad_u_prev  # total form: parametrized by current strain
        ec = ElasticConstants.from_params(params["elastic"])
        plastic = params["plastic"]
        dtype = grad_u.dtype
        scalars = jnp.stack([
            ec.mu, ec.lmbda,
            plastic["flow stress"]["initial yield"]["Y"],
            plastic["flow stress"]["hardening"]["voce"]["S"],
            plastic["flow stress"]["hardening"]["voce"]["D"],
        ]).astype(dtype)

        B = xi_prev.shape[0]
        e = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
        eps6 = jnp.stack([e[..., 0, 0], e[..., 0, 1], e[..., 0, 2],
                          e[..., 1, 1], e[..., 1, 2], e[..., 2, 2]],
                         axis=-1)
        packed = jnp.concatenate([
            xi_prev[:, :7], eps6,
            jnp.zeros((B, 3), dtype=dtype)], axis=1).T  # (16, B)

        pad = (-B) % _TILE
        if pad:
            packed = jnp.pad(packed, ((0, 0), (0, pad)))

        out = _call_total(packed, scalars, interpret=interpret)[:, :B]

        xi = out[:7, :].T
        sv = out[7:13, :].T
        sigma = jnp.stack([
            jnp.stack([sv[:, 0], sv[:, 1], sv[:, 2]], axis=-1),
            jnp.stack([sv[:, 1], sv[:, 3], sv[:, 4]], axis=-1),
            jnp.stack([sv[:, 2], sv[:, 4], sv[:, 5]], axis=-1),
        ], axis=-2)
        return xi, sigma

    return jax.jit(step)


def make_pallas_j2_radial_return(parameters, interpret: bool | None = None):
    """Build ``step(xi_prev, grad_u, grad_u_prev, params) -> (xi, sigma)``
    with the same contract as :func:`make_j2_radial_return`, backed by a
    Pallas TPU kernel. ``interpret=None`` auto-enables interpreter mode
    off-TPU (CPU verification path).
    """
    del parameters  # layout fixed by the J2+Voce model

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def step(xi_prev: JaxArray, grad_u: JaxArray, grad_u_prev: JaxArray,
             params) -> tuple[JaxArray, JaxArray]:
        ec = ElasticConstants.from_params(params["elastic"])
        plastic = params["plastic"]
        dtype = grad_u.dtype
        scalars = jnp.stack([
            ec.mu, ec.lmbda,
            plastic["flow stress"]["initial yield"]["Y"],
            plastic["flow stress"]["hardening"]["voce"]["S"],
            plastic["flow stress"]["hardening"]["voce"]["D"],
        ]).astype(dtype)

        B = xi_prev.shape[0]
        d = 0.5 * ((grad_u + jnp.swapaxes(grad_u, -1, -2))
                   - (grad_u_prev + jnp.swapaxes(grad_u_prev, -1, -2)))
        de6 = jnp.stack([d[..., 0, 0], d[..., 0, 1], d[..., 0, 2],
                         d[..., 1, 1], d[..., 1, 2], d[..., 2, 2]], axis=-1)

        packed = jnp.concatenate([
            xi_prev[:, :7], de6,
            jnp.zeros((B, 3), dtype=dtype)], axis=1).T  # (16, B)

        pad = (-B) % _TILE
        if pad:
            packed = jnp.pad(packed, ((0, 0), (0, pad)))

        out = _call(packed, scalars, interpret=interpret)[:, :B]

        xi = out[:7, :].T
        sv = xi[:, :6]
        sigma = jnp.stack([
            jnp.stack([sv[:, 0], sv[:, 1], sv[:, 2]], axis=-1),
            jnp.stack([sv[:, 1], sv[:, 3], sv[:, 4]], axis=-1),
            jnp.stack([sv[:, 2], sv[:, 4], sv[:, 5]], axis=-1),
        ], axis=-2)
        return xi, sigma

    return jax.jit(step)
