"""Component-major (SoA) radial-return contract: XLA and Pallas forms
agree with the AoS production kernel, helpers round-trip, and the
history drive matches step-by-step application.

Pallas runs in interpreter mode on the CPU test platform; the same
kernel compiles natively on TPU (benchmarked in bench.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.ops.j2_radial_return import (
    make_j2_radial_return,
    make_j2_radial_return_soa,
    pack_state_soa,
    strain_increment_soa,
    stress_from_state_soa,
    unpack_state_soa,
)
from cmad_tpu.ops.pallas_radial_return import (
    make_pallas_j2_radial_return_soa,
)
from cmad_tpu.ops.return_map import make_j2_history_drive

from tests.support.problems import J2AnalyticalProblem


def _mixed_batch(B, seed=0, scale=1.5e-3):
    rng = np.random.RandomState(seed)
    eps = rng.normal(0.0, scale, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    return jnp.asarray(eps)


def test_soa_helpers_round_trip():
    rng = np.random.RandomState(1)
    xi = jnp.asarray(rng.normal(size=(37, 7)))
    soa = pack_state_soa(xi)
    assert soa.shape == (8, 37)
    assert np.allclose(np.asarray(unpack_state_soa(soa)), np.asarray(xi))
    # stress reconstruction is the symmetric tensor of rows 0:6
    sig = stress_from_state_soa(soa)
    assert sig.shape == (37, 3, 3)
    assert np.allclose(np.asarray(sig), np.swapaxes(np.asarray(sig), 1, 2))
    assert np.allclose(np.asarray(sig[:, 0, 1]), np.asarray(xi[:, 1]))
    assert np.allclose(np.asarray(sig[:, 2, 2]), np.asarray(xi[:, 5]))


def test_xla_soa_matches_aos_kernel():
    problem = J2AnalyticalProblem()
    params = problem.J2_parameters

    B = 221
    grad_u = _mixed_batch(B, scale=7e-4)  # ~76% plastic: a real mix
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, 7))

    aos = make_j2_radial_return(params)
    soa = make_j2_radial_return_soa(params)

    xi_a, sig_a = aos(xi_prev, grad_u, grad_u_prev, params.values)
    de = strain_increment_soa(grad_u, grad_u_prev)
    xi_s = soa(pack_state_soa(xi_prev), de, params.values)

    assert np.allclose(np.asarray(unpack_state_soa(xi_s)),
                       np.asarray(xi_a), atol=1e-10)
    assert np.allclose(np.asarray(stress_from_state_soa(xi_s)),
                       np.asarray(sig_a), atol=1e-10)
    # mixed batch and a continued plastic path
    assert 0.3 < float((np.asarray(xi_a[:, 6]) > 0).mean()) < 1.0
    xi2_a, _ = aos(xi_a, grad_u * 1.7, grad_u, params.values)
    xi2_s = soa(xi_s, strain_increment_soa(grad_u * 1.7, grad_u),
                params.values)
    assert np.allclose(np.asarray(unpack_state_soa(xi2_s)),
                       np.asarray(xi2_a), atol=1e-10)


def test_pallas_soa_matches_xla_soa():
    problem = J2AnalyticalProblem()
    params = problem.J2_parameters

    B = 333  # deliberately not a tile multiple (exercises padding)
    grad_u = _mixed_batch(B, seed=2)
    de = strain_increment_soa(grad_u, jnp.zeros((B, 3, 3)))
    xi0 = pack_state_soa(jnp.zeros((B, 7)))

    ref = make_j2_radial_return_soa(params)
    pal = make_pallas_j2_radial_return_soa(params)

    xi_r = ref(xi0, de, params.values)
    xi_p = pal(xi0, de, params.values)
    assert np.allclose(np.asarray(xi_p), np.asarray(xi_r), atol=1e-10)

    xi2_r = ref(xi_r, 0.7 * de, params.values)
    xi2_p = pal(xi_p, 0.7 * de, params.values)
    assert np.allclose(np.asarray(xi2_p), np.asarray(xi2_r), atol=1e-10)


def test_history_drive_matches_stepwise():
    problem = J2AnalyticalProblem()
    params = problem.J2_parameters

    B, T = 64, 5
    rng = np.random.RandomState(3)
    de_hist = []
    for t in range(T):
        e = rng.normal(0.0, 8e-4, size=(B, 3, 3))
        e = 0.5 * (e + np.transpose(e, (0, 2, 1)))
        de_hist.append(np.concatenate([
            e[:, [0, 0, 0, 1, 1, 2], [0, 1, 2, 1, 2, 2]].T,
            np.zeros((2, B))]))
    de_hist = jnp.asarray(np.stack(de_hist))

    drive = make_j2_history_drive(params, record_alpha=True)
    xi0 = pack_state_soa(jnp.zeros((B, 7)))
    xi_fin, alpha_hist = drive(xi0, de_hist, params.values)
    assert alpha_hist.shape == (T, B)

    step = make_j2_radial_return_soa(params)
    xi = xi0
    for t in range(T):
        xi = step(xi, de_hist[t], params.values)
        assert np.allclose(np.asarray(alpha_hist[t]), np.asarray(xi[6]),
                           atol=1e-12)
    assert np.allclose(np.asarray(xi_fin), np.asarray(xi), atol=1e-12)
    # the history actually goes plastic
    assert float(np.asarray(xi_fin[6]).max()) > 0.0


def test_fused_history_drive_matches_per_step():
    """The fused multi-step Pallas history kernel (chunks of
    HIST_CHUNK + a remainder chunk, state resident in VMEM across each
    chunk) must reproduce the per-step scan exactly — including
    non-tile-aligned N (padded once up front) and T not a multiple of
    the chunk."""
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.ops.return_map import make_j2_history_drive

    import jax

    params = J2AnalyticalProblem().J2_parameters
    # single dtype on both paths: the fused kernel computes in the
    # STATE dtype, while the XLA step would promote f32 state by f64
    # param leaves
    pv32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                        params.values)
    rng = np.random.RandomState(5)
    N, T = 1000, 11  # non-aligned batch; 1 full chunk + 3 remainder
    xi0 = np.zeros((8, N), np.float32)
    xi0[:6] = rng.normal(0, 30, (6, N))
    de = np.zeros((T, 8, N), np.float32)
    de[:, :6] = rng.normal(0, 4e-4, (T, 6, N))
    xi0, de = jnp.asarray(xi0), jnp.asarray(de)

    ref = make_j2_history_drive(params, fused=False)(xi0, de, pv32)
    fused = make_j2_history_drive(params, fused=True)(xi0, de, pv32)
    assert float((np.asarray(ref)[6] > 0).any())
    # f32 tolerance: points with f_trial within roundoff of 0 can take
    # different elastic/plastic branches under the two op orderings;
    # their dg is O(f_trial) ~ 0, bounding the divergence (measured
    # max 1.4e-4 relative on 1.3% of points)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_whole_history_kernel_bit_exact_vs_chunked():
    """The single-pallas_call whole-history kernel (grid =
    tiles x chunks, state VMEM-resident across the chunk axis) is
    BIT-exact vs sequential chunk-kernel applications — same op order
    per point, multi-tile and multi-chunk."""
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.ops.pallas_radial_return import (
        HIST_CHUNK,
        TILE_SOA,
        soa_history_chunk_pallas,
        soa_history_full_pallas,
    )

    rng = np.random.RandomState(7)
    N, T = TILE_SOA * 2, 3 * HIST_CHUNK
    xi0 = np.zeros((8, N), np.float32)
    xi0[:6] = rng.normal(0, 30, (6, N))
    de = np.zeros((T, 8, N), np.float32)
    de[:, :6] = rng.normal(0, 2e-3, (T, 6, N))
    scalars = jnp.asarray([76923.1, 115384.6, 250.0, 200.0, 20.0],
                          jnp.float32)
    xi0, de = jnp.asarray(xi0), jnp.asarray(de)

    ref = xi0
    for c in range(T // HIST_CHUNK):
        ref = soa_history_chunk_pallas(
            ref, de[c * HIST_CHUNK:(c + 1) * HIST_CHUNK], scalars,
            interpret=True)
    full = soa_history_full_pallas(xi0, de, scalars, interpret=True)
    assert float((np.asarray(full)[6] > 0).any())  # actually plastic
    assert float(jnp.abs(ref - full).max()) == 0.0


def test_wide_layout_bit_exact_vs_narrow_kernels():
    """The WIDE (full-sublane) kernels — components as (8, W) blocks of
    a (64, N/8) view instead of (1, N) rows — are BIT-exact vs the
    narrow kernels: the (8, N) -> (64, N/8) reshape is a fixed
    point-permutation applied identically to state and strain, and the
    radial return is pointwise."""
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.ops.pallas_radial_return import (
        HIST_CHUNK,
        TILE_SOA,
        _call_soa,
        _call_soa_hist,
        _call_soa_hist_full,
        _call_soa_hist_full_wide,
        _call_soa_hist_wide,
        _call_soa_wide,
        _from_wide,
        _to_wide,
    )

    rng = np.random.RandomState(11)
    N, T = TILE_SOA * 2, 2 * HIST_CHUNK
    xi0 = np.zeros((8, N), np.float32)
    xi0[:6] = rng.normal(0, 30, (6, N))
    de = np.zeros((T, 8, N), np.float32)
    de[:, :6] = rng.normal(0, 2e-3, (T, 6, N))
    scalars = jnp.asarray([76923.1, 115384.6, 250.0, 200.0, 20.0],
                          jnp.float32)
    xi0, de = jnp.asarray(xi0), jnp.asarray(de)

    # round trip of the free reshape
    np.testing.assert_array_equal(np.asarray(_from_wide(_to_wide(xi0))),
                                  np.asarray(xi0))

    # single step
    narrow = _call_soa(xi0, de[0], scalars, interpret=True)
    wide = _from_wide(_call_soa_wide(_to_wide(xi0), _to_wide(de[0]),
                                     scalars, interpret=True))
    assert float(jnp.abs(narrow - wide).max()) == 0.0

    # fused chunk
    narrow = _call_soa_hist(xi0, de[:HIST_CHUNK], scalars,
                            t_steps=HIST_CHUNK, interpret=True)
    wide = _from_wide(_call_soa_hist_wide(
        _to_wide(xi0), _to_wide(de[:HIST_CHUNK]), scalars,
        t_steps=HIST_CHUNK, interpret=True))
    assert float(jnp.abs(narrow - wide).max()) == 0.0

    # whole history (multi-tile x multi-chunk grid)
    narrow = _call_soa_hist_full(xi0, de, scalars, t_steps=HIST_CHUNK,
                                 interpret=True)
    wide = _from_wide(_call_soa_hist_full_wide(
        _to_wide(xi0), _to_wide(de), scalars, t_steps=HIST_CHUNK,
        interpret=True))
    assert float((np.asarray(narrow)[6] > 0).any())  # actually plastic
    assert float(jnp.abs(narrow - wide).max()) == 0.0


def test_history_drive_wide_layout_matches_soa8():
    """`make_j2_history_drive(layout='wide')` is bit-exact vs the
    default soa8 drive under the wide view (component c on rows
    [8c, 8c+8) of a (64, N/8) array), including non-chunk-aligned T
    (full kernel + remainder chunk) and non-tile-aligned N (pad once
    inside the drive)."""
    import jax.numpy as jnp
    import numpy as np

    from cmad_tpu.ops.pallas_radial_return import (
        HIST_CHUNK,
        TILE_SOA,
        _from_wide,
        _to_wide,
    )
    params = J2AnalyticalProblem().J2_parameters
    rng = np.random.RandomState(3)
    # non-tile-aligned N (pad path) and T with a chunk remainder
    N, T = TILE_SOA + 24, HIST_CHUNK + 3
    xi0 = np.zeros((8, N), np.float32)
    xi0[:6] = rng.normal(0, 30, (6, N))
    de = np.zeros((T, 8, N), np.float32)
    de[:, :6] = rng.normal(0, 2e-3, (T, 6, N))
    xi0, de = jnp.asarray(xi0), jnp.asarray(de)

    drive = make_j2_history_drive(params, fused=True)
    drive_wide = make_j2_history_drive(params, fused=True, layout="wide")

    ref = drive(xi0, de, params.values)

    # wide inputs must be built from TILE-aligned narrow arrays (the
    # row blocks of the wide view partition N/8; a wide-side lane pad
    # would interleave zeros between real points, so the drive only
    # pads the LANE axis, which is safe for any already-wide data)
    pad = (-N) % TILE_SOA
    xi0_p = jnp.pad(xi0, ((0, 0), (0, pad)))
    de_p = jnp.pad(de, ((0, 0), (0, 0), (0, pad)))
    out_w = drive_wide(_to_wide(xi0_p), _to_wide(de_p), params.values)
    out = _from_wide(out_w)[:, :N]
    assert float((np.asarray(ref)[6] > 0).any())
    assert float(jnp.abs(out - ref).max()) == 0.0


def test_f32_step_residual_sits_on_the_evaluation_floor():
    """The f32 SoA step's model-residual is DOMINATED by the f32
    evaluation noise of C itself, not by solution error: evaluating C
    in f32 at the exact f64-converged state shows the same magnitude.
    (In f64 the same step satisfies C to ~6e-16 —
    test_radial_return_matches_generic_newton.) This is the property
    that makes bench.py's max_residual (~1e-2 at 4M points) a floor
    statement, not a convergence failure."""
    import jax

    from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )
    from cmad_tpu.ops.j2_radial_return import (
        j2_voce_scalars,
        strain_increment_soa,
    )
    from cmad_tpu.ops.j2_soa_ad import make_soa_step_ad

    problem = J2AnalyticalProblem()
    params = problem.J2_parameters
    model = SmallRateElasticPlastic(params)
    B = 4096
    rng = np.random.RandomState(0)
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))

    def fields(g):
        return GlobalFieldsAtPoint(
            fields={"u": jnp.zeros((B, 3), dtype=g.dtype)},
            grad_fields={"u": g})

    def resid_norms(xi, gu, pv):
        C = model.C_batched(xi, jnp.zeros_like(xi), pv, fields(gu),
                            fields(jnp.zeros_like(gu)))
        return np.asarray(jnp.linalg.norm(C, axis=-1))

    # f64 truth step
    gu64 = jnp.asarray(eps, jnp.float64)
    pv64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                        params.values)
    de = strain_increment_soa(gu64, jnp.zeros_like(gu64))
    sc = j2_voce_scalars(pv64, de.dtype)
    xi64 = unpack_state_soa(make_soa_step_ad()(
        pack_state_soa(jnp.zeros((B, 7), jnp.float64)), de, sc))
    assert resid_norms(xi64, gu64, pv64).max() < 1e-12  # solved in f64

    # f32 step from f32 inputs
    gu32 = gu64.astype(jnp.float32)
    pv32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                        params.values)
    de32 = strain_increment_soa(gu32, jnp.zeros_like(gu32))
    sc32 = j2_voce_scalars(pv32, de32.dtype)
    xi32 = unpack_state_soa(make_soa_step_ad()(
        pack_state_soa(jnp.zeros((B, 7), jnp.float32)), de32, sc32))
    n_step = resid_norms(xi32, gu32, pv32)

    # f32 EVALUATION floor: C evaluated in f32 at the f64 solution
    n_floor = resid_norms(xi64.astype(jnp.float32), gu32, pv32)

    assert n_floor.max() > 0.0
    # the step's residual must sit on the evaluation floor (within 2x),
    # i.e. carry no additional solution error visible above the noise
    assert n_step.max() < 2.0 * n_floor.max(), \
        (n_step.max(), n_floor.max())
    assert n_step.mean() < 2.0 * n_floor.mean() + 1e-6, \
        (n_step.mean(), n_floor.mean())
