"""AD grid over the sparse-solver arms: JVP/VJP/HVP w.r.t. the tangent
data AND the right-hand side, each arm checked against a dense
jnp.linalg.solve reference, plus jit round trips and the Lanczos
eigenvalue-estimator sign/size contract.

Mirrors the per-arm derivative coverage of reference
tests/fem/test_sparse_solve.py (jvp_K_and_b / vjp_K_and_b / hvp_K /
jit_round_trip rows for every solver family).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _lanczos_dominant_eig,
    coo_rows_from_indptr,
    jax_cg,
    jax_cg_chebyshev,
    jax_cg_two_level,
    jax_gmres,
    scipy_lu,
)

from .test_sparse_solve import _assembled_system


@pytest.fixture(scope="module")
def system():
    fe, arrays, K_data, b = _assembled_system(mixed=False)
    from cmad_tpu.fem.nonlinear_solver import get_two_level_pattern

    pattern = get_two_level_pattern(fe, 16)
    return fe, arrays, K_data, b, pattern


def _arms(pattern):
    return {
        "direct": lambda K, sp, b: scipy_lu(K, sp, b),
        "cg_jacobi": lambda K, sp, b: jax_cg(K, sp, b, rtol=1e-12),
        "cg_chebyshev": lambda K, sp, b: jax_cg_chebyshev(
            K, sp, b, rtol=1e-12, degree=3),
        "gmres": lambda K, sp, b: jax_gmres(K, sp, b, rtol=1e-12),
        "cg_two_level": lambda K, sp, b: jax_cg_two_level(
            K, sp, b, pattern, rtol=1e-12),
    }


def _dense_solve_ref(sp):
    """Differentiable dense reference x(K_data, b)."""

    def ref(K_data, b):
        unique, _ = _bcsr_operator(K_data, sp)
        rows = coo_rows_from_indptr(sp)
        K = jnp.zeros((sp.n, sp.n), dtype=unique.dtype)
        K = K.at[rows, sp.col_indices].add(unique)
        return jnp.linalg.solve(K, b)

    return ref


_ARM_NAMES = ["direct", "cg_jacobi", "cg_chebyshev", "gmres",
              "cg_two_level"]


@pytest.mark.parametrize("arm", _ARM_NAMES)
def test_jvp_wrt_K_and_b_matches_dense(system, arm):
    fe, arrays, K_data, b, pattern = system
    sp = arrays.embedded_sparsity
    solve = _arms(pattern)[arm]
    ref = _dense_solve_ref(sp)

    rng = np.random.RandomState(1)
    dK = jnp.asarray(rng.normal(size=K_data.shape))
    db = jnp.asarray(rng.normal(size=b.shape))

    x, dx = jax.jvp(lambda K, rhs: solve(K, sp, rhs), (K_data, b),
                    (dK, db))
    x_ref, dx_ref = jax.jvp(ref, (K_data, b), (dK, db))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("arm", _ARM_NAMES)
def test_vjp_wrt_K_and_b_matches_dense(system, arm):
    fe, arrays, K_data, b, pattern = system
    sp = arrays.embedded_sparsity
    solve = _arms(pattern)[arm]
    ref = _dense_solve_ref(sp)

    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.normal(size=b.shape))

    gK, gb = jax.grad(lambda K, rhs: solve(K, sp, rhs) @ w,
                      argnums=(0, 1))(K_data, b)
    gK_ref, gb_ref = jax.grad(lambda K, rhs: ref(K, rhs) @ w,
                              argnums=(0, 1))(K_data, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=1e-6, atol=1e-8)
    # K_data positions feeding the same deduped entry may split their
    # cotangent differently; compare after the dedup reduction
    uK, _ = _bcsr_operator(gK, sp)
    uK_ref, _ = _bcsr_operator(gK_ref, sp)
    np.testing.assert_allclose(np.asarray(uK), np.asarray(uK_ref),
                               rtol=1e-6, atol=1e-8)


def _symmetric_tangent(sp, K_shape, seed=3):
    """A K_data perturbation whose induced operator tangent is symmetric.

    The CG arms declare ``symmetric=True`` to custom_linear_solve, which
    asserts transpose(matvec) == matvec for the operator AND its
    tangents — valid for assembled FE tangents (any physical parameter
    perturbation preserves the weak form's symmetry) but not for a raw
    random K_data direction. Build the direction in unique-entry space
    with value(i, j) == value(j, i), then lift it onto one contributing
    buffer position per unique entry.
    """
    perm = np.asarray(sp.perm)
    seg = np.asarray(sp.segment_ids)
    cols = np.asarray(sp.col_indices)
    indptr = np.asarray(sp.indptr)
    rows = np.repeat(np.arange(sp.n), np.diff(indptr))

    rng = np.random.RandomState(seed)
    lo = np.minimum(rows, cols)
    hi = np.maximum(rows, cols)
    # deterministic symmetric value per unordered (i, j) pair
    pair_key = lo * sp.n + hi
    uniq_keys, inv = np.unique(pair_key, return_inverse=True)
    vals = rng.normal(size=uniq_keys.shape[0])[inv]

    first = np.zeros(seg.max() + 1, dtype=np.intp)
    first[seg[::-1]] = np.arange(len(seg))[::-1]  # first occurrence
    dK = np.zeros(K_shape)
    dK[perm[first]] = vals
    return jnp.asarray(dK)


@pytest.mark.parametrize("arm", _ARM_NAMES)
def test_hvp_wrt_K_matches_dense(system, arm):
    """Forward-over-reverse second derivative through the solve.

    Symmetric (CG) arms get a symmetry-preserving K perturbation — the
    only class of tangents their symmetric=True declaration covers (and
    the only class FE assembly produces for them).
    """
    fe, arrays, K_data, b, pattern = system
    sp = arrays.embedded_sparsity
    solve = _arms(pattern)[arm]
    ref = _dense_solve_ref(sp)

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.normal(size=b.shape))
    if arm in ("cg_jacobi", "cg_chebyshev", "cg_two_level"):
        dK = _symmetric_tangent(sp, K_data.shape)
    else:
        dK = jnp.asarray(rng.normal(size=K_data.shape))

    def hvp(f):
        g = jax.grad(lambda K: f(K) @ w)
        return jax.jvp(g, (K_data,), (dK,))[1]

    h = hvp(lambda K: solve(K, sp, b))
    h_ref = hvp(lambda K: ref(K, b))
    uh, _ = _bcsr_operator(h, sp)
    uh_ref, _ = _bcsr_operator(h_ref, sp)
    scale = float(jnp.max(jnp.abs(uh_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(uh) / scale,
                               np.asarray(uh_ref) / scale,
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("arm", ["cg_jacobi", "gmres", "cg_two_level"])
def test_jit_round_trip(system, arm):
    fe, arrays, K_data, b, pattern = system
    sp = arrays.embedded_sparsity
    solve = _arms(pattern)[arm]
    x_eager = solve(K_data, sp, b)
    x_jit = jax.jit(lambda K, rhs: solve(K, sp, rhs))(K_data, b)
    np.testing.assert_allclose(np.asarray(x_jit), np.asarray(x_eager),
                               rtol=1e-9, atol=1e-11)


def test_cg_batched_rhs_under_vmap_matches_sequential(system):
    fe, arrays, K_data, b, pattern = system
    sp = arrays.embedded_sparsity
    rng = np.random.RandomState(4)
    B = jnp.asarray(rng.normal(size=(3,) + b.shape))
    xs = jax.vmap(lambda rhs: jax_cg(K_data, sp, rhs, rtol=1e-12))(B)
    for k in range(3):
        x_seq = jax_cg(K_data, sp, B[k], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(xs[k]), np.asarray(x_seq),
                                   rtol=1e-7, atol=1e-9)


# --------------------------------------------------- Lanczos estimator


def _dense_matvec(A):
    Aj = jnp.asarray(A)
    return lambda x: Aj @ x


def test_lanczos_spd_positive_and_tight():
    rng = np.random.RandomState(5)
    Q, _ = np.linalg.qr(rng.normal(size=(40, 40)))
    eigs = np.linspace(0.1, 7.5, 40)
    A = Q @ np.diag(eigs) @ Q.T
    lam = float(_lanczos_dominant_eig(_dense_matvec(A), 40, jnp.float64))
    assert lam > 0
    assert np.isclose(lam, 7.5, rtol=1e-2)


def test_lanczos_negative_definite_keeps_sign():
    rng = np.random.RandomState(6)
    Q, _ = np.linalg.qr(rng.normal(size=(30, 30)))
    eigs = -np.linspace(0.5, 4.0, 30)
    A = Q @ np.diag(eigs) @ Q.T
    lam = float(_lanczos_dominant_eig(_dense_matvec(A), 30, jnp.float64))
    assert lam < 0
    assert np.isclose(lam, -4.0, rtol=1e-2)


def test_lanczos_more_steps_than_dofs():
    """n smaller than the Lanczos step budget must still work (steps are
    clamped to n) and be exact for a tiny matrix."""
    A = np.diag([1.0, 3.0, 2.0])
    lam = float(_lanczos_dominant_eig(_dense_matvec(A), 3, jnp.float64))
    assert np.isclose(lam, 3.0, rtol=1e-10)
