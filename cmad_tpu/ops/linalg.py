"""TPU-friendly dense linear algebra for small per-point systems.

``jnp.linalg.solve`` on TPU lowers small batched systems through XLA's
LuDecomposition custom call, which is catastrophically slow for the
per-integration-point 7x7 Newton systems (measured ~400x slower than the
unrolled form on v5e). :func:`small_solve` is a statically-unrolled
Gaussian elimination with partial pivoting: every operation is an
elementwise/gather op over the (vmapped) point batch, so the whole solve
fuses into the surrounding kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray

# beyond this size the unrolled program stops paying for itself
SMALL_SOLVE_MAX_N = 32


def small_solve(A: JaxArray, b: JaxArray) -> JaxArray:
    """Solve ``A x = b`` for one small dense system (n x n, n static).

    Statically-unrolled Gauss-Jordan with one-hot partial pivoting: the
    pivot row is *selected by contraction* (``onehot @ Ab``) instead of
    swapped, so there are no dynamic scatters — every step is a matvec +
    rank-1 update that vectorizes cleanly across a vmapped point batch
    on the TPU vector units (dynamic row swaps measured ~100x slower).
    """
    n = A.shape[-1]
    dtype = A.dtype
    # keep the matrix and rhs paths SEPARATE (no augmented concat): the
    # matrix path is then a function of A alone, so when this runs inside
    # a custom_jvp tangent rule (b tangent-linear, A primal) partial
    # evaluation sees pivots/factors as primal and the whole solve stays
    # linear-in-b — required for reverse-mode transposition.
    M = A
    r = b.astype(dtype)

    available = jnp.ones(n, dtype=dtype)
    onehots = []
    for k in range(n):
        # pivot row: largest |M[:, k]| among rows not yet used as pivots
        col = jnp.abs(M[:, k]) * available
        onehot = (col == jnp.max(col)).astype(dtype)
        # break ties deterministically toward the lowest row index
        onehot = onehot * (jnp.cumsum(onehot) == 1.0)
        pivot_row = onehot @ M                      # (n,)
        pivot_r = onehot @ r
        pivot_val = pivot_row[k]

        # eliminate column k from every row but the pivot (Gauss-Jordan)
        factors = (M[:, k] / pivot_val) * (1.0 - onehot)
        M = M - factors[:, None] * pivot_row[None, :]
        r = r - factors * pivot_r
        available = available * (1.0 - onehot)
        onehots.append(onehot)

    # after full elimination, unknown k's pivot row carries only its
    # pivot entry + rhs: x[k] = r[p_k] / M[p_k, k]
    P = jnp.stack(onehots)                          # (n, n)
    diag = jnp.einsum("kr,rk->k", P, M)
    return (P @ r) / diag


def solve_dense(A: JaxArray, b: JaxArray) -> JaxArray:
    """small_solve for small static n, jnp.linalg.solve otherwise."""
    if A.shape[-1] <= SMALL_SOLVE_MAX_N:
        return small_solve(A, b)
    return jnp.linalg.solve(A, b)


def det3(A: JaxArray) -> JaxArray:
    """Closed-form determinant of (..., 3, 3) matrices.

    Elementwise-only (no LuDecomposition custom call), so it compiles
    for every dtype on TPU — including the f64 path, where XLA's LU
    custom call only implements F32/C64.
    """
    return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2]
                            - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2]
                              - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1]
                              - A[..., 1, 1] * A[..., 2, 0]))


def inv3(A: JaxArray) -> JaxArray:
    """Closed-form (adjugate / det) inverse of (..., 3, 3) matrices.

    Same TPU rationale as :func:`det3`; also ~10x faster than the LU
    path for batched 3x3 geometry Jacobians.
    """
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    det = det3(A)
    return adj / det[..., None, None]
