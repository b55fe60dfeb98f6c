"""Closed-form symmetric 3x3 eigendecomposition, AD-safe and batched.

Parity: reference ``cmad/util/jax_eigen_decomposition.py:86-171`` (which
implements Harari & Albocher 2023 / Scherzinger & Dohrmann 2008). cmad_tpu
uses the classical deviator-based trigonometric (Cardano) solution with
double-``where`` NaN guards so it is differentiable to arbitrary order away
from exact eigenvalue degeneracy, and falls back smoothly onto the
spherical solution at degeneracy. Everything accepts leading batch dims —
the Barlat yield evaluates two of these per Gauss point, so the batched
closed form avoids a million tiny ``eigh`` calls on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray

_TINY = 1e-30


def compute_deviator_eigenvalues(A: JaxArray) -> JaxArray:
    """Eigenvalues of dev(A) for symmetric ``A (..., 3, 3)``; returns
    ``(..., 3)`` in descending order."""
    q = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B = A - q * jnp.eye(3, dtype=A.dtype)

    # p^2 = tr(B^2)/6; theta from the normalized determinant.
    # double-where around the sqrt: at an exactly-spherical A (J2 = 0)
    # sqrt' is infinite, and even a zero cotangent from the outer
    # selects turns that into 0 * inf = NaN in reverse mode
    J2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    nonzero = J2 > _TINY
    p_raw = jnp.sqrt(jnp.where(nonzero, J2, 1.0))
    p = jnp.where(nonzero, p_raw, 0.0)
    safe_p = jnp.where(nonzero, p_raw, 1.0)
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * safe_p**3)
    # clamp away from +-1 so acos grads stay finite; the induced error is
    # O(eps) in the eigenvalues near triple-degeneracy where they coincide.
    # The margin must be DTYPE-SCALED: a fixed 1e-12 is below f32 eps, so
    # 1.0 - 1e-12 rounds to exactly 1.0 in f32 and acos' grad is inf at a
    # degenerate pair (NaN yield normals at e.g. uniaxial stress states)
    margin = jnp.maximum(jnp.asarray(1e-12, A.dtype),
                         8.0 * jnp.finfo(A.dtype).eps)
    r = jnp.clip(r, -1.0 + margin, 1.0 - margin)
    theta = jnp.arccos(r) / 3.0

    two_pi_3 = 2.0 * jnp.pi / 3.0
    e1 = 2.0 * safe_p * jnp.cos(theta)
    e2 = 2.0 * safe_p * jnp.cos(theta - two_pi_3)
    e3 = 2.0 * safe_p * jnp.cos(theta + two_pi_3)
    eigs = jnp.stack([e1, e2, e3], axis=-1)
    return jnp.where(p[..., None] > _TINY, eigs, jnp.zeros_like(eigs))


def compute_eigenvalues(A: JaxArray) -> JaxArray:
    """Eigenvalues of symmetric ``A (..., 3, 3)`` -> ``(..., 3)``
    (descending)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    return compute_deviator_eigenvalues(A) + q[..., None]


def jax_compute_eigenvalues(A: JaxArray) -> JaxArray:
    """Reference-named alias (jax_eigen_decomposition.py:12); returns the
    three eigenvalues. Uses the batched closed form rather than eigh."""
    return compute_eigenvalues(A)


def compute_eigen_decomposition(A: JaxArray) -> tuple[JaxArray, JaxArray]:
    """Eigen-pairs of symmetric ``A (..., 3, 3)``.

    Eigenvectors via the Cayley-Hamilton spectral projectors
    ``P_i = prod_{j != i} (A - l_j I) / (l_i - l_j)``; the dominant column
    of each projector is the (unit) eigenvector. Smoothly degrades at
    (near-)degenerate eigenvalues by falling back to coordinate axes.
    Returns ``(eigenvalues (..., 3), eigenvectors (..., 3, 3))`` with
    eigenvectors in columns.
    """
    eigs = compute_eigenvalues(A)
    I = jnp.eye(3, dtype=A.dtype)

    def projector_column(i, j, k):
        li = eigs[..., i, None, None]
        lj = eigs[..., j, None, None]
        lk = eigs[..., k, None, None]
        denom = (li - lj) * (li - lk)
        safe = jnp.where(jnp.abs(denom) > _TINY, denom, 1.0)
        P = ((A - lj * I) @ (A - lk * I)) / safe
        # pick the largest-norm column of the projector
        norms = jnp.linalg.norm(P, axis=-2)
        idx = jnp.argmax(norms, axis=-1)
        col = jnp.take_along_axis(
            P, idx[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
        norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
        unit = col / jnp.where(norm > _TINY, norm, 1.0)
        # degenerate pair: any unit vector in the eigenspace works; use e_i
        fallback = jnp.zeros_like(unit).at[..., i].set(1.0)
        degenerate = jnp.abs(denom[..., 0, 0]) <= _TINY
        bad = degenerate[..., None] | (norm <= _TINY)
        return jnp.where(bad, fallback, unit)

    v0 = projector_column(0, 1, 2)
    v1 = projector_column(1, 2, 0)
    # enforce a right-handed orthonormal frame
    v2 = jnp.cross(v0, v1)
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    v2 = v2 / jnp.where(n2 > _TINY, n2, 1.0)
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return eigs, V


def sorted_eigen_decomposition(A: JaxArray) -> tuple[JaxArray, JaxArray]:
    """Eigen-pairs sorted ascending (reference parity)."""
    eigs, V = compute_eigen_decomposition(A)
    order = jnp.argsort(eigs, axis=-1)
    eigs_sorted = jnp.take_along_axis(eigs, order, axis=-1)
    V_sorted = jnp.take_along_axis(
        V, order[..., None, :].repeat(3, axis=-2), axis=-1)
    return eigs_sorted, V_sorted
