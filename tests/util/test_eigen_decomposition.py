"""Closed-form symmetric 3x3 eigendecomposition vs numpy eigh, batched +
AD sanity."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.util.jax_eigen_decomposition import (
    compute_eigen_decomposition,
    compute_eigenvalues,
    sorted_eigen_decomposition,
)
from cmad_tpu.util.numpy_eigen_decomposition import (
    compute_eigenvalues as np_compute_eigenvalues,
)


def _random_sym(rng, n=None):
    shape = (3, 3) if n is None else (n, 3, 3)
    A = rng.normal(size=shape)
    return 0.5 * (A + np.swapaxes(A, -1, -2))


def test_eigenvalues_match_eigh_batched():
    rng = np.random.RandomState(3)
    A = _random_sym(rng, 64)
    ours = np.sort(np.asarray(compute_eigenvalues(jnp.asarray(A))), axis=-1)
    ref = np.sort(np.linalg.eigvalsh(A), axis=-1)
    assert np.allclose(ours, ref, atol=1e-10)


def test_numpy_flavor_matches():
    rng = np.random.RandomState(4)
    A = _random_sym(rng)
    assert np.allclose(np.sort(np_compute_eigenvalues(A)),
                       np.sort(np.linalg.eigvalsh(A)), atol=1e-10)


def test_decomposition_reconstructs():
    rng = np.random.RandomState(5)
    A = _random_sym(rng, 16)
    eigs, V = compute_eigen_decomposition(jnp.asarray(A))
    eigs, V = np.asarray(eigs), np.asarray(V)
    recon = np.einsum("bij,bj,bkj->bik", V, eigs, V)
    assert np.allclose(recon, A, atol=1e-8)
    # orthonormal frames
    VtV = np.einsum("bji,bjk->bik", V, V)
    assert np.allclose(VtV, np.eye(3)[None], atol=1e-10)


def test_sorted_decomposition_ascending():
    rng = np.random.RandomState(6)
    A = _random_sym(rng)
    eigs, V = sorted_eigen_decomposition(jnp.asarray(A))
    eigs = np.asarray(eigs)
    assert np.all(np.diff(eigs) >= 0)
    assert np.allclose(np.asarray(V) @ np.diag(eigs) @ np.asarray(V).T, A,
                       atol=1e-8)


def test_degenerate_spherical():
    A = 2.5 * jnp.eye(3)
    eigs = np.asarray(compute_eigenvalues(A))
    assert np.allclose(eigs, 2.5)


def test_gradients_finite():
    rng = np.random.RandomState(7)
    A = jnp.asarray(_random_sym(rng))

    def max_eig(A):
        return compute_eigenvalues(A)[0]

    g = np.asarray(jax.grad(max_eig)(A))
    assert np.all(np.isfinite(g))
    # gradient of an eigenvalue w.r.t. A is v v^T for unit eigenvector v
    w, V = np.linalg.eigh(np.asarray(A))
    v = V[:, -1]
    sym_g = 0.5 * (g + g.T)
    assert np.allclose(sym_g, np.outer(v, v), atol=1e-6)
