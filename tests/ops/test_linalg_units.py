"""Unit grid for the TPU-friendly dense linear algebra
(ops/linalg.py): pivoting correctness, batching, AD, closed-form
3x3 det/inv."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.ops.linalg import det3, inv3, small_solve, solve_dense


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8])
def test_small_solve_matches_numpy(n):
    rng = np.random.RandomState(n)
    A = rng.normal(size=(n, n)) + n * np.eye(n)
    b = rng.normal(size=n)
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-10)


def test_small_solve_needs_pivoting():
    # leading zero pivot: elimination without row selection would 0/0
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [3.0, 2.0], rtol=1e-12)


def test_small_solve_ill_scaled_rows():
    # partial pivoting keeps the solve stable when row magnitudes span
    # many orders
    A = np.array([[1e-12, 1.0, 0.0],
                  [1.0, 1.0, 1.0],
                  [0.0, 1e6, 1.0]])
    b = np.array([1.0, 2.0, 3.0])
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, rtol=1e-9, atol=1e-9)


def test_small_solve_vmaps():
    rng = np.random.RandomState(0)
    A = rng.normal(size=(32, 4, 4)) + 4 * np.eye(4)
    b = rng.normal(size=(32, 4))
    x = np.asarray(jax.vmap(small_solve)(jnp.asarray(A),
                                         jnp.asarray(b)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=1e-9)


def test_small_solve_grads_match_linalg():
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.normal(size=(3, 3)) + 3 * np.eye(3))
    b = jnp.asarray(rng.normal(size=3))

    def f_ours(A, b):
        return jnp.sum(small_solve(A, b) ** 2)

    def f_ref(A, b):
        return jnp.sum(jnp.linalg.solve(A, b) ** 2)

    gA, gb = jax.grad(f_ours, argnums=(0, 1))(A, b)
    rA, rb = jax.grad(f_ref, argnums=(0, 1))(A, b)
    np.testing.assert_allclose(np.asarray(gA), np.asarray(rA),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-9)


def test_solve_dense_dispatches_large_to_linalg():
    rng = np.random.RandomState(2)
    n = 40  # above SMALL_SOLVE_MAX_N
    A = rng.normal(size=(n, n)) + n * np.eye(n)
    b = rng.normal(size=n)
    x = np.asarray(solve_dense(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9)


def test_det3_inv3_match_numpy_batched():
    rng = np.random.RandomState(3)
    A = rng.normal(size=(64, 3, 3)) + 2 * np.eye(3)
    d = np.asarray(det3(jnp.asarray(A)))
    np.testing.assert_allclose(d, np.linalg.det(A), rtol=1e-10)
    Ainv = np.asarray(inv3(jnp.asarray(A)))
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), rtol=1e-9)


def test_inv3_grad_is_finite_and_correct():
    A = jnp.asarray(np.diag([2.0, 3.0, 4.0]))

    def f(A):
        return jnp.trace(inv3(A))

    g = np.asarray(jax.grad(f)(A))
    # d tr(A^-1) / dA = -(A^-2)^T
    expected = -np.linalg.matrix_power(np.diag([2.0, 3.0, 4.0]), -2).T
    np.testing.assert_allclose(g, expected, rtol=1e-10)
