"""Mixed-precision (f64-IR-around-f32-Krylov) solver arms.

These arms are the TPU answer to the reference's f64 SuperLU solves
(reference ``cmad/fem/sparse_solve.py:89``): the inner Krylov runs in
f32 (the native TPU dtype), the outer loop refines with the true f64
residual. The tests assert the defining property — final accuracy BELOW
the f32 attainable floor — plus AD through the custom_linear_solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.nonlinear_solver import get_two_level_pattern
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    jax_cg_mixed,
    jax_gmres_mixed,
)

from .test_sparse_solve import _assembled_system, _dense


@pytest.fixture(scope="module")
def system():
    return _assembled_system(mixed=False)


def _true_rel_residual(K_data, sparsity, x, b):
    _, matvec = _bcsr_operator(K_data, sparsity)
    return float(jnp.linalg.norm(b - matvec(x)) / jnp.linalg.norm(b))


@pytest.mark.parametrize("precon", ["jacobi", "two_level", "chebyshev"])
def test_cg_mixed_reaches_f64_accuracy(system, precon):
    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    assert K_data.dtype == jnp.float64  # x64 test configuration
    pattern = (get_two_level_pattern(fe) if precon == "two_level"
               else None)
    x = jax_cg_mixed(K_data, sp, b, rtol=1e-12, precon=precon,
                     pattern=pattern)
    # beyond the f32 floor (~1e-7): only possible if the f64 refinement
    # is actually doing its job around the f32 inner solve
    assert _true_rel_residual(K_data, sp, x, b) < 1e-10
    x_dense = np.linalg.solve(_dense(K_data, sp), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8)


def test_gmres_mixed_reaches_f64_accuracy(system):
    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    x = jax_gmres_mixed(K_data, sp, b, rtol=1e-12, restart=40)
    assert _true_rel_residual(K_data, sp, x, b) < 1e-10


def test_gmres_mixed_two_level(system):
    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    pattern = get_two_level_pattern(fe)
    x = jax_gmres_mixed(K_data, sp, b, pattern=pattern, rtol=1e-12,
                        restart=40)
    assert _true_rel_residual(K_data, sp, x, b) < 1e-10


def test_cg_mixed_f32_passthrough(system):
    """With f32 inputs the mixed arm must degrade to the plain f32
    solver (TPU pure-f32 decks keep working with 'solve dtype: mixed')."""
    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    x = jax_cg_mixed(K_data.astype(jnp.float32), sp,
                     b.astype(jnp.float32), rtol=1e-6)
    assert x.dtype == jnp.float32
    assert _true_rel_residual(K_data.astype(jnp.float32), sp, x,
                              b.astype(jnp.float32)) < 1e-4


@pytest.mark.parametrize("arm", ["cg", "gmres"])
def test_ad_through_mixed_solves(system, arm):
    """value_and_grad through the mixed solve vs finite differences —
    the custom_linear_solve rules must survive the dtype casts."""
    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity

    def f(K_data_, b_):
        if arm == "cg":
            x = jax_cg_mixed(K_data_, sp, b_, rtol=1e-12)
        else:
            x = jax_gmres_mixed(K_data_, sp, b_, rtol=1e-12, restart=40)
        return jnp.sum(x**2)

    val, (gK, gb) = jax.value_and_grad(f, argnums=(0, 1))(K_data, b)
    rng = np.random.RandomState(1)
    dK = jnp.asarray(rng.normal(size=K_data.shape))
    db = jnp.asarray(rng.normal(size=b.shape))
    h = 1e-6
    fd = (f(K_data + h * dK, b + h * db)
          - f(K_data - h * dK, b - h * db)) / (2 * h)
    ad = jnp.vdot(gK, dK) + jnp.vdot(gb, db)
    np.testing.assert_allclose(float(ad), float(fd), rtol=1e-5)
