"""Complete legal-arm grid for the block-preconditioned GMRES.

Legal cells of {coupling} x {inner} x {diagonal_block}:
``inner='jacobi'`` pairs only with ``diagonal_block='assembled'``
(enforced with a ValueError), so the grid is 3 jacobi-assembled cells +
6 chebyshev cells = 9. Every cell is checked for value agreement with
the direct solve AND for JVP/VJP (w.r.t. both the tangent data and the
rhs) against a dense differentiable reference — the VJP path exercises
the transposed preconditioner through ``custom_linear_solve``.

Matches the per-arm derivative sweep of reference
``tests/fem/test_sparse_solve.py`` for its block arms.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.sparse_solve import jax_block_gmres, scipy_lu

from .test_sparse_solve import _assembled_system
from .test_sparse_solve_ad_grid import _dense_solve_ref


@pytest.fixture(scope="module")
def mixed_system():
    return _assembled_system(mixed=True)


def _legal_cells():
    cells = []
    for coupling, inner, diag in itertools.product(
            ("diagonal", "lower", "upper"),
            ("jacobi", "chebyshev"),
            ("assembled", "schur")):
        if inner == "jacobi" and diag != "assembled":
            continue
        cells.append(dict(coupling=coupling, inner=inner,
                          diagonal_block=diag))
    return cells


CELLS = _legal_cells()
assert len(CELLS) == 9


@pytest.mark.parametrize(
    "spec", CELLS,
    ids=lambda s: f"{s['coupling']}-{s['inner']}-{s['diagonal_block']}")
def test_block_gmres_cell_value_and_ad(mixed_system, spec):
    fe, arrays, K_data, b = mixed_system
    sp = arrays.embedded_sparsity
    bs = arrays.block_sparsity

    def solve(K, rhs):
        return jax_block_gmres(K, sp, rhs, bs, rtol=1e-13, restart=60,
                               **spec)

    # value vs direct
    x_lu = np.asarray(scipy_lu(K_data, sp, b))
    x = np.asarray(solve(K_data, b))
    assert np.allclose(x, x_lu, atol=1e-6), np.abs(x - x_lu).max()

    ref = _dense_solve_ref(sp)
    rng = np.random.RandomState(3)
    dK = jnp.asarray(rng.normal(size=K_data.shape))
    db = jnp.asarray(rng.normal(size=b.shape))

    # JVP w.r.t. (K_data, b)
    _, dx = jax.jvp(solve, (K_data, b), (dK, db))
    _, dx_ref = jax.jvp(ref, (K_data, b), (dK, db))
    scale = float(jnp.linalg.norm(dx_ref))
    assert float(jnp.linalg.norm(dx - dx_ref)) < 1e-6 * scale

    # VJP w.r.t. (K_data, b) — drives the transposed preconditioner
    w = jnp.asarray(rng.normal(size=b.shape))
    gK, gb = jax.grad(lambda K, rhs: w @ solve(K, rhs),
                      argnums=(0, 1))(K_data, b)
    gK_ref, gb_ref = jax.grad(lambda K, rhs: w @ ref(K, rhs),
                              argnums=(0, 1))(K_data, b)
    assert float(jnp.linalg.norm(gb - gb_ref)) < \
        1e-6 * float(jnp.linalg.norm(gb_ref))
    assert float(jnp.linalg.norm(gK - gK_ref)) < \
        1e-6 * float(jnp.linalg.norm(gK_ref))


def test_illegal_jacobi_schur_raises(mixed_system):
    fe, arrays, K_data, b = mixed_system
    with pytest.raises(NotImplementedError, match="jacobi"):
        jax_block_gmres(K_data, arrays.embedded_sparsity, b,
                        arrays.block_sparsity, inner="jacobi",
                        diagonal_block="schur")


@pytest.mark.parametrize("field,bad", [
    ("inner", "ilu"), ("diagonal_block", "exact")])
def test_unknown_options_raise(mixed_system, field, bad):
    fe, arrays, K_data, b = mixed_system
    spec = dict(coupling="lower", inner="chebyshev",
                diagonal_block="assembled")
    spec[field] = bad
    with pytest.raises(NotImplementedError, match=bad):
        jax_block_gmres(K_data, arrays.embedded_sparsity, b,
                        arrays.block_sparsity, **spec)
