"""Sparse-solver arms: correctness of every solver x preconditioner
combination on a real assembled tangent, and AD through the solves.

Mirrors the reference's 917-line tests/fem/test_sparse_solve.py intent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.fem.assembly import assemble_global
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _embedded_bc_enforce,
    jax_block_gmres,
    jax_cg,
    jax_cg_with_iters,
    jax_gmres,
    scipy_lu,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _assembled_system(mixed=False):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    layouts = [GlobalFieldLayout("u", Q1_HEX)]
    comps = {"u": 3}
    gr = SmallDispEquilibrium(ndims=3, mixed=mixed)
    if mixed:
        layouts.append(GlobalFieldLayout("p", Q1_HEX))
        comps["p"] = 1
    dof_map = build_dof_map(mesh, layouts, bcs, comps)
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          modes_by_block={
                              "all": GlobalResidualMode.CLOSED_FORM})
    arrays = fe.kernel_arrays
    n = dof_map.num_total_dofs
    U = jnp.zeros(n)
    K_bcoo, _, _ = assemble_global(
        fe, arrays, {"all": model.parameters.values}, U, U, 1.0)
    K_data, _ = _embedded_bc_enforce(K_bcoo,
                                     arrays.prescribed_indices)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.normal(size=n))
    return fe, arrays, K_data, b


@pytest.fixture(scope="module")
def system():
    return _assembled_system(mixed=False)


@pytest.fixture(scope="module")
def mixed_system():
    return _assembled_system(mixed=True)


def _dense(K_data, sparsity):
    unique, _ = _bcsr_operator(K_data, sparsity)
    n = sparsity.n
    indptr = np.asarray(sparsity.indptr)
    cols = np.asarray(sparsity.col_indices)
    return scipy.sparse.csr_matrix(
        (np.asarray(unique), cols, indptr), shape=(n, n)).toarray()


def test_direct_matches_dense(system):
    fe, arrays, K_data, b = system
    x = scipy_lu(K_data, arrays.embedded_sparsity, b)
    K = _dense(K_data, arrays.embedded_sparsity)
    assert np.allclose(np.asarray(x), np.linalg.solve(K, np.asarray(b)),
                       atol=1e-10)


def test_cg_chebyshev_matches_direct(system):
    from cmad_tpu.fem.sparse_solve import jax_cg_chebyshev

    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    x_dense = np.linalg.solve(_dense(K_data, sp), np.asarray(b))
    for degree in (1, 3, 5):
        x = jax_cg_chebyshev(K_data, sp, b, rtol=1e-12, degree=degree)
        np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8,
                                   atol=1e-12)


def test_cg_chebyshev_iterations_beat_jacobi(system):
    """The polynomial preconditioner must cut CG iterations vs plain
    Jacobi on the same operator (that is its whole purpose)."""
    import jax.numpy as jnp
    from jax import lax

    from cmad_tpu.fem.sparse_solve import (
        _bcsr_operator,
        _CHEB_LMAX_SAFETY,
        _CHEB_LMIN_FRAC,
        _chebyshev_apply,
        _lanczos_dominant_eig,
    )

    fe, arrays, K_data, b = system
    sp = arrays.embedded_sparsity
    unique, matvec = _bcsr_operator(K_data, sp)
    diag = unique[sp.diag_idx]
    dis = 1.0 / jnp.sqrt(diag)

    def scaled_mv(x):
        return dis * matvec(dis * x)

    lmax = _lanczos_dominant_eig(scaled_mv, sp.n, unique.dtype)
    lmax = lmax * _CHEB_LMAX_SAFETY
    lmin = lmax * _CHEB_LMIN_FRAC

    def count_iters(precon):
        x = jnp.zeros_like(b)
        r = b - matvec(x)
        z = precon(r)
        p, rz, it = z, r @ z, 0
        tol_sq = 1e-20 * float(b @ b)
        while float(r @ r) > tol_sq and it < 2000:
            Ap = matvec(p)
            alpha = rz / (p @ Ap)
            x, r = x + alpha * p, r - alpha * Ap
            z = precon(r)
            rz_new = r @ z
            p = z + (rz_new / rz) * p
            rz, it = rz_new, it + 1
        return it

    jacobi_iters = count_iters(lambda r: r / diag)
    cheb_iters = count_iters(
        lambda r: dis * _chebyshev_apply(scaled_mv, dis * r, lmin, lmax,
                                         3))
    assert cheb_iters < 0.6 * jacobi_iters, (jacobi_iters, cheb_iters)


def test_cg_and_gmres_match_direct(system):
    fe, arrays, K_data, b = system
    x_lu = np.asarray(scipy_lu(K_data, arrays.embedded_sparsity, b))
    x_cg = np.asarray(jax_cg(K_data, arrays.embedded_sparsity, b,
                             rtol=1e-13))
    x_gm = np.asarray(jax_gmres(K_data, arrays.embedded_sparsity, b,
                                rtol=1e-13, restart=50))
    assert np.allclose(x_cg, x_lu, atol=1e-8)
    assert np.allclose(x_gm, x_lu, atol=1e-7)
    x_it, iters = jax_cg_with_iters(K_data, arrays.embedded_sparsity, b,
                                    rtol=1e-13)
    assert np.allclose(np.asarray(x_it), x_lu, atol=1e-8)
    assert 0 < int(iters) < 10 * b.shape[0]


@pytest.mark.parametrize("spec", [
    dict(coupling="diagonal", inner="jacobi", diagonal_block="assembled"),
    dict(coupling="lower", inner="jacobi", diagonal_block="assembled"),
    dict(coupling="upper", inner="chebyshev", diagonal_block="assembled"),
    dict(coupling="lower", inner="chebyshev", diagonal_block="schur"),
], ids=lambda s: f"{s['coupling']}-{s['inner']}-{s['diagonal_block']}")
def test_block_gmres_arms(mixed_system, spec):
    fe, arrays, K_data, b = mixed_system
    x_lu = np.asarray(scipy_lu(K_data, arrays.embedded_sparsity, b))
    x = np.asarray(jax_block_gmres(
        K_data, arrays.embedded_sparsity, b, arrays.block_sparsity,
        rtol=1e-13, restart=60, **spec))
    assert np.allclose(x, x_lu, atol=1e-6)


@pytest.mark.parametrize("solver", ["direct", "cg", "gmres"])
def test_ad_through_solves(system, solver):
    """grad of f(K_data, b) = w . solve(K, b) matches the dense-algebra
    adjoint for all three solver arms."""
    fe, arrays, K_data, b = system
    sparsity = arrays.embedded_sparsity
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.normal(size=b.shape[0]))

    solve = {"direct": scipy_lu,
             "cg": lambda d, s, r: jax_cg(d, s, r, rtol=1e-13),
             "gmres": lambda d, s, r: jax_gmres(d, s, r, rtol=1e-13,
                                                restart=50)}[solver]

    def f(K_data, b):
        return w @ solve(K_data, sparsity, b)

    gK, gb = jax.grad(f, argnums=(0, 1))(K_data, b)

    K = _dense(K_data, sparsity)
    lam = np.linalg.solve(K.T, np.asarray(w))
    assert np.allclose(np.asarray(gb), lam, atol=1e-7)

    # db/dK via adjoint: dF/dK = -lam x^T; map through the dedup structure
    x = np.linalg.solve(K, np.asarray(b))
    perm = np.asarray(sparsity.perm)
    seg = np.asarray(sparsity.segment_ids)
    indptr = np.asarray(sparsity.indptr)
    cols = np.asarray(sparsity.col_indices)
    rows = np.repeat(np.arange(sparsity.n), np.diff(indptr))
    dF_dunique = -lam[rows] * x[cols]
    expected_gK = np.zeros(K_data.shape[0])
    expected_gK[perm] = dF_dunique[seg]
    assert np.allclose(np.asarray(gK), expected_gK, atol=1e-7)


def test_batched_rhs_under_vmap(system):
    fe, arrays, K_data, b = system
    rng = np.random.RandomState(2)
    B = jnp.asarray(rng.normal(size=(4, b.shape[0])))
    X = jax.vmap(lambda rhs: scipy_lu(K_data, arrays.embedded_sparsity,
                                      rhs))(B)
    K = _dense(K_data, arrays.embedded_sparsity)
    assert np.allclose(np.asarray(X),
                       np.linalg.solve(K, np.asarray(B).T).T, atol=1e-9)


def test_equilibrate_data_is_symmetric_scaling(mixed_system):
    """dedup(equilibrated data) == S K S with S = diag(1/sqrt(|diag K|)),
    and the change-of-variables round trip reproduces the direct solve."""
    from cmad_tpu.fem.sparse_solve import equilibrate_data

    fe, arrays, K_data, b = mixed_system
    sparsity = arrays.embedded_sparsity
    Ks_data, s = equilibrate_data(K_data, sparsity)

    K = _dense(K_data, sparsity)
    Ks = _dense(Ks_data, sparsity)
    s_np = np.asarray(s)
    assert np.allclose(Ks, s_np[:, None] * K * s_np[None, :],
                       rtol=1e-12, atol=1e-12)
    # unit diagonal after scaling (all diagonals nonzero here)
    assert np.allclose(np.abs(np.diag(Ks)), 1.0, atol=1e-12)

    y = scipy_lu(Ks_data, sparsity, s * b)
    x = s * y
    assert np.allclose(np.asarray(x),
                       np.linalg.solve(K, np.asarray(b)), atol=1e-8)


def test_solve_linear_equilibrate_matches_direct(mixed_system):
    """solve_linear with equilibrate on (auto for mixed layouts) returns
    the solution of the ORIGINAL system for every arm."""
    from cmad_tpu.fem.nonlinear_solver import solve_linear

    fe, arrays, K_data, b = mixed_system
    K = _dense(K_data, arrays.embedded_sparsity)
    x_ref = np.linalg.solve(K, np.asarray(b))

    for settings in (
            {"type": "direct"},   # auto -> on for the mixed layout
            {"type": "gmres", "rtol": 1e-12, "max iters": 2000,
             "restart": 50,
             "preconditioner": {"type": "two_level",
                                "aggregate nodes": 8}},
            {"type": "direct", "equilibrate": False}):
        x = solve_linear(K_data, fe, arrays, jnp.asarray(b), settings)
        assert np.allclose(np.asarray(x), x_ref, rtol=1e-6, atol=1e-8), \
            settings
