"""Two-level (aggregation/RBM) preconditioner: correctness, AD, and the
iteration-scaling property it exists for.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.assembly import assemble_global
from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.fem.nonlinear_solver import get_two_level_pattern
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _embedded_bc_enforce,
    coo_rows_from_indptr,
    jax_cg_two_level,
)
from cmad_tpu.fem.two_level import make_two_level_preconditioner
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _system(n):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})
    arrays = fe.kernel_arrays
    N = dof_map.num_total_dofs
    U = jnp.zeros(N)
    K_bcoo, _, _ = assemble_global(
        fe, arrays, {"all": model.parameters.values}, U, U, 1.0)
    K_data, _ = _embedded_bc_enforce(K_bcoo, arrays.prescribed_indices)
    b = jnp.asarray(np.random.RandomState(0).normal(size=N))
    return fe, arrays, K_data, b


def _pcg_iters(matvec, precon, b, rtol=1e-10, max_iters=3000):
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    z = precon(r)
    p, rz, it = z, float(r @ z), 0
    tol_sq = rtol ** 2 * float(b @ b)
    while float(r @ r) > tol_sq and it < max_iters:
        Ap = matvec(p)
        alpha = rz / float(p @ Ap)
        x, r = x + alpha * p, r - alpha * Ap
        z = precon(r)
        rz_new = float(r @ z)
        p = z + (rz_new / rz) * p
        rz, it = rz_new, it + 1
    return it


def test_two_level_solution_matches_direct():
    fe, arrays, K_data, b = _system(3)
    sp = arrays.embedded_sparsity
    pattern = get_two_level_pattern(fe, target_nodes_per_aggregate=16)
    x = jax_cg_two_level(K_data, sp, b, pattern, rtol=1e-12)

    unique, _ = _bcsr_operator(K_data, sp)
    import scipy.sparse

    K = scipy.sparse.csr_matrix(
        (np.asarray(unique), np.asarray(sp.col_indices),
         np.asarray(sp.indptr)), shape=(sp.n, sp.n))
    x_ref = scipy.sparse.linalg.spsolve(K.tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8,
                               atol=1e-11)


def test_two_level_pattern_is_cached():
    fe, *_ = _system(2)
    p1 = get_two_level_pattern(fe, 16)
    p2 = get_two_level_pattern(fe, 16)
    assert p1 is p2
    p3 = get_two_level_pattern(fe, 8)
    assert p3 is not p1


def test_two_level_cuts_iteration_growth():
    """Jacobi-CG iterations grow ~2x per mesh halving; the coarse
    correction must hold the growth well under that AND beat Jacobi
    outright on the finer mesh."""
    results = {}
    for n in (4, 8):
        fe, arrays, K_data, b = _system(n)
        sp = arrays.embedded_sparsity
        unique, matvec = _bcsr_operator(K_data, sp)
        diag = unique[sp.diag_idx]
        rows = coo_rows_from_indptr(sp)
        pattern = get_two_level_pattern(fe, target_nodes_per_aggregate=32)
        two_level = make_two_level_preconditioner(
            pattern, unique, rows, sp.col_indices, diag)
        results[n] = {
            "jacobi": _pcg_iters(matvec, lambda r: r / diag, b),
            "two_level": _pcg_iters(matvec, two_level, b),
        }
    fine = results[8]
    assert fine["two_level"] < 0.55 * fine["jacobi"], results
    growth_tl = results[8]["two_level"] / results[4]["two_level"]
    growth_j = results[8]["jacobi"] / results[4]["jacobi"]
    assert growth_tl < growth_j, results


def _mixed_system():
    from cmad_tpu.global_residuals.small_disp_equilibrium import (
        SmallDispEquilibrium as SDE,
    )

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(
        mesh, [GlobalFieldLayout("u", Q1_HEX),
               GlobalFieldLayout("p", Q1_HEX)], bcs, {"u": 3, "p": 1})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.49}}))
    fe = build_fe_problem(
        mesh, dof_map, SDE(ndims=3, mixed=True), {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})
    arrays = fe.kernel_arrays
    N = dof_map.num_total_dofs
    U = jnp.zeros(N)
    K_bcoo, _, _ = assemble_global(
        fe, arrays, {"all": model.parameters.values}, U, U, 1.0)
    K_data, _ = _embedded_bc_enforce(K_bcoo, arrays.prescribed_indices)
    b = jnp.asarray(np.random.RandomState(2).normal(size=N))
    return fe, arrays, K_data, b


def test_mixed_two_level_gmres_matches_direct():
    from cmad_tpu.fem.sparse_solve import jax_gmres_two_level

    fe, arrays, K_data, b = _mixed_system()
    sp = arrays.embedded_sparsity
    pattern = get_two_level_pattern(fe, target_nodes_per_aggregate=16)
    assert pattern.width == 7
    x = jax_gmres_two_level(K_data, sp, b, pattern, rtol=1e-12,
                            max_iters=2000, restart=40)

    unique, _ = _bcsr_operator(K_data, sp)
    import scipy.sparse

    K = scipy.sparse.csr_matrix(
        (np.asarray(unique), np.asarray(sp.col_indices),
         np.asarray(sp.indptr)), shape=(sp.n, sp.n))
    x_ref = scipy.sparse.linalg.spsolve(K.tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-6,
                               atol=1e-9 * np.abs(x_ref).max())


def test_mixed_two_level_drives_newton():
    """Full mixed u-p elastic patch solved with gmres + two_level
    matches the direct solve."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from fem.test_mixed_up import _problem

    from cmad_tpu.fem.driver import fe_quasistatic_drive

    _, _, fe = _problem()
    state_tl, _ = fe_quasistatic_drive(
        fe, [0.0, 1.0],
        linear_solver_settings={
            "type": "gmres", "rtol": 1e-12, "max iters": 4000,
            "restart": 40,
            "preconditioner": {"type": "two_level",
                               "aggregate nodes": 16}})
    _, _, fe2 = _problem()
    state_d, _ = fe_quasistatic_drive(
        fe2, [0.0, 1.0], linear_solver_settings={"type": "direct"})
    np.testing.assert_allclose(np.asarray(state_tl.U_at(1)),
                               np.asarray(state_d.U_at(1)),
                               rtol=1e-8, atol=1e-10)


def test_grad_through_two_level_solve():
    fe, arrays, _, b = _system(2)
    sp = arrays.embedded_sparsity
    pattern = get_two_level_pattern(fe, 16)
    N = fe.dof_map.num_total_dofs

    def K_of(E):
        m = Elastic(Parameters({"elastic": {"E": E, "nu": 0.3}}))
        U = jnp.zeros(N)
        K_bcoo, _, _ = assemble_global(
            fe, arrays, {"all": m.parameters.values}, U, U, 1.0)
        K_data, _ = _embedded_bc_enforce(K_bcoo,
                                         arrays.prescribed_indices)
        return K_data

    def loss(E):
        x = jax_cg_two_level(K_of(E), sp, b, pattern, rtol=1e-13)
        return jnp.sum(x * x)

    g = float(jax.grad(loss)(1000.0))
    h = 1.0
    fd = (float(loss(1000.0 + h)) - float(loss(1000.0 - h))) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_node_block_smoother_is_block_jacobi_inverse():
    """_node_block_smoother applies exactly the dense per-node 4x4
    block-Jacobi inverse (u components + the node's p dof)."""
    from cmad_tpu.fem.two_level import _node_block_smoother

    fe, arrays, K_data, b = _mixed_system()
    sp = arrays.embedded_sparsity
    pattern = get_two_level_pattern(fe, target_nodes_per_aggregate=16)
    unique, _ = _bcsr_operator(K_data, sp)
    rows = coo_rows_from_indptr(sp)

    smooth, smooth_T = _node_block_smoother(pattern, unique, rows,
                                            sp.col_indices)
    z = np.asarray(smooth(b))
    zT = np.asarray(smooth_T(b))

    import scipy.sparse

    K = scipy.sparse.csr_matrix(
        (np.asarray(unique), np.asarray(sp.col_indices),
         np.asarray(sp.indptr)), shape=(sp.n, sp.n)).toarray()
    n = sp.n
    n_nodes = n // 4
    z_ref = np.zeros(n)
    zT_ref = np.zeros(n)
    bn = np.asarray(b)
    for node in range(n_nodes):
        idx = [3 * node, 3 * node + 1, 3 * node + 2, 3 * n_nodes + node]
        B = K[np.ix_(idx, idx)]
        z_ref[idx] = np.linalg.solve(B, bn[idx])
        zT_ref[idx] = np.linalg.solve(B.T, bn[idx])
    np.testing.assert_allclose(z, z_ref, rtol=5e-5,
                               atol=1e-8 * np.abs(z_ref).max())
    np.testing.assert_allclose(zT, zT_ref, rtol=5e-5,
                               atol=1e-8 * np.abs(zT_ref).max())


def test_pattern_auto_coarsens_past_dense_ceiling():
    """A 300k+ node mesh at the default aggregate size would ask for a
    >24k-dof dense coarse space; the builder auto-coarsens instead of
    failing, and the result stays under the ceiling."""
    import warnings

    from cmad_tpu.fem.two_level import (
        DENSE_COARSE_CEILING,
        build_two_level_pattern,
        build_two_level_pattern_mixed,
    )

    rng = np.random.RandomState(0)
    n_nodes = 310_000
    coords = rng.uniform(size=(n_nodes, 3))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pattern = build_two_level_pattern(
            coords, np.zeros(0, dtype=np.int64), 3 * n_nodes)
    assert any("nodes/aggregate" in str(x.message) for x in w)
    assert pattern.coarse_dim <= DENSE_COARSE_CEILING
    assert pattern.num_aggregates > 100  # still a real coarse space

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pm = build_two_level_pattern_mixed(
            coords, np.zeros(0, dtype=np.int64), 4 * n_nodes)
    assert any("nodes/aggregate" in str(x.message) for x in w)
    assert pm.coarse_dim <= DENSE_COARSE_CEILING


def test_pattern_no_warning_under_ceiling():
    import warnings

    from cmad_tpu.fem.two_level import build_two_level_pattern

    rng = np.random.RandomState(1)
    coords = rng.uniform(size=(500, 3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        build_two_level_pattern(coords, np.zeros(0, dtype=np.int64),
                                1500)
    assert not [x for x in w if "nodes/aggregate" in str(x.message)]
