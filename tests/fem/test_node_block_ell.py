"""Node-block ELL matvec == BCSR matmul on the embedded pattern.

The ELL form (EmbeddedSparsity.nb_col/nb_src) is a pure operator-level
implementation detail: the Krylov arms must see the same matvec values,
the same solves, and the same AD, with prescribed-BC rows (partially
present 3x3 blocks) handled exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.sparse import BCSR

from cmad_tpu.fem.assembly import (
    assemble_global,
    params_by_block_from_models,
)
from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import P1_TET, Q1_HEX
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.fem.sparse_solve import (
    _bcsr_operator,
    _embedded_bc_enforce,
    jax_cg,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _fe(tet=False):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    if tet:
        mesh = hex_to_tet_split(mesh)
    fe_elem = P1_TET if tet else Q1_HEX
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None),
           DirichletBC(["xmax_sides"], "u", [0], [1.0e-3])]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", fe_elem)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 10.0, "nu": 0.3}}))
    return build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})


def _operator(fe):
    params = params_by_block_from_models(fe)
    n = fe.dof_map.num_total_dofs
    U = jnp.zeros(n)
    K, _R, _ = assemble_global(fe, fe.kernel_arrays, params, U, U, 1.0)
    K_data, _ = _embedded_bc_enforce(K,
                                     fe.kernel_arrays.prescribed_indices)
    return K_data, fe.kernel_arrays.embedded_sparsity


@pytest.mark.parametrize("tet", [False, True])
def test_block_ell_matvec_matches_bcsr(tet):
    fe = _fe(tet)
    K_data, sp = _operator(fe)
    assert sp.nb_src is not None, "3-dof layout must build the ELL form"

    unique, matvec = _bcsr_operator(K_data, sp)
    K = BCSR((unique, sp.col_indices, sp.indptr), shape=(sp.n, sp.n))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=sp.n))
    y_ell = matvec(x)
    y_csr = K @ x
    np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_csr),
                               rtol=1e-12, atol=1e-14)

    # batched input falls back to the BCSR matmul
    X = jnp.asarray(rng.normal(size=(sp.n, 3)))
    np.testing.assert_allclose(np.asarray(matvec(X)), np.asarray(K @ X),
                               rtol=1e-12, atol=1e-14)


def test_block_ell_prescribed_rows_exact():
    """Prescribed dofs keep only their diagonal in the embedded
    pattern — the partially-present 3x3 blocks must act exactly."""
    fe = _fe(tet=False)
    K_data, sp = _operator(fe)
    _unique, matvec = _bcsr_operator(K_data, sp)
    presc = np.asarray(fe.kernel_arrays.prescribed_indices)
    assert presc.size > 0
    diag = np.asarray(_unique[sp.diag_idx])
    for d in presc[:3]:
        e = jnp.zeros(sp.n).at[d].set(1.0)
        y = np.asarray(matvec(e))
        expect = np.zeros(sp.n)
        expect[d] = diag[d]
        np.testing.assert_allclose(y, expect, rtol=1e-12, atol=1e-14)


def test_block_ell_absent_for_mixed_layout():
    """Mixed u-p (two-field) layouts are not interleaved 3-dof — the
    ELL form must not be built there."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(
        mesh, [GlobalFieldLayout("u", Q1_HEX),
               GlobalFieldLayout("p", Q1_HEX)], bcs, {"u": 3, "p": 1})
    model = Elastic(Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 10.0, "nu": 0.3}}))
    fe = build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3, mixed=True),
        {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})
    assert fe.kernel_arrays.embedded_sparsity.nb_src is None


def test_cg_value_and_grad_through_block_ell():
    """jax_cg value + AD agree with a dense solve through the new
    operator (the custom_linear_solve transpose path)."""
    fe = _fe(tet=False)
    K_data, sp = _operator(fe)

    rng = np.random.RandomState(1)
    b = jnp.asarray(rng.normal(size=sp.n))

    def solve_cg(K_data):
        return jax_cg(K_data, sp, b, rtol=1e-12, max_iters=2000)

    def solve_dense(K_data):
        unique, _ = _bcsr_operator(K_data, sp)
        K = BCSR((unique, sp.col_indices, sp.indptr),
                 shape=(sp.n, sp.n)).todense()
        return jnp.linalg.solve(K, b)

    x_cg, x_d = solve_cg(K_data), solve_dense(K_data)
    np.testing.assert_allclose(np.asarray(x_cg), np.asarray(x_d),
                               rtol=1e-8, atol=1e-10)

    g_cg = jax.grad(lambda kd: jnp.sum(solve_cg(kd) ** 2))(K_data)
    g_d = jax.grad(lambda kd: jnp.sum(solve_dense(kd) ** 2))(K_data)
    scale = float(jnp.max(jnp.abs(g_d)))
    np.testing.assert_allclose(np.asarray(g_cg), np.asarray(g_d),
                               atol=1e-7 * scale)
