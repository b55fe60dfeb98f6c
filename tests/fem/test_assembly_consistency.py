"""Assembled tangent == AD of the assembled residual.

The strongest guard on the COO emit-order/dedup contract (SURVEY.md
section 7 "hard parts": a silent-corruption spot in the reference): the
scattered, deduped K must equal the dense Jacobian of the scattered
residual, in CLOSED_FORM and in COUPLED mode (through the per-IP local
Newton's IFT rule).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.tree_util import tree_map

from cmad_tpu.fem.assembly import (
    assemble_global,
    assemble_global_residual,
    params_by_block_from_models,
)
from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters


def _problem(model, mode):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    return build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                            {"all": model},
                            modes_by_block={"all": mode})


def _plastic_model():
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}}
    return SmallRateElasticPlastic(Parameters(
        values, tree_map(lambda _: False, values),
        tree_map(lambda _: None, values)))


@pytest.mark.parametrize("mode", [GlobalResidualMode.CLOSED_FORM,
                                  GlobalResidualMode.COUPLED])
def test_K_is_jacobian_of_R_elastic(mode):
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = _problem(model, mode)
    params = params_by_block_from_models(fe)
    arrays = fe.kernel_arrays
    n = fe.dof_map.num_total_dofs
    st = FEState.from_problem(fe)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    rng = np.random.RandomState(0)
    U = jnp.asarray(1e-3 * rng.normal(size=n))
    U_prev = jnp.zeros(n)

    K, R, _ = assemble_global(fe, arrays, params, U, U_prev, 1.0,
                              xi_prev_by_block=xi_prev)
    K_dense = np.asarray(K.todense())

    def R_of_U(u):
        return assemble_global_residual(fe, arrays, params, u, U_prev,
                                        1.0, xi_prev_by_block=xi_prev)

    J = np.asarray(jax.jacfwd(R_of_U)(U))
    np.testing.assert_allclose(K_dense, J, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_of_U(U)),
                               rtol=1e-12, atol=1e-14)


def test_K_is_jacobian_of_R_plastic_coupled():
    """Consistent tangent through the local return map at a genuinely
    plastic state."""
    model = _plastic_model()
    fe = _problem(model, GlobalResidualMode.COUPLED)
    params = params_by_block_from_models(fe)
    arrays = fe.kernel_arrays
    n = fe.dof_map.num_total_dofs
    st = FEState.from_problem(fe)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    # a stretch well past yield (Y/E ~ 1e-3; drive 5e-3)
    U = jnp.zeros(n)
    x = np.asarray(fe.mesh.nodes[:, 0])
    U = U.at[0::3].set(jnp.asarray(5e-3 * x))
    U_prev = jnp.zeros(n)

    K, R, xi_solved = assemble_global(fe, arrays, params, U, U_prev, 1.0,
                                      xi_prev_by_block=xi_prev)
    assert float(np.asarray(xi_solved["all"])[..., 6].max()) > 0.0, \
        "state never went plastic — test is vacuous"
    K_dense = np.asarray(K.todense())

    def R_of_U(u):
        return assemble_global_residual(fe, arrays, params, u, U_prev,
                                        1.0, xi_prev_by_block=xi_prev)

    J = np.asarray(jax.jacfwd(R_of_U)(U))
    scale = np.abs(J).max()
    np.testing.assert_allclose(K_dense, J, atol=1e-8 * scale)


def test_K_matches_central_fd_plastic_coupled():
    """AD-independent guard: the assembled tangent must match CENTRAL
    FINITE DIFFERENCES of the assembled residual (reference parity:
    ``tests/global_residuals/test_for_model_coupled.py
    test_dR_dU_total_matches_central_fd``). K == jacfwd(R) above could
    hide a bug shared by both AD paths; FD is independent of AD."""
    model = _plastic_model()
    fe = _problem(model, GlobalResidualMode.COUPLED)
    params = params_by_block_from_models(fe)
    arrays = fe.kernel_arrays
    n = fe.dof_map.num_total_dofs
    st = FEState.from_problem(fe)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    U = jnp.zeros(n)
    x = np.asarray(fe.mesh.nodes[:, 0])
    U = U.at[0::3].set(jnp.asarray(5e-3 * x))
    U_prev = jnp.zeros(n)

    K, _, xi_solved = assemble_global(fe, arrays, params, U, U_prev, 1.0,
                                      xi_prev_by_block=xi_prev)
    assert float(np.asarray(xi_solved["all"])[..., 6].max()) > 0.0
    K_dense = np.asarray(K.todense())

    R_of_U = jax.jit(lambda u: assemble_global_residual(
        fe, arrays, params, u, U_prev, 1.0, xi_prev_by_block=xi_prev))

    h = 1e-6  # f64: balances truncation vs roundoff at |U| ~ 5e-3
    cols = []
    rng = np.random.RandomState(3)
    probe = rng.choice(n, size=min(12, n), replace=False)
    for i in probe:
        e = jnp.zeros(n).at[i].set(h)
        cols.append((np.asarray(R_of_U(U + e))
                     - np.asarray(R_of_U(U - e))) / (2 * h))
    K_fd = np.stack(cols, axis=1)
    scale = np.abs(K_dense).max()
    np.testing.assert_allclose(K_dense[:, probe], K_fd,
                               atol=5e-6 * scale)
