"""FE COUPLED block fast path (fem/j2_block.py) == generic per-IP path.

The SoA block kernels must be a pure implementation detail: residual,
tangent, converged state, parameter derivatives, and full Newton solves
must match the generic nested-vmap path (which this suite re-enables via
``CMAD_FE_BLOCK_FASTPATH=0``) to solver tolerance, including body-force
and tet-mesh cases.
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
from cmad_tpu.fem.elements import P1_TET, Q1_HEX
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.fem.nonlinear_solver import fe_newton_solve
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.parameters.parameters import Parameters


def _model(active=False, kind="rate"):
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}}
    cls = SmallRateElasticPlastic if kind == "rate" else SmallElasticPlastic
    if active:
        flags = tree_map(lambda _: False, values)
        flags["elastic"]["E"] = True
        flags["plastic"]["flow stress"]["initial yield"]["Y"] = True
        return cls(Parameters(
            values, flags, tree_map(lambda _: None, values)))
    return cls(Parameters(values))


def _problem(tet=False, forcing=None, fastpath=True, monkeypatch=None,
             active=False, kind="rate"):
    if not fastpath:
        monkeypatch.setenv("CMAD_FE_BLOCK_FASTPATH", "0")
    try:
        mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 1))
        if tet:
            mesh = hex_to_tet_split(mesh)
        fe_elem = P1_TET if tet else Q1_HEX
        bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None),
               DirichletBC(["xmax_sides"], "u", [0],
                           lambda c, t: 0.004 * t
                           * jnp.ones((c.shape[0], 1)))]
        dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", fe_elem)],
                                bcs, {"u": 3})
        from cmad_tpu.global_residuals.small_disp_equilibrium import (
            SmallDispEquilibrium,
        )
        return build_fe_problem(
            mesh, dof_map, SmallDispEquilibrium(ndims=3),
            {"all": _model(active, kind)},
            modes_by_block={"all": GlobalResidualMode.COUPLED},
            forcing_fns_by_block_idx=forcing)
    finally:
        if not fastpath:
            monkeypatch.delenv("CMAD_FE_BLOCK_FASTPATH")


def _plastic_U(fe, scale=5e-3):
    n = fe.dof_map.num_total_dofs
    rng = np.random.RandomState(3)
    U = scale * np.asarray(fe.mesh.nodes[:, 0])
    full = np.zeros(n)
    full[0::3] = U
    full += 1e-4 * rng.normal(size=n)
    return jnp.asarray(full)


def test_fastpath_attached_only_when_applicable(monkeypatch):
    fe = _problem()
    assert "block_R_and_K_and_xi" in fe.evaluators_by_block["all"]
    assert "block_R" in fe.evaluators_by_block["all"]
    fe_off = _problem(fastpath=False, monkeypatch=monkeypatch)
    assert "block_R_and_K_and_xi" not in fe_off.evaluators_by_block["all"]

    # CLOSED_FORM / non-J2 models must not get block kernels
    from cmad_tpu.fem.j2_block import j2_block_applicable
    gr = fe.gr
    assert not j2_block_applicable(gr, _model(),
                                   GlobalResidualMode.CLOSED_FORM, False)
    assert not j2_block_applicable(gr, _model(),
                                   GlobalResidualMode.COUPLED, True)


@pytest.mark.parametrize("kind", ["rate", "total"])
@pytest.mark.parametrize("tet", [False, True])
def test_assembly_equivalence(monkeypatch, tet, kind):
    forcing = {0: lambda x, t: jnp.asarray([0.0, 0.0, -1.0e2 * t])}
    fe_a = _problem(tet=tet, forcing=forcing, kind=kind)
    fe_b = _problem(tet=tet, forcing=forcing, fastpath=False,
                    monkeypatch=monkeypatch, kind=kind)
    assert "block_R_and_K_and_xi" in fe_a.evaluators_by_block["all"]
    assert "block_R_and_K_and_xi" not in fe_b.evaluators_by_block["all"]

    params = params_by_block_from_models(fe_a)
    U = _plastic_U(fe_a)
    U_prev = jnp.zeros_like(U)
    st = FEState.from_problem(fe_a)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    K_a, R_a, xi_a = assemble_global(fe_a, fe_a.kernel_arrays, params, U,
                                     U_prev, 1.0, xi_prev_by_block=xi_prev)
    K_b, R_b, xi_b = assemble_global(fe_b, fe_b.kernel_arrays, params, U,
                                     U_prev, 1.0, xi_prev_by_block=xi_prev)
    assert float(np.asarray(xi_a["all"])[..., 6].max()) > 0.0

    np.testing.assert_allclose(np.asarray(R_a), np.asarray(R_b),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xi_a["all"]),
                               np.asarray(xi_b["all"]),
                               rtol=1e-10, atol=1e-12)
    Kd_a, Kd_b = np.asarray(K_a.todense()), np.asarray(K_b.todense())
    scale = np.abs(Kd_b).max()
    np.testing.assert_allclose(Kd_a, Kd_b, atol=1e-9 * scale)

    # residual-only entry point (line-search probes)
    r_a = assemble_global_residual(fe_a, fe_a.kernel_arrays, params, U,
                                   U_prev, 1.0, xi_prev_by_block=xi_prev)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(R_b),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kind", ["rate", "total"])
def test_param_jvp_and_vjp_equivalence(monkeypatch, kind):
    fe_a = _problem(active=True, kind=kind)
    fe_b = _problem(active=True, fastpath=False, monkeypatch=monkeypatch,
                    kind=kind)
    U = _plastic_U(fe_a)
    U_prev = jnp.zeros_like(U)
    st = FEState.from_problem(fe_a)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}
    params = params_by_block_from_models(fe_a)

    def scalar_through(fe):
        def f(p):
            R = assemble_global_residual(fe, fe.kernel_arrays, p, U,
                                         U_prev, 1.0,
                                         xi_prev_by_block=xi_prev)
            return jnp.sum(R ** 2)
        return f

    g_a = jax.grad(scalar_through(fe_a))(params)
    g_b = jax.grad(scalar_through(fe_b))(params)
    # the radial-return specialization is structurally rotation-free
    # (guard REQUIRES the rotation inactive at identity — return_map.py
    # j2_voce_kind), so the never-consumed rotation-matrix gradient is
    # excluded; every calibratable leaf must agree
    g_a["all"].pop("rotation matrix")
    g_b["all"].pop("rotation matrix")
    leaves_a, leaves_b = jax.tree.leaves(g_a), jax.tree.leaves(g_b)
    assert len(leaves_a) >= 6
    for a, b in zip(leaves_a, leaves_b, strict=True):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-20)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-8 * scale)

    # forward-mode through params (the FE-IFT direction), rotation
    # tangent zeroed for the same reason
    tangent = tree_map(jnp.ones_like, params)
    tangent["all"]["rotation matrix"] = jnp.zeros((3, 3))
    _, jvp_a = jax.jvp(scalar_through(fe_a), (params,), (tangent,))
    _, jvp_b = jax.jvp(scalar_through(fe_b), (params,), (tangent,))
    np.testing.assert_allclose(float(jvp_a), float(jvp_b), rtol=1e-8)


@pytest.mark.parametrize("kind", ["rate", "total"])
def test_newton_solve_equivalence(monkeypatch, kind):
    fe_a = _problem(kind=kind)
    fe_b = _problem(fastpath=False, monkeypatch=monkeypatch, kind=kind)
    params = params_by_block_from_models(fe_a)
    st = FEState.from_problem(fe_a)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    n = fe_a.dof_map.num_total_dofs
    U_prev = jnp.zeros(n)

    def solve(fe):
        U, xi = fe_newton_solve(fe, params, U_prev,
                                xi_prev_by_block=xi_prev, t=1.0)
        return U, xi

    U_a, xi_a = solve(fe_a)
    U_b, xi_b = solve(fe_b)
    assert float(np.asarray(xi_a["all"])[..., 6].max()) > 0.0, \
        "solve never went plastic — equivalence test is vacuous"
    assert float(jnp.max(jnp.abs(U_a))) > 1e-4
    np.testing.assert_allclose(np.asarray(U_a), np.asarray(U_b),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xi_a["all"]),
                               np.asarray(xi_b["all"]),
                               rtol=1e-8, atol=1e-12)


def test_master_switch_disables_pointbatch_too(monkeypatch):
    """CMAD_FE_BLOCK_FASTPATH=0 is the MASTER switch: with the J2 SoA
    path off, the point-batch B-matrix path must NOT slot in behind it
    (it has its own dial, CMAD_FE_POINTBATCH). Regression for the r3
    gap where disabling the fast path silently swapped in the other
    one, so 'disabled' assembly was never the generic nested-vmap
    baseline."""
    from cmad_tpu.fem.coupled_block import pointbatch_enabled
    from cmad_tpu.fem.j2_block import fe_block_fastpath_enabled

    monkeypatch.setenv("CMAD_FE_BLOCK_FASTPATH", "0")
    assert not fe_block_fastpath_enabled()
    assert not pointbatch_enabled()
    monkeypatch.delenv("CMAD_FE_BLOCK_FASTPATH")
    monkeypatch.setenv("CMAD_FE_POINTBATCH", "0")
    assert fe_block_fastpath_enabled()
    assert not pointbatch_enabled()
