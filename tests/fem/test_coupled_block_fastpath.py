"""FE COUPLED point-batch fast path (fem/coupled_block.py) == generic.

The B-matrix block kernels must be a pure implementation detail:
residual, tangent, converged state, parameter derivatives, and full
Newton solves must match the generic nested-vmap element path (which
this suite re-enables via ``CMAD_FE_POINTBATCH=0``) to solver
tolerance, across the yield families the path serves (diagonal
Hosford, frame-invariant principal Hosford, Hill) on hex and tet
meshes, rate and total model families, with body forces.
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
from cmad_tpu.fem.coupled_block import pointbatch_applicable
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import P1_TET, Q1_HEX
from cmad_tpu.fem.fe_problem import FEState, build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.fem.nonlinear_solver import fe_newton_solve
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.parameters.parameters import Parameters

_YIELDS = {
    "hosford": {"hosford": {"a": 100.0}},
    "principal": {"hosford_principal": {"a": 8.0}},
    "hill": {"hill": {"F": 0.45, "G": 0.55, "H": 0.5,
                      "L": 1.4, "M": 1.7, "N": 1.55}},
}


def _model(yield_name, active=False, kind="rate"):
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": dict(_YIELDS[yield_name]),
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


def _problem(yield_name, tet=False, forcing=None, fastpath=True,
             monkeypatch=None, active=False, kind="rate"):
    if not fastpath:
        monkeypatch.setenv("CMAD_FE_POINTBATCH", "0")
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
        return build_fe_problem(
            mesh, dof_map, SmallDispEquilibrium(ndims=3),
            {"all": _model(yield_name, active, kind)},
            modes_by_block={"all": GlobalResidualMode.COUPLED},
            forcing_fns_by_block_idx=forcing)
    finally:
        if not fastpath:
            monkeypatch.delenv("CMAD_FE_POINTBATCH")


def _plastic_U(fe, scale=5e-3):
    """Ramp-dominated displacement (mild noise): drives most points
    plastic without the pathological random strains that leave the
    a=100 local Newton unconverged (where iterate paths, and thus
    unconverged states, are rounding-sensitive)."""
    n = fe.dof_map.num_total_dofs
    rng = np.random.RandomState(3)
    U = scale * np.asarray(fe.mesh.nodes[:, 0])
    full = np.zeros(n)
    full[0::3] = U
    full += 1e-4 * rng.normal(size=n)
    return jnp.asarray(full)


def test_fastpath_attached_only_when_applicable(monkeypatch):
    fe = _problem("hosford")
    assert "block_R_and_K_and_xi" in fe.evaluators_by_block["all"]
    assert "block_R" in fe.evaluators_by_block["all"]
    fe_off = _problem("hosford", fastpath=False, monkeypatch=monkeypatch)
    assert "block_R_and_K_and_xi" not in fe_off.evaluators_by_block["all"]

    gr = fe.gr
    m = _model("hosford")
    assert not pointbatch_applicable(
        gr, m, GlobalResidualMode.CLOSED_FORM, False)
    assert not pointbatch_applicable(
        gr, m, GlobalResidualMode.COUPLED, True)
    # mixed u-p (2-residual) blocks stay on the generic path
    gr_mixed = SmallDispEquilibrium(ndims=3, mixed=True)
    assert not pointbatch_applicable(
        gr_mixed, m, GlobalResidualMode.COUPLED, False)


def test_j2_keeps_its_dedicated_block_path():
    """A J2+Voce block must dispatch to fem/j2_block.py (closed-form
    tangent), not the point-batch path."""
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}}
    model = SmallRateElasticPlastic(Parameters(values))
    gr = SmallDispEquilibrium(ndims=3)
    evaluators = gr.for_model(model, GlobalResidualMode.COUPLED)
    assert "block_R_and_K_and_xi" in evaluators
    from cmad_tpu.fem.j2_block import j2_block_applicable
    assert j2_block_applicable(gr, model, GlobalResidualMode.COUPLED,
                               False)


@pytest.mark.parametrize("yield_name", ["hosford", "principal", "hill"])
@pytest.mark.parametrize("tet", [False, True])
def test_assembly_equivalence(monkeypatch, yield_name, tet):
    forcing = {0: lambda x, t: jnp.asarray([0.0, 0.0, -1.0e2 * t])}
    fe_a = _problem(yield_name, tet=tet, forcing=forcing)
    fe_b = _problem(yield_name, tet=tet, forcing=forcing, fastpath=False,
                    monkeypatch=monkeypatch)
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
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(xi_a["all"]),
                               np.asarray(xi_b["all"]),
                               rtol=1e-9, atol=1e-11)
    Kd_a, Kd_b = np.asarray(K_a.todense()), np.asarray(K_b.todense())
    scale = np.abs(Kd_b).max()
    np.testing.assert_allclose(Kd_a, Kd_b, atol=1e-8 * scale)

    # residual-only entry point (line-search probes)
    r_a = assemble_global_residual(fe_a, fe_a.kernel_arrays, params, U,
                                   U_prev, 1.0, xi_prev_by_block=xi_prev)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(R_b),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("kind", ["rate", "total"])
def test_total_and_rate_families(monkeypatch, kind):
    """Both model families drive the path (total form uses eps, not the
    increment)."""
    fe_a = _problem("hosford", kind=kind)
    fe_b = _problem("hosford", kind=kind, fastpath=False,
                    monkeypatch=monkeypatch)
    params = params_by_block_from_models(fe_a)
    U = _plastic_U(fe_a)
    U_prev = jnp.zeros_like(U)
    st = FEState.from_problem(fe_a)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}
    _, R_a, xi_a = assemble_global(fe_a, fe_a.kernel_arrays, params, U,
                                   U_prev, 1.0, xi_prev_by_block=xi_prev)
    _, R_b, xi_b = assemble_global(fe_b, fe_b.kernel_arrays, params, U,
                                   U_prev, 1.0, xi_prev_by_block=xi_prev)
    assert float(np.asarray(xi_a["all"])[..., 6].max()) > 0.0
    np.testing.assert_allclose(np.asarray(R_a), np.asarray(R_b),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(xi_a["all"]),
                               np.asarray(xi_b["all"]),
                               rtol=1e-9, atol=1e-11)


def test_param_grad_and_jvp_equivalence(monkeypatch):
    fe_a = _problem("hosford", active=True)
    fe_b = _problem("hosford", active=True, fastpath=False,
                    monkeypatch=monkeypatch)
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
    # the reduced Hosford solve requires the rotation inactive at
    # identity (ops/hosford_return.py hosford_kind), so the
    # never-consumed rotation gradient is excluded on both sides
    g_a["all"].pop("rotation matrix")
    g_b["all"].pop("rotation matrix")
    leaves_a, leaves_b = jax.tree.leaves(g_a), jax.tree.leaves(g_b)
    assert len(leaves_a) >= 6
    for a, b in zip(leaves_a, leaves_b, strict=True):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-20)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7 * scale)

    tangent = tree_map(jnp.ones_like, params)
    tangent["all"]["rotation matrix"] = jnp.zeros((3, 3))
    _, jvp_a = jax.jvp(scalar_through(fe_a), (params,), (tangent,))
    _, jvp_b = jax.jvp(scalar_through(fe_b), (params,), (tangent,))
    np.testing.assert_allclose(float(jvp_a), float(jvp_b), rtol=1e-7)


@pytest.mark.parametrize("yield_name", ["hosford", "principal"])
def test_newton_solve_equivalence(monkeypatch, yield_name):
    fe_a = _problem(yield_name)
    fe_b = _problem(yield_name, fastpath=False, monkeypatch=monkeypatch)
    params = params_by_block_from_models(fe_a)
    st = FEState.from_problem(fe_a)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}

    n = fe_a.dof_map.num_total_dofs
    U_prev = jnp.zeros(n)

    U_a, xi_a = fe_newton_solve(fe_a, params, U_prev,
                                xi_prev_by_block=xi_prev, t=1.0)
    U_b, xi_b = fe_newton_solve(fe_b, params, U_prev,
                                xi_prev_by_block=xi_prev, t=1.0)
    assert float(np.asarray(xi_a["all"])[..., 6].max()) > 0.0, \
        "solve never went plastic — equivalence test is vacuous"
    assert float(jnp.max(jnp.abs(U_a))) > 1e-4
    np.testing.assert_allclose(np.asarray(U_a), np.asarray(U_b),
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(np.asarray(xi_a["all"]),
                               np.asarray(xi_b["all"]),
                               rtol=1e-7, atol=1e-11)
