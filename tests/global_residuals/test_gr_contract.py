"""GlobalResidual contract tests.

Mirrors the reference's ``tests/global_residuals`` intent
(``cmad/global_residuals``: ABC contract, interpolation shapes,
``for_model`` CLOSED_FORM vs COUPLED equivalence, small-disp output
catalog, near-null-space plumbing).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.assembly import assemble_global, params_by_block_from_models
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX, ShapeFunctionsAtIP
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.interpolation import (
    interpolate_global_fields_at_ip,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
    rigid_body_modes,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.models.var_types import VarType
from cmad_tpu.parameters.parameters import Parameters

from tests.support.problems import params_J2_voce


def _elastic_model():
    return Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))


def _plastic_model():
    J2_params, _, _ = params_J2_voce(
        np.array([200e3, 0.3, 200.0, 200.0, 20.0]), scale_params=False)
    return SmallRateElasticPlastic(J2_params)


def _random_shapes(rng, n_basis, ndims=3):
    N = rng.uniform(0.1, 0.9, size=n_basis)
    N = N / N.sum()  # partition of unity, like a real basis
    grad_N = rng.normal(size=(n_basis, ndims))
    grad_N -= grad_N.mean(axis=0)  # gradients of a PoU basis sum to zero
    return ShapeFunctionsAtIP(jnp.asarray(N), jnp.asarray(grad_N))


# ----------------------------------------------------------------------
# interpolation
# ----------------------------------------------------------------------
def test_interpolation_values_and_shapes():
    rng = np.random.RandomState(3)
    shapes = _random_shapes(rng, 8)
    U = jnp.asarray(rng.normal(size=(8, 3)))
    out = interpolate_global_fields_at_ip([U], [shapes], ["u"])
    assert out.fields["u"].shape == (3,)
    assert out.grad_fields["u"].shape == (3, 3)
    np.testing.assert_allclose(out.fields["u"], shapes.N @ U, rtol=1e-14)
    np.testing.assert_allclose(out.grad_fields["u"], U.T @ shapes.grad_N,
                               rtol=1e-14)


def test_interpolation_mixed_bases():
    rng = np.random.RandomState(4)
    s_u, s_p = _random_shapes(rng, 8), _random_shapes(rng, 8)
    U_u = jnp.asarray(rng.normal(size=(8, 3)))
    U_p = jnp.asarray(rng.normal(size=(8, 1)))
    out = interpolate_global_fields_at_ip([U_u, U_p], [s_u, s_p],
                                          ["u", "p"])
    assert set(out.fields) == {"u", "p"}
    assert out.fields["p"].shape == (1,)
    assert out.grad_fields["p"].shape == (1, 3)


def test_interpolation_requires_var_names():
    rng = np.random.RandomState(5)
    shapes = _random_shapes(rng, 8)
    U = jnp.zeros((8, 3))
    with pytest.raises(ValueError, match="var_names"):
        interpolate_global_fields_at_ip([U], [shapes], [None])


# ----------------------------------------------------------------------
# output catalog / residual metadata
# ----------------------------------------------------------------------
def test_small_disp_output_catalog():
    gr = SmallDispEquilibrium(ndims=3)
    assert gr.num_residuals == 1
    assert gr.primary_output_fields() == [("u", VarType.VECTOR)]
    assert gr.resid_name(0) == "equilibrium"
    assert gr.ndims == 3

    mixed = SmallDispEquilibrium(ndims=3, mixed=True)
    assert mixed.num_residuals == 2
    assert mixed.primary_output_fields() == [("u", VarType.VECTOR),
                                             ("p", VarType.SCALAR)]
    assert mixed.var_type(1) == VarType.SCALAR


def test_unknown_nodal_field_raises():
    gr = SmallDispEquilibrium(ndims=3)
    with pytest.raises(ValueError, match="nodal field"):
        gr.evaluate_nodal_field("vorticity", None, None, 0)


# ----------------------------------------------------------------------
# near-null space: rigid-body modes really annihilate the elastic K
# ----------------------------------------------------------------------
def test_rigid_body_modes_shape_and_translations():
    coords = np.random.RandomState(0).normal(size=(5, 3))
    modes = rigid_body_modes(coords)
    assert modes.shape == (15, 6)
    for k in range(3):
        tr = modes[:, k].reshape(5, 3)
        np.testing.assert_array_equal(tr[:, k], np.ones(5))
        assert np.count_nonzero(tr) == 5


def test_near_null_space_annihilates_unconstrained_stiffness():
    """K @ (rigid mode) == 0 for the assembled elastic stiffness with no
    Dirichlet rows eliminated — the property AMG/deflation rely on."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    gr = SmallDispEquilibrium(ndims=3)
    from cmad_tpu.fem.fe_problem import build_fe_problem
    fe = build_fe_problem(mesh, dof_map, gr, {"all": _elastic_model()})

    modes = fe.near_null_space
    assert modes.shape == (dof_map.num_total_dofs, 6)

    params = params_by_block_from_models(fe)
    U0 = jnp.zeros(dof_map.num_total_dofs)
    K, _, _ = assemble_global(fe, fe.kernel_arrays, params, U0, U0, 1.0)
    K_dense = np.asarray(K.todense())
    resid = K_dense @ modes
    scale = np.abs(K_dense).max()
    assert np.abs(resid).max() < 1e-10 * scale


def test_mixed_near_null_space_has_constant_pressure_mode():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    gr = SmallDispEquilibrium(ndims=3, mixed=True)
    modes = gr.near_null_space(mesh)
    n_nodes = mesh.nodes.shape[0]
    assert modes.shape == (4 * n_nodes, 7)
    np.testing.assert_array_equal(modes[3 * n_nodes:, 6], 1.0)
    assert np.abs(modes[3 * n_nodes:, :6]).max() == 0.0


# ----------------------------------------------------------------------
# for_model binding: errors and CLOSED_FORM == COUPLED at one IP
# ----------------------------------------------------------------------
def test_closed_form_rejects_local_newton_settings():
    gr = SmallDispEquilibrium(ndims=3)
    with pytest.raises(ValueError, match="local_newton_settings"):
        gr.for_model(_elastic_model(), GlobalResidualMode.CLOSED_FORM,
                     local_newton_settings={"abs_tol": 1e-10})


def test_closed_form_requires_capable_model():
    gr = SmallDispEquilibrium(ndims=3)
    assert not SmallRateElasticPlastic.supports_closed_form_cauchy
    with pytest.raises(ValueError, match="closed_form"):
        gr.for_model(_plastic_model(), GlobalResidualMode.CLOSED_FORM)


def test_mixed_requires_supports_mixed():
    gr = SmallDispEquilibrium(ndims=3, mixed=True)

    class NoMixedElastic(Elastic):
        supports_mixed = False

    model = NoMixedElastic(Parameters({"elastic": {"E": 1.0, "nu": 0.3}}))
    with pytest.raises(ValueError, match="supports_mixed"):
        gr.for_model(model, GlobalResidualMode.COUPLED)


def test_from_deck_validation():
    with pytest.raises(ValueError, match="def_type"):
        SmallDispEquilibrium.from_deck({}, ndims=3)
    with pytest.raises(ValueError, match="ndims"):
        SmallDispEquilibrium.from_deck({"def_type": "full_3d"}, ndims=2)
    gr = SmallDispEquilibrium.from_deck(
        {"def_type": "full_3d", "mixed": True,
         "stabilization multiplier": 2.0}, ndims=3)
    assert gr.mixed and gr._stab == 2.0


def test_closed_form_equals_coupled_at_single_ip():
    """The two mode bindings agree (R and dR/dU) for an elastic model —
    COUPLED's per-IP local Newton converges to the closed-form stress."""
    rng = np.random.RandomState(7)
    model = _elastic_model()
    gr = SmallDispEquilibrium(ndims=3)
    shapes = [_random_shapes(rng, 8)]
    U = [jnp.asarray(1e-3 * rng.normal(size=(8, 3)))]
    U_prev = [jnp.zeros((8, 3))]
    w, dv, h = 0.4, 0.02, 0.1
    params = model.parameters.values
    xi_prev = model.init_xi()

    closed = gr.for_model(model, GlobalResidualMode.CLOSED_FORM)
    coupled = gr.for_model(model, GlobalResidualMode.COUPLED)

    R_c = closed["R"](params, U, U_prev, shapes, w, dv, h, 0)
    R_u = coupled["R"](params, U, U_prev, xi_prev, shapes, w, dv, h, 0)
    for a, b in zip(R_c, R_u, strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-14)

    Rt_c, K_c = closed["R_and_dR_dU"](params, U, U_prev, shapes, w, dv,
                                      h, 0)
    Rt_u, K_u, xi = coupled["R_and_dR_dU_and_xi"](params, U, U_prev,
                                                  xi_prev, shapes, w, dv,
                                                  h, 0)
    for a, b in zip(Rt_c, Rt_u, strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-14)
    for row_c, row_u in zip(K_c, K_u, strict=True):
        for a, b in zip(row_c, row_u, strict=True):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-12)
    assert xi.shape == (model.num_dofs,)
