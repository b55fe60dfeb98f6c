"""The reduced 4-dof Hosford local solve matches the generic 7-dof
IFT-Newton kernel (states and tangents), for both model families."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.ops.hosford_return import (
    hosford_kind,
    make_hosford_local_solve,
)
from cmad_tpu.parameters.parameters import Parameters


def _params(a=8.0):
    return Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford": {"a": a}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0,
                                                   "D": 20.0}}}}})


def _fields(grad_u):
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros(3, dtype=grad_u.dtype)},
        grad_fields={"u": grad_u})


def _batch(seed=0, B=64, scale=2.5e-3):
    rng = np.random.RandomState(seed)
    eps = rng.normal(0.0, scale, size=(B, 3, 3))
    return jnp.asarray(0.5 * (eps + np.transpose(eps, (0, 2, 1))))


@pytest.mark.parametrize("cls,a", [
    (SmallRateElasticPlastic, 8.0),
    (SmallElasticPlastic, 8.0),
    (SmallRateElasticPlastic, 100.0),
    (SmallElasticPlastic, 100.0),
])
def test_reduced_matches_generic(cls, a):
    params = _params(a)
    model = cls(params)
    assert hosford_kind(model) in ("rate", "total")

    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_hosford_local_solve(model, max_iters=40)

    def gen_point(xi_prev, gu, gu0):
        return generic(xi_prev, xi_prev, params.values,
                       _fields(gu), _fields(gu0))

    def red_point(xi_prev, gu, gu0):
        return reduced(xi_prev, xi_prev, params.values,
                       _fields(gu), _fields(gu0))

    grad_u = _batch()
    gu0 = jnp.zeros_like(grad_u)
    xi_prev = jnp.zeros((grad_u.shape[0], model.num_dofs))

    xi_g = jax.vmap(gen_point)(xi_prev, grad_u, gu0)
    xi_r = jax.vmap(red_point)(xi_prev, grad_u, gu0)

    # the batch must exercise both branches
    plastic = np.asarray(xi_g[:, 6]) > 0
    assert plastic.any() and (~plastic).any()
    np.testing.assert_allclose(np.asarray(xi_r), np.asarray(xi_g),
                               rtol=1e-9, atol=1e-11)

    # second step from a plastic state (nonzero xi_prev path)
    xi_g2 = jax.vmap(gen_point)(xi_g, 1.5 * grad_u, grad_u)
    xi_r2 = jax.vmap(red_point)(xi_r, 1.5 * grad_u, grad_u)
    np.testing.assert_allclose(np.asarray(xi_r2), np.asarray(xi_g2),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_reduced_tangents_match_generic(cls):
    """IFT tangents d(xi)/d(grad_u) agree between the reduced and
    generic solves at a plastic point."""
    params = _params(8.0)
    model = cls(params)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_hosford_local_solve(model, max_iters=40)

    gu = jnp.asarray(np.diag([3.0e-3, -1.0e-3, -0.5e-3])
                     + 0.4e-3 * (np.ones((3, 3)) - np.eye(3)))
    gu0 = jnp.zeros((3, 3))
    xi_prev = jnp.zeros(model.num_dofs)

    def gen_of_gu(g):
        return generic(xi_prev, xi_prev, params.values,
                       _fields(g), _fields(gu0))

    def red_of_gu(g):
        return reduced(xi_prev, xi_prev, params.values,
                       _fields(g), _fields(gu0))

    assert float(gen_of_gu(gu)[6]) > 0.0  # plastic
    J_g = jax.jacfwd(gen_of_gu)(gu)
    J_r = jax.jacfwd(red_of_gu)(gu)
    np.testing.assert_allclose(np.asarray(J_r), np.asarray(J_g),
                               rtol=1e-6, atol=1e-9)

    # parameter tangent (calibration path)
    def gen_of_Y(Y):
        p = jax.tree.map(lambda x: x, params.values)
        p = {**p, "plastic": {**p["plastic"], "flow stress": {
            **p["plastic"]["flow stress"], "initial yield": {"Y": Y}}}}
        return generic(xi_prev, xi_prev, p, _fields(gu), _fields(gu0))

    def red_of_Y(Y):
        p = {**params.values, "plastic": {
            **params.values["plastic"], "flow stress": {
                **params.values["plastic"]["flow stress"],
                "initial yield": {"Y": Y}}}}
        return reduced(xi_prev, xi_prev, p, _fields(gu), _fields(gu0))

    gY = jax.jacfwd(gen_of_Y)(200.0)
    rY = jax.jacfwd(red_of_Y)(200.0)
    np.testing.assert_allclose(np.asarray(rY), np.asarray(gY),
                               rtol=1e-6, atol=1e-12)


def test_kind_gates():
    from cmad_tpu.models.deformation_types import DefType

    assert hosford_kind(SmallRateElasticPlastic(_params())) == "rate"
    assert hosford_kind(SmallElasticPlastic(_params())) == "total"
    # non-identity rotation disables the reduction
    v = _params().values
    v = {**v, "rotation matrix": np.array(
        [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])}
    assert hosford_kind(SmallRateElasticPlastic(Parameters(v))) is None
    # non-3D def types keep the generic path
    m = SmallRateElasticPlastic(_params(),
                                def_type=DefType.PLANE_STRESS)
    assert hosford_kind(m) is None


def test_reduced_handles_combined_hardening():
    """voce + linear hardening blocks both enter H(alpha) generically."""
    params = Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford": {"a": 8.0}},
            "flow stress": {
                "initial yield": {"Y": 200.0},
                "hardening": {"voce": {"S": 200.0, "D": 20.0},
                              "linear": {"K": 500.0}}}}})
    model = SmallRateElasticPlastic(params)
    assert hosford_kind(model) == "rate"
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_hosford_local_solve(model, max_iters=40)
    grad_u = _batch(seed=3, B=16)
    gu0 = jnp.zeros_like(grad_u)
    xi_prev = jnp.zeros((grad_u.shape[0], model.num_dofs))

    xi_g = jax.vmap(lambda xp, g, g0: generic(
        xp, xp, params.values, _fields(g), _fields(g0)))(
        xi_prev, grad_u, gu0)
    xi_r = jax.vmap(lambda xp, g, g0: reduced(
        xp, xp, params.values, _fields(g), _fields(g0)))(
        xi_prev, grad_u, gu0)
    assert float(np.max(np.asarray(xi_g[:, 6]))) > 0.0
    np.testing.assert_allclose(np.asarray(xi_r), np.asarray(xi_g),
                               rtol=1e-9, atol=1e-11)
