"""The reduced 4-dof principal-space Hosford solve matches the generic
7-dof IFT-Newton kernel (states and tangents) on arbitrary — including
rotated and degenerate-trial — states, for both model families."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.ops.principal_return import (
    coaxial_recompose,
    make_principal_hosford_local_solve,
    principal_hosford_kind,
)
from cmad_tpu.parameters.parameters import Parameters


def _params(a=8.0, rotation=None):
    return Parameters({
        "rotation matrix": np.eye(3) if rotation is None else rotation,
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford_principal": {"a": a}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0,
                                                   "D": 20.0}}}}})


def _fields(grad_u):
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros(3, dtype=grad_u.dtype)},
        grad_fields={"u": grad_u})


def _batch(seed=0, B=32, scale=2.5e-3):
    rng = np.random.RandomState(seed)
    eps = rng.normal(0.0, scale, size=(B, 3, 3))
    # shrink a quarter of the batch into the elastic regime so both
    # residual branches are exercised (the frame-invariant phi also
    # sees shear, so full-scale random states all yield)
    eps[: B // 4] *= 0.05
    return jnp.asarray(eps)  # full (non-symmetric) displacement gradients


def test_coaxial_recompose_oracle():
    """sum c_i P_i vs an explicit eigh reconstruction, at distinct,
    pair-degenerate, and triple-degenerate spectra."""
    R = Rotation.random(1, random_state=11).as_matrix()[0]
    for eigs in ([3.0, 1.0, -2.0], [2.0, 2.0, -1.0], [4.0, 4.0, 4.0],
                 [5.0, -1.0, -1.0]):
        A = jnp.asarray(R @ np.diag(eigs) @ R.T)
        s = jnp.asarray(sorted(eigs, reverse=True))
        c = jnp.asarray([0.7, -0.3, 1.9])
        out = np.asarray(coaxial_recompose(A, s, c))
        # oracle via numpy eigh (ascending -> reverse to descending)
        w, V = np.linalg.eigh(np.asarray(A))
        w, V = w[::-1], V[:, ::-1]
        expect = np.zeros((3, 3))
        cs = np.asarray(c, dtype=float).copy()
        # at degeneracy the pair/triple projector split is arbitrary —
        # symmetrize the oracle coefficients the way the select does
        if abs(eigs[0] - eigs[1]) < 1e-12 and abs(eigs[1] - eigs[2]) < 1e-12:
            cs[:] = cs.mean()
        elif abs(sorted(eigs)[2] - sorted(eigs)[1]) < 1e-12:
            hi = 0.5 * (cs[0] + cs[1])
            cs[0] = cs[1] = hi
        elif abs(sorted(eigs)[1] - sorted(eigs)[0]) < 1e-12:
            lo = 0.5 * (cs[1] + cs[2])
            cs[1] = cs[2] = lo
        for i in range(3):
            expect += cs[i] * np.outer(V[:, i], V[:, i])
        np.testing.assert_allclose(out, expect, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("cls,a", [
    (SmallRateElasticPlastic, 8.0),
    (SmallElasticPlastic, 8.0),
    (SmallRateElasticPlastic, 100.0),
    (SmallElasticPlastic, 100.0),
])
def test_reduced_matches_generic(cls, a):
    params = _params(a)
    model = cls(params)
    assert principal_hosford_kind(model) in ("rate", "total")

    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_principal_hosford_local_solve(model, max_iters=40)

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
                               rtol=1e-8, atol=1e-10)

    # second step from a plastic state (nonzero xi_prev path)
    xi_g2 = jax.vmap(gen_point)(xi_g, 1.5 * grad_u, grad_u)
    xi_r2 = jax.vmap(red_point)(xi_r, 1.5 * grad_u, grad_u)
    np.testing.assert_allclose(np.asarray(xi_r2), np.asarray(xi_g2),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_reduced_matches_generic_with_rotation(cls):
    """Material rotations ride through the reduction (the diagonal
    Hosford reduction cannot do this)."""
    R = Rotation.random(1, random_state=13).as_matrix()[0]
    params = _params(8.0, rotation=R)
    model = cls(params)
    assert principal_hosford_kind(model) in ("rate", "total")

    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_principal_hosford_local_solve(model, max_iters=40)
    grad_u = _batch(seed=5, B=32)
    gu0 = jnp.zeros_like(grad_u)
    xi_prev = jnp.zeros((grad_u.shape[0], model.num_dofs))

    xi_g = jax.vmap(lambda xp, g, g0: generic(
        xp, xp, params.values, _fields(g), _fields(g0)))(
        xi_prev, grad_u, gu0)
    xi_r = jax.vmap(lambda xp, g, g0: reduced(
        xp, xp, params.values, _fields(g), _fields(g0)))(
        xi_prev, grad_u, gu0)
    assert (np.asarray(xi_g[:, 6]) > 0).any()
    np.testing.assert_allclose(np.asarray(xi_r), np.asarray(xi_g),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_degenerate_trial_states(cls):
    """Uniaxial-strain loading makes the trial spectrum a repeated
    pair. The reduced solution must still satisfy the full 7-dof
    residual (checked directly rather than against the generic solve,
    whose tensor-AD normal is only a subgradient at exact
    degeneracy)."""
    params = _params(8.0)
    model = cls(params)
    reduced = make_principal_hosford_local_solve(model, max_iters=40)

    for gu_np in (np.diag([4.0e-3, 0.0, 0.0]),        # pair below
                  np.diag([3.0e-3, 3.0e-3, 0.0]),     # pair above
                  np.diag([2.0e-3, 2.0e-3, 2.0e-3])):  # pure volumetric
        gu = jnp.asarray(gu_np)
        gu0 = jnp.zeros((3, 3))
        xi_prev = jnp.zeros(model.num_dofs)
        xi = reduced(xi_prev, xi_prev, params.values,
                     _fields(gu), _fields(gu0))
        assert np.all(np.isfinite(np.asarray(xi)))
        C = model.residual_fun(xi, xi_prev, params.values,
                               _fields(gu), _fields(gu0))
        assert float(jnp.linalg.norm(C)) < 1e-10
        # tangents stay finite through the degenerate eigenbasis
        J = jax.jacfwd(lambda g: reduced(
            xi_prev, xi_prev, params.values, _fields(g),
            _fields(gu0)))(gu)
        assert np.all(np.isfinite(np.asarray(J)))


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
def test_reduced_tangents_match_generic(cls):
    """IFT tangents d(xi)/d(grad_u) and d(xi)/dY agree between the
    reduced and generic solves at a plastic point."""
    params = _params(8.0)
    model = cls(params)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_principal_hosford_local_solve(model, max_iters=40)

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
                               rtol=1e-6, atol=1e-8)

    def gen_of_Y(Y):
        p = {**params.values, "plastic": {
            **params.values["plastic"], "flow stress": {
                **params.values["plastic"]["flow stress"],
                "initial yield": {"Y": Y}}}}
        return generic(xi_prev, xi_prev, p, _fields(gu), _fields(gu0))

    def red_of_Y(Y):
        p = {**params.values, "plastic": {
            **params.values["plastic"], "flow stress": {
                **params.values["plastic"]["flow stress"],
                "initial yield": {"Y": Y}}}}
        return reduced(xi_prev, xi_prev, p, _fields(gu), _fields(gu0))

    # plain jvp, not jacfwd: the scalar tangent needs no vmap, and the
    # BATCHED while_loop jacfwd builds here has segfaulted XLA:CPU's
    # compiler when run late in the full suite (compile-state
    # dependent; fine standalone). jvp compiles the unbatched loop.
    gY = jax.jvp(gen_of_Y, (200.0,), (1.0,))[1]
    rY = jax.jvp(red_of_Y, (200.0,), (1.0,))[1]
    np.testing.assert_allclose(np.asarray(rY), np.asarray(gY),
                               rtol=1e-6, atol=1e-12)


def test_kind_gates():
    from cmad_tpu.models.deformation_types import DefType

    assert principal_hosford_kind(
        SmallRateElasticPlastic(_params())) == "rate"
    assert principal_hosford_kind(
        SmallElasticPlastic(_params())) == "total"
    # rotations are allowed
    R = Rotation.random(1, random_state=17).as_matrix()[0]
    assert principal_hosford_kind(
        SmallRateElasticPlastic(_params(rotation=R))) == "rate"
    # the diagonal-hosford name keeps its own (diagonal) reduction
    v = _params().values
    v = {**v, "plastic": {**v["plastic"],
                          "effective stress": {"hosford": {"a": 8.0}}}}
    assert principal_hosford_kind(
        SmallRateElasticPlastic(Parameters(v))) is None
    # non-3D def types keep the generic path
    m = SmallRateElasticPlastic(_params(),
                                def_type=DefType.PLANE_STRESS)
    assert principal_hosford_kind(m) is None


def test_dispatched_from_batched_return_map_and_fe():
    """make_batched_return_map(specialize=True) and the FE COUPLED
    local-solve builder both pick the principal reduction."""
    from cmad_tpu.global_residuals.global_residual import GlobalResidual
    from cmad_tpu.ops.return_map import make_batched_return_map

    params = _params(8.0)
    model = SmallRateElasticPlastic(params)

    step = make_batched_return_map(model, specialize=True)
    grad_u = _batch(seed=9, B=8)
    gu0 = jnp.zeros_like(grad_u)
    xi_prev = jnp.zeros((8, model.num_dofs))
    xi, sigma = step(xi_prev, grad_u, gu0, params.values)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    xi_g = jax.vmap(lambda xp, g, g0: generic(
        xp, xp, params.values, _fields(g), _fields(g0)))(
        xi_prev, grad_u, gu0)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_g),
                               rtol=1e-8, atol=1e-10)

    solve = GlobalResidual._build_local_solve(model, {}, False)
    xi_fe = solve(xi_prev[0], xi_prev[0], params.values,
                  _fields(grad_u[0]), _fields(gu0[0]))
    np.testing.assert_allclose(np.asarray(xi_fe), np.asarray(xi_g[0]),
                               rtol=1e-8, atol=1e-10)


def test_exponent_tangent_matches_generic_and_fd():
    """d(xi)/da — calibrating the yield-surface SHAPE — flows correctly
    through the reduced solve (the exponent enters via the in-solve
    phi evaluations, not the trial state)."""
    params = _params(8.0)
    model = SmallRateElasticPlastic(params)
    generic = make_newton_solve(model.residual_fun, max_iters=40)
    reduced = make_principal_hosford_local_solve(model, max_iters=40)

    gu = jnp.asarray(np.diag([3.0e-3, -1.0e-3, -0.5e-3])
                     + 0.6e-3 * (np.ones((3, 3)) - np.eye(3)))
    gu0 = jnp.zeros((3, 3))
    xi_prev = jnp.zeros(model.num_dofs)

    def with_a(solve):
        def f(a):
            p = {**params.values, "plastic": {
                **params.values["plastic"],
                "effective stress": {"hosford_principal": {"a": a}}}}
            return solve(xi_prev, xi_prev, p, _fields(gu), _fields(gu0))
        return f

    gen_of_a = with_a(generic)
    red_of_a = with_a(reduced)
    assert float(gen_of_a(8.0)[6]) > 0.0  # plastic

    ga = jax.jvp(gen_of_a, (8.0,), (1.0,))[1]
    ra = jax.jvp(red_of_a, (8.0,), (1.0,))[1]
    np.testing.assert_allclose(np.asarray(ra), np.asarray(ga),
                               rtol=1e-6, atol=1e-12)

    h = 1e-4
    fd = (np.asarray(gen_of_a(8.0 + h)) - np.asarray(gen_of_a(8.0 - h))) \
        / (2 * h)
    np.testing.assert_allclose(np.asarray(ra), fd, rtol=5e-5, atol=1e-10)
