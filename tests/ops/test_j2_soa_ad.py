"""The closed-form implicit JVP of the SoA radial return vs plain AD.

``ops/j2_soa_ad.py`` replaces tracing-based differentiation of the
radial return with the analytic implicit linearization (custom_jvp) and
the classical consistent tangent. These tests pin both against jax AD
through the fixed-iteration XLA kernel (``soa_step_scalars``), which is
converged to machine precision in f64 — so the two derivative routes
must agree to roundoff, in every direction (xi_prev, de, material
scalars), in both AD modes, and at second order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.ops.j2_radial_return import j2_voce_scalars, soa_step_scalars
from cmad_tpu.ops.j2_soa_ad import consistent_tangent_rows, make_soa_step_ad

N = 64


def _batch(seed=0, scale=0.6e-3):
    """Mixed elastic/plastic batch: prior stress state + strain
    increment sized so roughly half the points yield (Y/E ~ 1e-3)."""
    rng = np.random.RandomState(seed)
    xi = np.zeros((8, N))
    # prior stresses inside the initial yield surface
    xi[:6] = rng.normal(0.0, 30.0, size=(6, N))
    xi[6] = np.abs(rng.normal(0.0, 0.005, size=N))
    de = np.zeros((8, N))
    de[:6] = rng.normal(0.0, scale, size=(6, N))
    return jnp.asarray(xi), jnp.asarray(de)


def _scalars():
    params = {
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {"effective stress": {"J2": 0.0},
                    "flow stress": {"initial yield": {"Y": 200.0},
                                    "hardening": {"voce": {"S": 200.0,
                                                           "D": 20.0}}}}}
    return j2_voce_scalars(params, jnp.float64)


def _assert_mixed_regime(xi, de, scalars):
    out = soa_step_scalars(xi, de, scalars)
    frac = float(np.mean(np.asarray(out[6]) > np.asarray(xi[6])))
    assert 0.1 < frac < 0.95, f"regime not mixed (plastic frac {frac})"


@pytest.fixture
def data():
    xi, de = _batch()
    scalars = _scalars()
    _assert_mixed_regime(xi, de, scalars)
    return xi, de, scalars


def test_forward_matches_plain_kernel(data):
    xi, de, scalars = data
    step = make_soa_step_ad(use_pallas=False)
    np.testing.assert_allclose(np.asarray(step(xi, de, scalars)),
                               np.asarray(soa_step_scalars(xi, de,
                                                           scalars)),
                               rtol=0, atol=0)


@pytest.mark.parametrize("argnum", [0, 1, 2])
def test_jvp_matches_ad_through_iterations(data, argnum):
    xi, de, scalars = data
    step = make_soa_step_ad(use_pallas=False)
    rng = np.random.RandomState(7)
    tangents = [jnp.zeros_like(xi), jnp.zeros_like(de),
                jnp.zeros_like(scalars)]
    tangents[argnum] = jnp.asarray(
        rng.normal(size=np.asarray([xi, de, [scalars] * 8][argnum]
                                   if argnum < 2 else scalars).shape)
        if argnum == 2 else rng.normal(size=xi.shape))

    primals = (xi, de, scalars)
    out_a, dot_a = jax.jvp(step, primals, tuple(tangents))
    out_b, dot_b = jax.jvp(lambda *p: soa_step_scalars(*p), primals,
                           tuple(tangents))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-13, atol=1e-13)
    scale = max(float(jnp.max(jnp.abs(dot_b))), 1e-30)
    np.testing.assert_allclose(np.asarray(dot_a), np.asarray(dot_b),
                               atol=1e-9 * scale)


def test_vjp_matches_ad_through_iterations(data):
    xi, de, scalars = data
    step = make_soa_step_ad(use_pallas=False)
    rng = np.random.RandomState(11)
    ct = jnp.asarray(rng.normal(size=(8, N)))

    def run(f):
        _, vjp = jax.vjp(f, xi, de, scalars)
        return vjp(ct)

    ga = run(step)
    gb = run(lambda *p: soa_step_scalars(*p))
    for a, b in zip(ga, gb, strict=True):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9 * scale)


def test_second_order_matches(data):
    """Forward-over-forward through the implicit rule vs plain AD: the
    FE Hessian path (hessians re-enter the custom_jvp rule)."""
    xi, de, scalars = data
    step = make_soa_step_ad(use_pallas=False)

    def scalar_of(f):
        def g(s):
            return jnp.sum(f(xi, de, s) ** 2)
        return g

    h_a = jax.jacfwd(jax.jacfwd(scalar_of(step)))(scalars)
    h_b = jax.jacfwd(jax.jacfwd(scalar_of(
        lambda *p: soa_step_scalars(*p))))(scalars)
    scale = max(float(jnp.max(jnp.abs(h_b))), 1e-30)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                               atol=1e-7 * scale)


def test_consistent_tangent_is_dsigma_dde(data):
    """D_alg (from kernel OUTPUT rows alone) == jacobian of the stress
    rows w.r.t. the strain increment, point by point."""
    xi, de, scalars = data
    out = soa_step_scalars(xi, de, scalars)
    A, c, d_rows = consistent_tangent_rows(out, xi[6], scalars)
    mu, lam = scalars[0], scalars[1]
    kappa = lam + 2.0 * mu / 3.0

    # sym-vec row -> (i, j) tensor index map (internal order)
    idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    eye = np.eye(3)

    # AD truth at a handful of points (dense 6x6 per point is slow)
    for p in [0, 3, 9, 17, 31]:
        xi_p, de_p = xi[:, p:p + 1], de[:, p:p + 1]

        def stress_rows(de6, xi_p=xi_p, de_p=de_p):
            # de6: the 6 independent sym components at this point
            de_full = de_p.at[:6, 0].set(de6)
            return soa_step_scalars(xi_p, de_full, scalars)[:6, 0]

        J = np.asarray(jax.jacfwd(stress_rows)(de[:6, p]))  # (6, 6)

        # analytic D_alg contracted to the same sym-vec basis:
        # row r = (i,j); column s = (k,l) perturbing de6[s] by 1 changes
        # the TENSOR strain by E_kl = e_k e_l^T sym (off-diag entries of
        # de6 are the tensor components themselves, so the perturbation
        # is symmetric with both off-diag entries set)
        Ap = float(A[p])
        cp = float(c[p])
        dmat = np.zeros((3, 3))
        for r, (i, j) in enumerate(idx):
            dmat[i, j] = dmat[j, i] = float(d_rows[r][p])
        D = np.zeros((6, 6))
        for r, (i, j) in enumerate(idx):
            for s, (k, l) in enumerate(idx):  # noqa: E741
                E_kl = np.zeros((3, 3))
                E_kl[k, l] = E_kl[l, k] = 1.0
                trE = np.trace(E_kl)
                devE = E_kl - trE / 3.0 * eye
                dsig = (float(kappa) * trE * eye + Ap * devE
                        - cp * np.sum(dmat * E_kl) * dmat)
                D[r, s] = dsig[i, j]
        scale = max(np.abs(J).max(), 1e-30)
        np.testing.assert_allclose(D, J, atol=1e-9 * scale)
