"""Analytic J2 radial-return kernel (specialized fast path).

The generic return map (ops/return_map.py) runs a full per-point Newton
on the 7-dof coupled residual — correct for ANY yield surface. For J2
with isotropic hardening the corrector collapses to the classic radial
return: one scalar equation in the plastic multiplier,

    g(dg) = phi_trial - 3 mu dg - Y - H(alpha_prev + dg) = 0,

solved here by a fixed-iteration scalar Newton (quadratic convergence;
branch-free, fully vectorized). This is the speed-of-light version of
the hot loop: pure elementwise VPU work, no 7x7 linear solves, no
jacfwd. Everything is differentiable (fixed iteration count), so it can
serve calibration objectives too.

Verified against the generic IFT-Newton kernel in
tests/ops/test_j2_radial_return.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.typing import JaxArray

_SCALAR_NEWTON_ITERS = 8


def _sym(t):
    return 0.5 * (t + jnp.swapaxes(t, -1, -2))


def make_j2_radial_return(parameters, newton_iters: int =
                          _SCALAR_NEWTON_ITERS):
    """Build ``step(xi_prev, grad_u, grad_u_prev, params) -> (xi, sigma)``
    batched over the leading axis, with the cmad_tpu J2+Voce flat state
    layout xi = [cauchy6 (internal order), alpha].

    ``params`` must carry ``elastic`` (any two constants), ``plastic``
    with a Voce hardening block, and an identity rotation (the radial
    return is frame-agnostic for isotropic J2).
    """
    del parameters  # layout is fixed by the J2+Voce model

    def step(xi_prev: JaxArray, grad_u: JaxArray, grad_u_prev: JaxArray,
             params) -> tuple[JaxArray, JaxArray]:
        ec = ElasticConstants.from_params(params["elastic"])
        mu, lam = ec.mu, ec.lmbda
        plastic = params["plastic"]
        Y = plastic["flow stress"]["initial yield"]["Y"]
        voce = plastic["flow stress"]["hardening"]["voce"]
        S, D = voce["S"], voce["D"]

        dtype = grad_u.dtype
        I = jnp.eye(3, dtype=dtype)

        deps = _sym(grad_u) - _sym(grad_u_prev)
        tr = jnp.trace(deps, axis1=-2, axis2=-1)[..., None, None]
        dsig = lam * tr * I + 2.0 * mu * deps

        # unpack the internal sym-vec order [xx, xy, xz, yy, yz, zz]
        sv = xi_prev[..., :6]
        sigma_prev = jnp.stack([
            jnp.stack([sv[..., 0], sv[..., 1], sv[..., 2]], axis=-1),
            jnp.stack([sv[..., 1], sv[..., 3], sv[..., 4]], axis=-1),
            jnp.stack([sv[..., 2], sv[..., 4], sv[..., 5]], axis=-1),
        ], axis=-2)
        alpha_prev = xi_prev[..., 6]

        sigma_tr = sigma_prev + dsig
        p_tr = jnp.trace(sigma_tr, axis1=-2, axis2=-1)[..., None, None] / 3.0
        s_tr = sigma_tr - p_tr * I
        phi_tr = jnp.sqrt(1.5 * jnp.sum(s_tr * s_tr, axis=(-2, -1)))

        def hardening(a):
            return S * (1.0 - jnp.exp(-D * a))

        f_trial = phi_tr - Y - hardening(alpha_prev)
        plastic_mask = f_trial > 0.0

        # scalar Newton on dg (masked lanes hold 0)
        def body(_, dg):
            g = phi_tr - 3.0 * mu * dg - Y - hardening(alpha_prev + dg)
            dgd = -3.0 * mu - S * D * jnp.exp(-D * (alpha_prev + dg))
            dg_new = dg - g / dgd
            return jnp.where(plastic_mask, jnp.maximum(dg_new, 0.0), 0.0)

        dg = jax.lax.fori_loop(0, newton_iters, body,
                               jnp.zeros_like(alpha_prev))

        safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
        scale = jnp.where(plastic_mask,
                          3.0 * mu * dg / safe_phi, 0.0)
        sigma = sigma_tr - scale[..., None, None] * s_tr
        alpha = alpha_prev + dg

        xi = jnp.concatenate([
            jnp.stack([sigma[..., 0, 0], sigma[..., 0, 1],
                       sigma[..., 0, 2], sigma[..., 1, 1],
                       sigma[..., 1, 2], sigma[..., 2, 2]], axis=-1),
            alpha[..., None]], axis=-1)
        return xi, sigma

    return jax.jit(step)


def make_j2_radial_return_total(parameters, newton_iters: int =
                                _SCALAR_NEWTON_ITERS):
    """Radial return for the TOTAL-form small-strain J2+Voce model
    (models/small_elastic_plastic.py): xi = [plastic_strain6, alpha].

    Same scalar corrector as :func:`make_j2_radial_return`; the state
    update is the plastic strain, ``dp = dg * (3/2) s_tr / phi_tr``.
    The total form is history-parametrized by the CURRENT strain only,
    so ``grad_u_prev`` is accepted for interface parity but unused.
    """
    del parameters

    def step(xi_prev: JaxArray, grad_u: JaxArray, grad_u_prev: JaxArray,
             params) -> tuple[JaxArray, JaxArray]:
        del grad_u_prev
        ec = ElasticConstants.from_params(params["elastic"])
        mu, lam = ec.mu, ec.lmbda
        plastic = params["plastic"]
        Y = plastic["flow stress"]["initial yield"]["Y"]
        voce = plastic["flow stress"]["hardening"]["voce"]
        S, D = voce["S"], voce["D"]

        dtype = grad_u.dtype
        I = jnp.eye(3, dtype=dtype)
        eps = _sym(grad_u)

        pv = xi_prev[..., :6]
        pstrain_prev = jnp.stack([
            jnp.stack([pv[..., 0], pv[..., 1], pv[..., 2]], axis=-1),
            jnp.stack([pv[..., 1], pv[..., 3], pv[..., 4]], axis=-1),
            jnp.stack([pv[..., 2], pv[..., 4], pv[..., 5]], axis=-1),
        ], axis=-2)
        alpha_prev = xi_prev[..., 6]

        eps_e_tr = eps - pstrain_prev
        tr = jnp.trace(eps_e_tr, axis1=-2, axis2=-1)[..., None, None]
        sigma_tr = lam * tr * I + 2.0 * mu * eps_e_tr
        p_tr = jnp.trace(sigma_tr, axis1=-2, axis2=-1)[..., None, None] / 3.0
        s_tr = sigma_tr - p_tr * I
        phi_tr = jnp.sqrt(1.5 * jnp.sum(s_tr * s_tr, axis=(-2, -1)))

        def hardening(a):
            return S * (1.0 - jnp.exp(-D * a))

        f_trial = phi_tr - Y - hardening(alpha_prev)
        plastic_mask = f_trial > 0.0

        def body(_, dg):
            g = phi_tr - 3.0 * mu * dg - Y - hardening(alpha_prev + dg)
            dgd = -3.0 * mu - S * D * jnp.exp(-D * (alpha_prev + dg))
            dg_new = dg - g / dgd
            return jnp.where(plastic_mask, jnp.maximum(dg_new, 0.0), 0.0)

        dg = jax.lax.fori_loop(0, newton_iters, body,
                               jnp.zeros_like(alpha_prev))

        safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
        # flow direction n = (3/2) s_tr / phi_tr (radial: s || s_tr)
        coef = jnp.where(plastic_mask, 1.5 * dg / safe_phi, 0.0)
        dp = coef[..., None, None] * s_tr
        pstrain = pstrain_prev + dp
        sigma = sigma_tr - 2.0 * mu * dp
        alpha = alpha_prev + dg

        xi = jnp.concatenate([
            jnp.stack([pstrain[..., 0, 0], pstrain[..., 0, 1],
                       pstrain[..., 0, 2], pstrain[..., 1, 1],
                       pstrain[..., 1, 2], pstrain[..., 2, 2]], axis=-1),
            alpha[..., None]], axis=-1)
        return xi, sigma

    return jax.jit(step)
