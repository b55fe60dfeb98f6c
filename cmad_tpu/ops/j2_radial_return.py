"""Analytic J2+Voce radial returns (rate and total form), XLA-fused.

Parity: the math of reference ``cmad/models/small_rate_elastic_plastic.py``
/ ``small_elastic_plastic.py`` specialized to J2 + Voce, reduced to the
classical radial return (elastic predictor + scalar Newton corrector on
the plastic multiplier) — the production dispatch for FE COUPLED
assembly and the headline throughput kernel.

TPU shaping (measured on one chip at 4M points):

- **Component-wise dataflow**: every intermediate is a (batch,) scalar
  stream; no (batch, 3, 3) tensor temporaries are ever materialized
  between the input ``grad_u`` reads and the final packed outputs.
  Building sym-tensor intermediates with ``jnp.stack`` costs real HBM
  round-trips at fusion boundaries (~15% end-to-end).
- **Unrolled scalar Newton**: ``fori_loop`` carries spill the (batch,)
  iterate to HBM each trip; a static unroll fuses all iterations into
  the surrounding elementwise kernel.
- The kernel is memory-bound (~2 flop/byte): the honest ceiling is the
  HBM roofline reported by ``bench.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.typing import JaxArray

# the scalar corrector converges quadratically; 8 iterations reach the
# f32 floor from any trial state the FE drivers produce
_SCALAR_NEWTON_ITERS = 8


def _sym(t):
    return 0.5 * (t + jnp.swapaxes(t, -1, -2))


def _constants(params):
    ec = ElasticConstants.from_params(params["elastic"])
    plastic = params["plastic"]
    voce = plastic["flow stress"]["hardening"]["voce"]
    return (ec.mu, ec.lmbda,
            plastic["flow stress"]["initial yield"]["Y"],
            voce["S"], voce["D"])


def _scalar_corrector(phi_tr, alpha_prev, mu, Y, S, D, newton_iters):
    """Masked, unrolled Newton on the plastic multiplier dg solving
    phi_tr - 3 mu dg = Y + H(alpha_prev + dg)."""
    f_trial = phi_tr - Y - S * (1.0 - jnp.exp(-D * alpha_prev))
    mask = f_trial > 0.0
    dg = jnp.zeros_like(alpha_prev)
    for _ in range(newton_iters):
        e = jnp.exp(-D * (alpha_prev + dg))
        g = phi_tr - 3.0 * mu * dg - Y - S * (1.0 - e)
        dgd = -3.0 * mu - S * D * e
        dg = jnp.where(mask, jnp.maximum(dg - g / dgd, 0.0),
                       jnp.zeros_like(dg))
    return dg, mask


def _pack(c00, c01, c02, c11, c12, c22, alpha):
    """(xi, sigma) from the six unique components + alpha — the only
    two materialization points of the kernel."""
    xi = jnp.stack([c00, c01, c02, c11, c12, c22, alpha], axis=-1)
    sigma = jnp.stack([c00, c01, c02, c01, c11, c12, c02, c12, c22],
                      axis=-1).reshape(*c00.shape, 3, 3)
    return xi, sigma


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
        mu, lam, Y, S, D = _constants(params)
        g, g0 = grad_u, grad_u_prev

        # strain increment components (sym part of grad_u - grad_u_prev)
        exx = g[..., 0, 0] - g0[..., 0, 0]
        eyy = g[..., 1, 1] - g0[..., 1, 1]
        ezz = g[..., 2, 2] - g0[..., 2, 2]
        exy = 0.5 * (g[..., 0, 1] + g[..., 1, 0]
                     - g0[..., 0, 1] - g0[..., 1, 0])
        exz = 0.5 * (g[..., 0, 2] + g[..., 2, 0]
                     - g0[..., 0, 2] - g0[..., 2, 0])
        eyz = 0.5 * (g[..., 1, 2] + g[..., 2, 1]
                     - g0[..., 1, 2] - g0[..., 2, 1])
        tr = exx + eyy + ezz

        # trial stress: previous stress + isotropic elastic increment
        # (xi internal sym-vec order is [xx, xy, xz, yy, yz, zz])
        sxx = xi_prev[..., 0] + lam * tr + 2.0 * mu * exx
        sxy = xi_prev[..., 1] + 2.0 * mu * exy
        sxz = xi_prev[..., 2] + 2.0 * mu * exz
        syy = xi_prev[..., 3] + lam * tr + 2.0 * mu * eyy
        syz = xi_prev[..., 4] + 2.0 * mu * eyz
        szz = xi_prev[..., 5] + lam * tr + 2.0 * mu * ezz
        alpha_prev = xi_prev[..., 6]

        p = (sxx + syy + szz) / 3.0
        dxx, dyy, dzz = sxx - p, syy - p, szz - p
        phi_tr = jnp.sqrt(1.5 * (dxx * dxx + dyy * dyy + dzz * dzz
                                 + 2.0 * (sxy * sxy + sxz * sxz
                                          + syz * syz)))

        dg, mask = _scalar_corrector(phi_tr, alpha_prev, mu, Y, S, D,
                                     newton_iters)

        safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
        sc = jnp.where(mask, 3.0 * mu * dg / safe_phi,
                       jnp.zeros_like(dg))
        return _pack(sxx - sc * dxx, sxy * (1.0 - sc), sxz * (1.0 - sc),
                     syy - sc * dyy, syz * (1.0 - sc), szz - sc * dzz,
                     alpha_prev + dg)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Component-major (SoA) contract
#
# TPU physical layout puts the LAST array dim on the 128-wide lane axis:
# an AoS (N, 7) state wastes 121/128 lanes per tile, so streaming
# workloads that hold state ACROSS dispatches (time-stepped histories,
# calibration ensembles) should carry it component-major instead. The
# shared contract for the SoA kernels (XLA here, Pallas in
# pallas_radial_return.py — both drop-in interchangeable):
#
#   xi_soa: (8, N) rows [sxx, sxy, sxz, syy, syz, szz, alpha, pad]
#   de_soa: (8, N) rows [exx, exy, exz, eyy, eyz, ezz, pad, pad]
#             (sym strain increment, internal sym-vec order)
#   step(xi_soa, de_soa, params) -> xi_soa'   (stress IS the rate-form
#             state, so no separate sigma output: 13 reads + 7 writes
#             useful traffic = 80 B/update in f32)
#
# Measured on one v5e chip at 4M points (r2): AoS production kernel
# 0.65 G updates/s; XLA SoA 0.97 G; Pallas SoA 3.26 G unrolled
# (38% of the 819 GB/s HBM roofline — the platform's measured
# streaming ceiling for chained elementwise kernels).
# ---------------------------------------------------------------------------

SOA_ROWS = 8


def pack_state_soa(xi: JaxArray) -> JaxArray:
    """(N, 7) AoS rate-form state -> (8, N) component-major rows."""
    pad = jnp.zeros((1, xi.shape[0]), dtype=xi.dtype)
    return jnp.concatenate([xi.T, pad])


def unpack_state_soa(xi_soa: JaxArray) -> JaxArray:
    """(8, N) component-major rows -> (N, 7) AoS rate-form state."""
    return xi_soa[:7].T


def strain_increment_soa(grad_u: JaxArray,
                         grad_u_prev: JaxArray) -> JaxArray:
    """(N, 3, 3) current/previous displacement gradients -> (8, N)
    component-major sym strain-increment rows."""
    g, g0 = grad_u, grad_u_prev
    rows = [
        g[..., 0, 0] - g0[..., 0, 0],
        0.5 * (g[..., 0, 1] + g[..., 1, 0] - g0[..., 0, 1] - g0[..., 1, 0]),
        0.5 * (g[..., 0, 2] + g[..., 2, 0] - g0[..., 0, 2] - g0[..., 2, 0]),
        g[..., 1, 1] - g0[..., 1, 1],
        0.5 * (g[..., 1, 2] + g[..., 2, 1] - g0[..., 1, 2] - g0[..., 2, 1]),
        g[..., 2, 2] - g0[..., 2, 2],
    ]
    z = jnp.zeros_like(rows[0])
    return jnp.stack(rows + [z, z])


def stress_from_state_soa(xi_soa: JaxArray) -> JaxArray:
    """(8, N) component-major state -> (N, 3, 3) Cauchy stress."""
    s = xi_soa
    return jnp.stack([
        jnp.stack([s[0], s[1], s[2]], axis=-1),
        jnp.stack([s[1], s[3], s[4]], axis=-1),
        jnp.stack([s[2], s[4], s[5]], axis=-1),
    ], axis=-2)


def j2_voce_scalars(params, dtype) -> JaxArray:
    """The five J2+Voce material scalars ``[mu, lambda, Y, S, D]`` as one
    differentiable (5,) array — the SMEM/scalar-argument form shared by
    the XLA and Pallas SoA kernels."""
    mu, lam, Y, S, D = _constants(params)
    return jnp.stack([mu, lam, Y, S, D]).astype(dtype)


def soa_step_scalars(xi_soa: JaxArray, de_soa: JaxArray,
                     scalars: JaxArray,
                     newton_iters: int = _SCALAR_NEWTON_ITERS) -> JaxArray:
    """XLA-fused component-major radial return with the material
    constants pre-stacked by :func:`j2_voce_scalars` (rows contract in
    the SoA section comment above)."""
    mu, lam, Y, S, D = (scalars[0], scalars[1], scalars[2], scalars[3],
                        scalars[4])
    exx, exy, exz = de_soa[0], de_soa[1], de_soa[2]
    eyy, eyz, ezz = de_soa[3], de_soa[4], de_soa[5]
    tr = exx + eyy + ezz
    diag = lam * tr
    sxx = xi_soa[0] + diag + 2.0 * mu * exx
    sxy = xi_soa[1] + 2.0 * mu * exy
    sxz = xi_soa[2] + 2.0 * mu * exz
    syy = xi_soa[3] + diag + 2.0 * mu * eyy
    syz = xi_soa[4] + 2.0 * mu * eyz
    szz = xi_soa[5] + diag + 2.0 * mu * ezz
    alpha_prev = xi_soa[6]

    p = (sxx + syy + szz) / 3.0
    dxx, dyy, dzz = sxx - p, syy - p, szz - p
    phi_tr = jnp.sqrt(1.5 * (dxx * dxx + dyy * dyy + dzz * dzz
                             + 2.0 * (sxy * sxy + sxz * sxz
                                      + syz * syz)))
    dg, mask = _scalar_corrector(phi_tr, alpha_prev, mu, Y, S, D,
                                 newton_iters)
    safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
    sc = jnp.where(mask, 3.0 * mu * dg / safe_phi, jnp.zeros_like(dg))
    return jnp.stack([sxx - sc * dxx, sxy * (1.0 - sc),
                      sxz * (1.0 - sc), syy - sc * dyy,
                      syz * (1.0 - sc), szz - sc * dzz,
                      alpha_prev + dg, jnp.zeros_like(dg)])


def make_j2_radial_return_soa(parameters, newton_iters: int =
                              _SCALAR_NEWTON_ITERS):
    """XLA-fused component-major radial return (rate form); see the
    SoA-contract comment above. Backend-neutral reference semantics for
    the Pallas TPU kernel (pallas_radial_return.py), and the fallback
    dispatch off-TPU."""
    del parameters  # layout is fixed by the J2+Voce model

    def step(xi_soa: JaxArray, de_soa: JaxArray, params) -> JaxArray:
        scalars = j2_voce_scalars(params, xi_soa.dtype)
        return soa_step_scalars(xi_soa, de_soa, scalars,
                                newton_iters=newton_iters)

    return jax.jit(step)


def make_j2_radial_return_total(parameters, newton_iters: int =
                                _SCALAR_NEWTON_ITERS):
    """Radial return for the TOTAL-form small-strain J2+Voce model
    (models/small_elastic_plastic.py): xi = [plastic_strain6, alpha].

    Same scalar corrector as :func:`make_j2_radial_return`; the state
    update is the plastic strain, ``dp = dg * (3/2) s_tr / phi_tr``.
    The total form is history-parametrized by the CURRENT strain only,
    so ``grad_u_prev`` is accepted for interface parity but unused.
    Returns ``(xi, sigma)`` like the rate form.
    """
    del parameters

    def step(xi_prev: JaxArray, grad_u: JaxArray, grad_u_prev: JaxArray,
             params) -> tuple[JaxArray, JaxArray]:
        del grad_u_prev
        mu, lam, Y, S, D = _constants(params)
        g = grad_u

        # trial elastic strain components eps - pstrain_prev
        exx = g[..., 0, 0] - xi_prev[..., 0]
        exy = 0.5 * (g[..., 0, 1] + g[..., 1, 0]) - xi_prev[..., 1]
        exz = 0.5 * (g[..., 0, 2] + g[..., 2, 0]) - xi_prev[..., 2]
        eyy = g[..., 1, 1] - xi_prev[..., 3]
        eyz = 0.5 * (g[..., 1, 2] + g[..., 2, 1]) - xi_prev[..., 4]
        ezz = g[..., 2, 2] - xi_prev[..., 5]
        alpha_prev = xi_prev[..., 6]
        tr = exx + eyy + ezz

        sxx = lam * tr + 2.0 * mu * exx
        sxy = 2.0 * mu * exy
        sxz = 2.0 * mu * exz
        syy = lam * tr + 2.0 * mu * eyy
        syz = 2.0 * mu * eyz
        szz = lam * tr + 2.0 * mu * ezz

        p = (sxx + syy + szz) / 3.0
        dxx, dyy, dzz = sxx - p, syy - p, szz - p
        phi_tr = jnp.sqrt(1.5 * (dxx * dxx + dyy * dyy + dzz * dzz
                                 + 2.0 * (sxy * sxy + sxz * sxz
                                          + syz * syz)))

        dg, mask = _scalar_corrector(phi_tr, alpha_prev, mu, Y, S, D,
                                     newton_iters)

        safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
        coef = jnp.where(mask, 1.5 * dg / safe_phi, jnp.zeros_like(dg))
        # dp = coef * s_tr; pstrain += dp; sigma = sigma_tr - 2 mu dp
        pxx = xi_prev[..., 0] + coef * dxx
        pxy = xi_prev[..., 1] + coef * sxy
        pxz = xi_prev[..., 2] + coef * sxz
        pyy = xi_prev[..., 3] + coef * dyy
        pyz = xi_prev[..., 4] + coef * syz
        pzz = xi_prev[..., 5] + coef * dzz
        two_mu_c = 2.0 * mu * coef
        xi = jnp.stack([pxx, pxy, pxz, pyy, pyz, pzz,
                        alpha_prev + dg], axis=-1)
        o00 = sxx - two_mu_c * dxx
        o01 = sxy * (1.0 - two_mu_c)
        o02 = sxz * (1.0 - two_mu_c)
        o11 = syy - two_mu_c * dyy
        o12 = syz * (1.0 - two_mu_c)
        o22 = szz - two_mu_c * dzz
        sigma = jnp.stack([o00, o01, o02, o01, o11, o12, o02, o12, o22],
                          axis=-1).reshape(*o00.shape, 3, 3)
        return xi, sigma

    return jax.jit(step)
