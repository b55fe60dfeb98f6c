"""Differentiable SoA J2+Voce radial return + analytic consistent tangent.

The FE COUPLED fast path (fem/j2_block.py) dispatches the per-IP return
map through the component-major Pallas kernel on TPU. Pallas kernels are
not differentiable by tracing, so this module wraps the SoA step in a
``custom_jvp`` whose tangent rule is the closed-form implicit
linearization of the radial return — the same implicit-function-theorem
trick the generic local Newton uses (``models/nonlinear_solver.py``),
specialized to the scalar consistency equation

    g(dg) = phi_tr - 3 mu dg - Y - S (1 - exp(-D (alpha_prev + dg))) = 0.

Differentiating g = 0 gives ``dg_dot = rhs / (3 mu + S D e)`` with
``e = exp(-D (alpha_prev + dg))``; every other output is explicit
algebra in the tangents, so the rule is linear in tangents (and hence
transposable: reverse-mode flows through it).

Also here: :func:`consistent_tangent_rows`, the classical consistent
(algorithmic) tangent operator coefficients

    D_alg = kappa I (x) I + A (I_sym - I (x) I / 3) - c d (x) d,
    A = 2 mu (1 - beta),  beta = 3 mu dg / phi_tr,
    c = (9 mu^2 / phi_tr^2) (1 / (3 mu + H') - dg / phi_tr),

reconstructed exactly from the kernel OUTPUT (radial-return algebra:
``dev(sigma_out) = (1 - beta) dev_tr`` and ``phi_out = phi_tr - 3 mu
dg`` hold identically, so no trial-state recompute is needed). The FE
block assembly contracts these against shape gradients instead of
running ``jacfwd`` through the local solve — the tangent of the EXACT
return map rather than of its iteration.

Parity: replaces the per-IP AD of reference
``cmad/global_residuals/global_residual.py:341-399`` (COUPLED binding)
for the J2+Voce case; math per Simo & Hughes, Computational
Inelasticity, box 3.2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cmad_tpu.ops.j2_radial_return import soa_step_scalars
from cmad_tpu.typing import JaxArray


def _trial_rows(xi_soa, de_soa, mu, lam):
    """Trial stress rows + deviator rows + phi_tr from primal inputs
    (the elastic predictor — cheap explicit algebra)."""
    tr = de_soa[0] + de_soa[3] + de_soa[5]
    diag = lam * tr
    s0 = xi_soa[0] + diag + 2.0 * mu * de_soa[0]
    s1 = xi_soa[1] + 2.0 * mu * de_soa[1]
    s2 = xi_soa[2] + 2.0 * mu * de_soa[2]
    s3 = xi_soa[3] + diag + 2.0 * mu * de_soa[3]
    s4 = xi_soa[4] + 2.0 * mu * de_soa[4]
    s5 = xi_soa[5] + diag + 2.0 * mu * de_soa[5]
    p = (s0 + s3 + s5) / 3.0
    d0, d3, d5 = s0 - p, s3 - p, s5 - p
    phi_tr = jnp.sqrt(1.5 * (d0 * d0 + d3 * d3 + d5 * d5
                             + 2.0 * (s1 * s1 + s2 * s2 + s4 * s4)))
    return (s0, s1, s2, s3, s4, s5), (d0, d3, d5), phi_tr


def make_soa_step_ad(use_pallas: bool | None = None):
    """Build ``step(xi_soa, de_soa, scalars) -> xi_soa'`` (contract of
    ``j2_radial_return.soa_step_scalars``) with a closed-form
    ``custom_jvp``. ``use_pallas=None`` picks the Pallas kernel exactly
    when running single-device on TPU (Pallas calls have no SPMD
    partitioning rule, so multi-device meshes take the XLA form)."""
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and len(jax.devices()) == 1)

    if use_pallas:
        from cmad_tpu.ops.pallas_radial_return import (
            soa_step_scalars_pallas,
        )

        def forward(xi_soa, de_soa, scalars):
            return soa_step_scalars_pallas(xi_soa, de_soa, scalars)
    else:
        forward = soa_step_scalars

    @jax.custom_jvp
    def step(xi_soa: JaxArray, de_soa: JaxArray,
             scalars: JaxArray) -> JaxArray:
        return forward(xi_soa, de_soa, scalars)

    @step.defjvp
    def step_jvp(primals, tangents):
        xi, de, scalars = primals
        xi_t, de_t, sc_t = tangents
        mu, lam, Y, S, D = (scalars[0], scalars[1], scalars[2],
                            scalars[3], scalars[4])
        mu_t, lam_t, Y_t, S_t, D_t = (sc_t[0], sc_t[1], sc_t[2],
                                      sc_t[3], sc_t[4])

        out = step(xi, de, scalars)

        # primal intermediates: trial state by explicit algebra, the
        # converged dg recovered from the kernel output (no Newton
        # re-run), yield mask by the forward's own criterion
        (s0, s1, s2, s3, s4, s5), (d0, d3, d5), phi_tr = _trial_rows(
            xi, de, mu, lam)
        alpha_prev = xi[6]
        dg = out[6] - alpha_prev
        e = jnp.exp(-D * (alpha_prev + dg))
        f_trial = phi_tr - Y - S * (1.0 - jnp.exp(-D * alpha_prev))
        mask = f_trial > 0.0
        safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
        sc = jnp.where(mask, 3.0 * mu * dg / safe_phi,
                       jnp.zeros_like(dg))

        # tangent side — LINEAR in (xi_t, de_t, sc_t) throughout
        tr = de[0] + de[3] + de[5]
        tr_t = de_t[0] + de_t[3] + de_t[5]
        diag_t = lam_t * tr + lam * tr_t
        s0_t = xi_t[0] + diag_t + 2.0 * (mu_t * de[0] + mu * de_t[0])
        s1_t = xi_t[1] + 2.0 * (mu_t * de[1] + mu * de_t[1])
        s2_t = xi_t[2] + 2.0 * (mu_t * de[2] + mu * de_t[2])
        s3_t = xi_t[3] + diag_t + 2.0 * (mu_t * de[3] + mu * de_t[3])
        s4_t = xi_t[4] + 2.0 * (mu_t * de[4] + mu * de_t[4])
        s5_t = xi_t[5] + diag_t + 2.0 * (mu_t * de[5] + mu * de_t[5])
        p_t = (s0_t + s3_t + s5_t) / 3.0
        d0_t, d3_t, d5_t = s0_t - p_t, s3_t - p_t, s5_t - p_t

        phi_t = (1.5 / safe_phi) * (d0 * d0_t + d3 * d3_t + d5 * d5_t
                                    + 2.0 * (s1 * s1_t + s2 * s2_t
                                             + s4 * s4_t))
        alpha_t = xi_t[6]

        # implicit differentiation of g(dg) = 0 (plastic branch)
        denom = 3.0 * mu + S * D * e
        dg_t = jnp.where(
            mask,
            (phi_t - 3.0 * mu_t * dg - Y_t - S_t * (1.0 - e)
             - S * e * D_t * (alpha_prev + dg)
             - S * e * D * alpha_t) / denom,
            jnp.zeros_like(dg))

        sc_dot = jnp.where(
            mask,
            3.0 * (mu_t * dg + mu * dg_t) / safe_phi
            - sc * phi_t / safe_phi,
            jnp.zeros_like(dg))

        one_m_sc = 1.0 - sc
        out_t = jnp.stack([
            s0_t - sc_dot * d0 - sc * d0_t,
            s1_t * one_m_sc - s1 * sc_dot,
            s2_t * one_m_sc - s2 * sc_dot,
            s3_t - sc_dot * d3 - sc * d3_t,
            s4_t * one_m_sc - s4 * sc_dot,
            s5_t - sc_dot * d5 - sc * d5_t,
            alpha_t + dg_t,
            jnp.zeros_like(dg),
        ])
        return out, out_t

    return step


def consistent_tangent_rows(out: JaxArray, alpha_prev: JaxArray,
                            scalars: JaxArray):
    """Coefficients of the consistent tangent ``D_alg`` at the converged
    state, from the kernel OUTPUT rows alone.

    ``out``: (8, ...) updated state rows; ``alpha_prev``: (...,) previous
    accumulated plastic strain; ``scalars``: ``[mu, lam, Y, S, D]``.

    Returns ``(A, c, d_rows)`` with ``A = 2 mu (1 - beta)`` (elastic
    points: ``A = 2 mu``), the rank-one coefficient ``c`` (elastic: 0),
    and the TRIAL deviator rows ``d_rows = (d0, d1, d2, d3, d4, d5)``
    (internal sym-vec order), so that

        D_alg = kappa I(x)I + A (I_sym - I(x)I/3) - c d(x)d.
    """
    mu, _lam, _Y, S, D = (scalars[0], scalars[1], scalars[2], scalars[3],
                          scalars[4])
    s0, s1, s2, s3, s4, s5 = out[0], out[1], out[2], out[3], out[4], out[5]
    alpha_new = out[6]
    dg = alpha_new - alpha_prev
    mask = dg > 0.0

    p = (s0 + s3 + s5) / 3.0
    q0, q3, q5 = s0 - p, s3 - p, s5 - p
    phi_out = jnp.sqrt(1.5 * (q0 * q0 + q3 * q3 + q5 * q5
                              + 2.0 * (s1 * s1 + s2 * s2 + s4 * s4)))
    # radial-return identities (exact algebra, not convergence-dependent):
    # phi_tr = phi_out + 3 mu dg;  dev_tr = dev_out / (1 - beta)
    phi_tr = phi_out + 3.0 * mu * dg
    safe_phi = jnp.where(phi_tr > 0.0, phi_tr, 1.0)
    beta = jnp.where(mask, 3.0 * mu * dg / safe_phi, jnp.zeros_like(dg))
    # beta < 1 strictly: phi_out = Y + H(alpha_new) > 0 on plastic points
    inv_1mb = 1.0 / (1.0 - beta)
    d_rows = (q0 * inv_1mb, s1 * inv_1mb, s2 * inv_1mb,
              q3 * inv_1mb, s4 * inv_1mb, q5 * inv_1mb)

    Hp = S * D * jnp.exp(-D * alpha_new)
    c = jnp.where(
        mask,
        (9.0 * mu * mu / (safe_phi * safe_phi))
        * (1.0 / (3.0 * mu + Hp) - dg / safe_phi),
        jnp.zeros_like(dg))
    A = 2.0 * mu * (1.0 - beta)
    return A, c, d_rows
