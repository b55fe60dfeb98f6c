"""Block-level COUPLED fast path: SoA radial return + analytic tangent.

The generic COUPLED assembly evaluates the per-IP local solve under two
nested vmaps (elements x IPs) in AoS layout, and obtains the element
tangent by ``jacfwd`` through the solve's IFT rule. For the J2+Voce
rate-form displacement problem — the workhorse elastic-plastic case —
that wastes the component-major Pallas kernel (measured r2: 2.3 G vs
0.52 G updates/s) and pays a 24-wide forward-tangent sweep for a tangent
that is CLOSED FORM.

This module assembles the whole element block in four dense batched
stages, all MXU/VPU-shaped:

1. strain increments for every (element, IP) in one component-major
   einsum — ``de[i,j][e,q] = sym(dU[e,a,i] grad_N[e,q,a,j])`` — no
   (E,Q,3,3) AoS temporaries;
2. ONE SoA radial-return dispatch over the flattened (E*Q) point batch
   (``ops/j2_soa_ad.py``: Pallas kernel on single-device TPU, XLA-fused
   otherwise; differentiable via the closed-form implicit JVP);
3. the residual ``R[e,a,i] = grad_N[e,q,a,j] sigma[j,i] w dv`` directly
   from the component-major stress rows;
4. the element stiffness from the consistent tangent
   ``D_alg = kappa I(x)I + A (I_sym - I(x)I/3) - c d(x)d`` contracted
   against shape gradients — four einsums instead of a 24-tangent AD
   sweep.

Semantics match the generic path (reference hot loop:
``cmad/fem/assembly.py:416-537`` + ``cmad/global_residuals/
global_residual.py:341``); equivalence is pinned by
``tests/fem/test_j2_block_fastpath.py``. Assembly dispatches here when
``SmallDispEquilibrium.for_model`` attaches the ``block_*`` evaluators
(displacement-form, FULL_3D, J2+Voce rate OR total model; gate:
``CMAD_FE_BLOCK_FASTPATH=0`` disables).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cmad_tpu.ops.j2_radial_return import j2_voce_scalars
from cmad_tpu.ops.j2_soa_ad import consistent_tangent_rows, make_soa_step_ad
from cmad_tpu.typing import JaxArray


def fe_block_fastpath_enabled() -> bool:
    return os.environ.get("CMAD_FE_BLOCK_FASTPATH", "1") != "0"


def j2_block_applicable(gr, model, mode, print_local_convergence) -> bool:
    """True when the displacement-form COUPLED block can run the SoA
    fast path: single-residual 3D equilibrium, J2+Voce in either the
    rate or the total form (identity rotation), per-IP convergence
    printing off."""
    from cmad_tpu.global_residuals.modes import GlobalResidualMode
    from cmad_tpu.ops.return_map import j2_voce_kind

    return (fe_block_fastpath_enabled()
            and mode == GlobalResidualMode.COUPLED
            and not print_local_convergence
            and gr.num_residuals == 1
            and getattr(gr, "ndims", None) == 3
            and j2_voce_kind(model) in ("rate", "total")
            and model.num_dofs == 7)


def _sigma_cm(rows):
    """(3, 3, ...) symmetric tensor view from internal sym-vec rows
    [xx, xy, xz, yy, yz, zz]."""
    r0, r1, r2, r3, r4, r5 = rows
    return jnp.stack([
        jnp.stack([r0, r1, r2]),
        jnp.stack([r1, r3, r4]),
        jnp.stack([r2, r4, r5]),
    ])


def make_j2_block_kernels(model) -> dict:
    """The ``{"block_R_and_K_and_xi", "block_R"}`` evaluators consumed by
    ``fem/assembly.py`` for blocks passing :func:`j2_block_applicable`.

    Both take ``(params, U_elem, U_prev_elem, geom, forcing_fn, t,
    xi_prev)`` with ``U_elem`` (E, nd, 3) displacement coefficients,
    ``geom`` the block's geometry-cache entry, ``forcing_fn`` the body
    force callable or None, and ``xi_prev`` (E, Q, 7) AoS state.

    The TOTAL form (``models/small_elastic_plastic.py``,
    xi = [plastic_strain6, alpha]) maps EXACTLY onto the rate-form SoA
    kernel: feeding virtual previous-stress rows ``-C : p_prev`` with
    the CURRENT total strain as the "increment" reproduces the total
    form's trial stress ``C : (eps - p_prev)``, and the corrector,
    stress output, and consistent tangent are then identical algebra.
    The plastic strain carry is recovered explicitly afterwards as
    ``p_new = eps - C^{-1} : sigma_new``.
    """
    from cmad_tpu.ops.return_map import j2_voce_kind

    kind = j2_voce_kind(model)
    step = make_soa_step_ad()

    def _solve(params, U_e, Up_e, geom, xi_prev):
        gradN = geom["per_elem"]["grad_N_phys"][0]     # (E, Q, nd, 3)
        wdv = (geom["shared"]["quad_w"][None, :]
               * geom["per_elem"]["iso_jac_det"])      # (E, Q)
        E, Q = wdv.shape
        n = E * Q
        # CARRIER layout (fem/xi_carrier.py): xi_prev may arrive
        # component-major (8, E*Q) — the trajectory-resident layout —
        # in which case the rate form feeds the kernel with ZERO
        # relayout (the kernel's own state block) and the output is
        # returned component-major for the next step to consume as-is
        carrier = xi_prev.ndim == 2

        # component-major strain rows: (3, 3, E, Q), the batch on the
        # trailing (lane) axes. Rate form: the strain INCREMENT from
        # dU; total form: the TOTAL strain from the current U.
        dU = (U_e - Up_e) if kind == "rate" else U_e
        G = jnp.einsum("eai,eqaj->ijeq", dU, gradN)
        rows = [G[0, 0], 0.5 * (G[0, 1] + G[1, 0]),
                0.5 * (G[0, 2] + G[2, 0]), G[1, 1],
                0.5 * (G[1, 2] + G[2, 1]), G[2, 2]]
        z = jnp.zeros_like(rows[0])
        de_soa = jnp.stack(rows + [z, z]).reshape(8, n)
        scalars = j2_voce_scalars(params, de_soa.dtype)

        if kind == "rate":
            # stress IS the state: rows go in as-is
            xi_soa = xi_prev if carrier else jnp.concatenate(
                [xi_prev.reshape(n, 7).T,
                 jnp.zeros((1, n), dtype=xi_prev.dtype)])
        else:
            # virtual previous stress -C : p_prev, so the kernel's
            # trial  xi + C : de  equals  C : (eps - p_prev)
            mu, lam = scalars[0], scalars[1]
            p = xi_prev if carrier else xi_prev.reshape(n, 7).T
            ltrp = lam * (p[0] + p[3] + p[5])
            two_mu = 2.0 * mu
            xi_soa = jnp.stack([
                -(ltrp + two_mu * p[0]), -two_mu * p[1],
                -two_mu * p[2], -(ltrp + two_mu * p[3]),
                -two_mu * p[4], -(ltrp + two_mu * p[5]),
                p[6], jnp.zeros_like(p[0])])
        out = step(xi_soa, de_soa, scalars).reshape(8, E, Q)
        return out, scalars, gradN, wdv, de_soa.reshape(8, E, Q), carrier

    def _residual(out, gradN, wdv, forcing_fn, geom, t):
        sigma = _sigma_cm(tuple(out[r] for r in range(6)))  # (3,3,E,Q)
        R = jnp.einsum("eqaj,jieq,eq->eai", gradN, sigma, wdv)
        if forcing_fn is not None:
            coords = geom["per_elem"]["coords_ip"]          # (E, Q, 3)
            fvals = jax.vmap(jax.vmap(
                lambda c: jnp.asarray(forcing_fn(c, t))))(coords)
            N0 = geom["shared"]["N"][0]                     # (Q, nd)
            R = R - jnp.einsum("qa,eqi,eq->eai", N0, fvals, wdv)
        return R

    def _xi_out(out, eps_rows, scalars, carrier):
        """Updated state in the INPUT's layout: carrier (8, E*Q) rows
        (row 7 zero) or AoS (E, Q, 7)."""
        E, Q = out.shape[1], out.shape[2]
        if kind == "rate":
            if carrier:
                return out.reshape(8, E * Q)   # free: kernel layout
            return jnp.moveaxis(out[:7], 0, -1)             # (E, Q, 7)
        # total form: p_new = eps - C^{-1} : sigma_new (elastic
        # compliance on sym-vec rows), alpha_new from the kernel
        mu, lam = scalars[0], scalars[1]
        inv_two_mu = 1.0 / (2.0 * mu)
        tr_sig = out[0] + out[3] + out[5]
        lam_tr_e = lam * tr_sig / (3.0 * lam + 2.0 * mu)
        p_rows = [
            eps_rows[0] - (out[0] - lam_tr_e) * inv_two_mu,
            eps_rows[1] - out[1] * inv_two_mu,
            eps_rows[2] - out[2] * inv_two_mu,
            eps_rows[3] - (out[3] - lam_tr_e) * inv_two_mu,
            eps_rows[4] - out[4] * inv_two_mu,
            eps_rows[5] - (out[5] - lam_tr_e) * inv_two_mu,
            out[6],
        ]
        if carrier:
            return jnp.stack(
                p_rows + [jnp.zeros_like(p_rows[0])]).reshape(8, E * Q)
        return jnp.moveaxis(jnp.stack(p_rows), 0, -1)       # (E, Q, 7)

    def block_r_and_k_and_xi(params, U_e, Up_e, geom, forcing_fn, t,
                             xi_prev):
        out, scalars, gradN, wdv, eps_rows, carrier = _solve(
            params, U_e, Up_e, geom, xi_prev)
        E, Q = wdv.shape
        alpha_prev = (xi_prev[6].reshape(E, Q) if carrier
                      else xi_prev[..., 6])
        R = _residual(out, gradN, wdv, forcing_fn, geom, t)

        A, c, d_rows = consistent_tangent_rows(out, alpha_prev,
                                               scalars)
        mu, lam = scalars[0], scalars[1]
        kappa = lam + 2.0 * mu / 3.0
        C1 = (kappa - A / 3.0) * wdv
        C2 = 0.5 * A * wdv
        C3 = c * wdv
        d_cm = _sigma_cm(d_rows)                            # (3,3,E,Q)
        v = jnp.einsum("eqaj,jieq->eqai", gradN, d_cm)
        eye = jnp.eye(3, dtype=wdv.dtype)
        K = (jnp.einsum("eq,eqai,eqbk->eaibk", C1, gradN, gradN)
             + jnp.einsum("eq,eqak,eqbi->eaibk", C2, gradN, gradN)
             + jnp.einsum("eab,ik->eaibk",
                          jnp.einsum("eq,eqaj,eqbj->eab", C2, gradN,
                                     gradN), eye)
             - jnp.einsum("eq,eqai,eqbk->eaibk", C3, v, v))
        return R, K, _xi_out(out, eps_rows, scalars, carrier)

    def block_r(params, U_e, Up_e, geom, forcing_fn, t, xi_prev):
        out, _scalars, gradN, wdv, _eps, _carrier = _solve(
            params, U_e, Up_e, geom, xi_prev)
        return _residual(out, gradN, wdv, forcing_fn, geom, t)

    # not jitted here: ``forcing_fn`` is a Python callable argument, and
    # every consumer (assembly inside the jitted solvers/drivers) traces
    # these bodies into an enclosing jit anyway.
    # "xi_carrier": the drivers may keep this block's state
    # component-major (8, E*Q) across the whole drive
    # (fem/xi_carrier.py) — both evaluators accept either layout and
    # return the one they were given.
    return {"block_R_and_K_and_xi": block_r_and_k_and_xi,
            "block_R": block_r,
            "xi_carrier": True}
