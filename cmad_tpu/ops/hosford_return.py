"""Reduced 4-dof local Newton for diagonal-isotropic (Hosford) yields.

The Hosford effective stress (reference ``cmad/models/effective_stress.py:168``
and :func:`cmad_tpu.models.effective_stress.hosford_effective_stress`)
depends only on the DIAGONAL of the stress tensor, so its AD flow normal
is diagonal and traceless. In the 7-dof local return map (6 stress or
plastic-strain components + alpha) the three off-diagonal state slots
therefore evolve exactly elastically (rate form: trial off-diagonal
stress; total form: frozen off-diagonal plastic strain), and the
coupled solve collapses to FOUR unknowns: the three diagonal components
plus alpha.

This module builds that reduced solve for both model families:

- ``SmallRateElasticPlastic`` (xi = [cauchy6, alpha]): unknowns are the
  diagonal stresses; off-diagonals get the trial elastic increment.
- ``SmallElasticPlastic`` (xi = [plastic_strain6, alpha]): unknowns are
  the diagonal plastic strains; off-diagonals keep their previous
  values.

The reduced residual reproduces the full model residual's branch select,
scaling, and hardening exactly (same ``cond_residual``/``yield_tol``,
same ``combined_hardening_fun``), so the converged reduced state matches
the 7-dof solve to Newton tolerance while each iteration solves a 4x4
instead of a 7x7 system — the per-IP hot loop of Hosford COUPLED FE
assembly (e.g. the notch_hosford flagship problem at a = 100).

Tangents come for free: the reduced solve runs under
:func:`cmad_tpu.models.nonlinear_solver.make_newton_solve`, whose
``custom_jvp`` implements the implicit-function-theorem rule, and the
off-diagonal reconstruction is plain differentiable arithmetic.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import grad

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.effective_stress import hosford_effective_stress
from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.models.hardening import (
    combined_hardening_fun,
    get_hardening_funs,
)
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.paths import cond_residual

# internal sym-vec order is [xx, xy, xz, yy, yz, zz]
_DIAG_IDX = np.array([0, 3, 5])
_OFFDIAG_IDX = np.array([1, 2, 4])


def hosford_kind(model) -> str | None:
    """``"rate"`` / ``"total"`` when ``model`` admits the reduced
    diagonal-space Hosford solve; ``None`` otherwise. Mirrors
    :func:`cmad_tpu.ops.return_map.j2_voce_kind`: default constitutive
    funs, FULL_3D, inactive identity rotation, effective stress
    ``{hosford}``. Hardening may be anything
    ``combined_hardening_fun`` supports (it enters only through
    H(alpha))."""
    from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )
    if type(model) is SmallRateElasticPlastic:
        kind = "rate"
    elif type(model) is SmallElasticPlastic:
        kind = "total"
    else:
        return None
    if not getattr(model, "_uses_default_funs", False):
        return None
    if model._def_type != DefType.FULL_3D:
        return None
    vals = model.parameters.values
    try:
        plastic = vals["plastic"]
        if set(plastic["effective stress"]) != {"hosford"}:
            return None
        if "initial yield" not in plastic["flow stress"]:
            return None
        R = np.asarray(vals["rotation matrix"])
        return kind if np.allclose(R, np.eye(3)) else None
    except (KeyError, TypeError):
        return None


def hosford_reducible(model) -> bool:
    return hosford_kind(model) is not None


def _sym(t):
    return 0.5 * (t + jnp.swapaxes(t, -1, -2))


def _phi_and_normal(d, plastic):
    """Hosford effective stress of a diagonal stress 3-vector and its
    (diagonal, traceless) flow normal — evaluated through the SAME
    tensor-form function the full model differentiates, so the reduced
    and full solves see bitwise-identical yield surfaces."""
    def phi_of(dd):
        return hosford_effective_stress(jnp.diag(dd),
                                        {"effective stress": plastic[
                                            "effective stress"]})
    return phi_of(d), grad(phi_of)(d)


def _flow_stress(alpha, plastic):
    Y = plastic["flow stress"]["initial yield"]["Y"]
    return Y + combined_hardening_fun(
        alpha, plastic["flow stress"]["hardening"],
        hardening_funs=get_hardening_funs())


def make_hosford_local_solve(model, max_iters: int = 10,
                             abs_tol: float | None = None,
                             rel_tol: float | None = None,
                             line_search_settings=None):
    """Per-point ``local_solve(xi_guess, xi_prev, params, U, U_prev)``
    solving the reduced 4-dof system and reconstructing the full 7-dof
    state (requires ``hosford_reducible(model)``)."""
    kind = hosford_kind(model)
    if kind is None:
        raise ValueError(
            f"{type(model).__name__} is not Hosford-reducible")
    # both model families construct with yield_tol=1e-14 and from_deck
    # never overrides it
    yield_tol = 1e-14

    if kind == "rate":
        def residual4(x4, x4_prev, params, U, U_prev):
            ec = ElasticConstants.from_params(params["elastic"])
            mu, lam = ec.mu, ec.lmbda
            plastic = params["plastic"]
            d, alpha = x4[:3], x4[3]
            d_prev, alpha_prev = x4_prev[:3], x4_prev[3]
            dg = alpha - alpha_prev
            deps = (_sym(U.grad_fields["u"])
                    - _sym(U_prev.grad_fields["u"]))
            tr = jnp.trace(deps)
            ddiag_tr = lam * tr + 2.0 * mu * jnp.diagonal(deps)
            d_tr = d_prev + ddiag_tr
            phi, n = _phi_and_normal(d, plastic)
            yield_fun = (phi - _flow_stress(alpha, plastic)) / (2.0 * mu)
            # C(sigma): lam*tr(n) vanishes analytically (the yield is a
            # function of stress differences) but is kept for exactness
            corr = dg * (lam * jnp.sum(n) + 2.0 * mu * n)
            C_e = jnp.concatenate(
                [(d - d_tr) / (2.0 * mu), dg[None]])
            C_p = jnp.concatenate(
                [(d - d_tr + corr) / (2.0 * mu), yield_fun[None]])
            return cond_residual(yield_fun, C_e, C_p, yield_tol)
    else:
        def residual4(x4, x4_prev, params, U, U_prev):
            ec = ElasticConstants.from_params(params["elastic"])
            mu, lam = ec.mu, ec.lmbda
            plastic = params["plastic"]
            pe_d, alpha = x4[:3], x4[3]
            pe_d_prev, alpha_prev = x4_prev[:3], x4_prev[3]
            dg = alpha - alpha_prev
            eps = _sym(U.grad_fields["u"])
            # diagonal elastic stress; off-diagonal plastic strain is
            # frozen so it never enters the diagonal row
            tr_e = jnp.trace(eps) - jnp.sum(pe_d)
            d_sigma = lam * tr_e + 2.0 * mu * (jnp.diagonal(eps) - pe_d)
            phi, n = _phi_and_normal(d_sigma, plastic)
            yield_fun = (phi - _flow_stress(alpha, plastic)) / (2.0 * mu)
            dp = pe_d - pe_d_prev
            C_e = jnp.concatenate([dp, dg[None]])
            C_p = jnp.concatenate([dp - dg * n, yield_fun[None]])
            return cond_residual(yield_fun, C_e, C_p, yield_tol)

    solve = make_newton_solve(residual4, max_iters=max_iters,
                              abs_tol=abs_tol, rel_tol=rel_tol,
                              line_search_settings=line_search_settings)
    diag_idx = jnp.asarray(_DIAG_IDX)
    off_idx = jnp.asarray(_OFFDIAG_IDX)

    def local_solve(xi_guess, xi_prev, params, U, U_prev):
        del xi_guess  # reduced solve seeds from the previous state
        x_prev = jnp.concatenate([xi_prev[diag_idx], xi_prev[6:7]])
        x4 = solve(x_prev, x_prev, params, U, U_prev)
        if kind == "rate":
            ec = ElasticConstants.from_params(params["elastic"])
            deps = (_sym(U.grad_fields["u"])
                    - _sym(U_prev.grad_fields["u"]))
            od = xi_prev[off_idx] + 2.0 * ec.mu * jnp.stack(
                [deps[0, 1], deps[0, 2], deps[1, 2]])
        else:
            od = xi_prev[off_idx]
        xi = jnp.zeros_like(xi_prev)
        xi = xi.at[diag_idx].set(x4[:3])
        xi = xi.at[off_idx].set(od)
        return xi.at[6].set(x4[3])

    return local_solve
