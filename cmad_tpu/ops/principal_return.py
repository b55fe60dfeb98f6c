"""Reduced 4-dof local Newton in the TRIAL EIGENBASIS for the
frame-invariant (principal-stress) Hosford yield.

For an isotropic yield function and isotropic elasticity, the
backward-Euler return map is COAXIAL with the trial state: writing the
7-dof rate-form residual (``small_rate_elastic_plastic.py:174``) at its
root,

    sigma + dg * C : n(sigma) = sigma_tr,      n = dphi/dsigma,

the left side is an isotropic tensor function of ``sigma``, so ``sigma``
shares the trial stress's eigenvectors and only its three principal
values move. The coupled 7-dof solve therefore collapses to FOUR
unknowns — the principal stresses (rate form) or principal
plastic-strain increments (total form) plus alpha — after ONE
eigendecomposition of the trial state per point (the guarded
closed-form Cardano solution, ``util/jax_eigen_decomposition.py``).
This is the principal-space return map of VERDICT.md item 5: it works
for arbitrary stress states, unlike the diagonal-Hosford reduction
(``ops/hosford_return.py``), which requires the reference's
diagonal-only yield.

Degeneracy safety. The 4-dof Newton runs on principal VALUES only —
no eigenvector derivative enters the solve. Eigenvectors appear only in
the tensor reconstruction, written as ``trial + sum_i c_i P_i`` with
``c_i`` the principal CORRECTIONS (zero on the elastic branch, so the
elastic reconstruction is exact at any degeneracy). The spectral
projectors ``P_i`` are built by Cayley-Hamilton from the trial tensor
and its eigenvalues with a three-case select (distinct / one repeated
pair / triple) on dtype-scaled gap thresholds: a repeated pair uses the
well-conditioned complementary projector and the pair-averaged
correction (the two corrections coincide at exact degeneracy because
the yield is a symmetric function of the principal values), and AD
through these closed forms yields the divided-difference spectral
tangents automatically.

Material rotations are supported (the solve runs in the material frame
exactly like the full residual — the isotropic yield never sees Q, but
the reconstruction stays in the frame ``xi`` is stored in).

Tangents come for free: the reduced solve runs under
:func:`cmad_tpu.models.nonlinear_solver.make_newton_solve` (IFT
``custom_jvp``), the trial eigenvalues are differentiable through the
guarded Cardano closed form, and the reconstruction is plain
differentiable arithmetic.

Measured (r2, CPU f64, 20k-point plastic batch, a=100): 16,522
updates/s reduced vs 871 generic — 19x. The generic 7-dof path pays
the full tensor eigendecomposition (and its AD) inside EVERY Newton
iteration's residual/Jacobian; the reduction decomposes the trial
state once and iterates on four principal values.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import value_and_grad

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.effective_stress import hosford_phi_of_principal
from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.models.hardening import (
    combined_hardening_fun,
    get_hardening_funs,
)
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.paths import cond_residual
from cmad_tpu.models.var_types import (
    sym_tensor_from_vector,
    vector_from_sym_tensor,
)
from cmad_tpu.util.jax_eigen_decomposition import compute_eigenvalues

_TINY = 1e-30


def principal_hosford_kind(model) -> str | None:
    """``"rate"`` / ``"total"`` when ``model`` admits the reduced
    principal-space solve; ``None`` otherwise. Material rotations are
    supported (like the Hill reduction, unlike the diagonal-Hosford
    one)."""
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
    try:
        plastic = model.parameters.values["plastic"]
        if set(plastic["effective stress"]) != {"hosford_principal"}:
            return None
        if "initial yield" not in plastic["flow stress"]:
            return None
    except (KeyError, TypeError):
        return None
    return kind


def principal_hosford_reducible(model) -> bool:
    return principal_hosford_kind(model) is not None


def _gap_rtol(dtype) -> float:
    """Relative eigenvalue-gap threshold below which a pair is treated
    as degenerate: sqrt(eps) balances the O(eps/gap) conditioning error
    of the distinct-pair projectors against the O(gap) error of the
    pair-averaged correction."""
    return float(np.sqrt(np.finfo(np.dtype(dtype)).eps))


def coaxial_recompose(A, s, c):
    """``sum_i c_i P_i`` for the spectral projectors ``P_i`` of the
    symmetric 3x3 ``A`` with eigenvalues ``s`` (descending), built
    degeneracy-safely (see module docstring). ``c`` holds the three
    coefficients in the same (descending-eigenvalue) order."""
    dtype = A.dtype
    eye = jnp.eye(3, dtype=dtype)
    g01 = s[0] - s[1]
    g12 = s[1] - s[2]
    scale = jnp.maximum(jnp.maximum(jnp.abs(s[0]), jnp.abs(s[2])), _TINY)
    tol = jnp.asarray(_gap_rtol(dtype), dtype) * scale
    near01 = g01 <= tol
    near12 = g12 <= tol

    def safe(x):
        return jnp.where(jnp.abs(x) > _TINY, x, jnp.ones_like(x))

    A0 = A - s[0] * eye
    A1 = A - s[1] * eye
    A2 = A - s[2] * eye
    # Cayley-Hamilton projectors; denominators guarded so the branches
    # a select rejects stay finite
    P0 = (A1 @ A2) / safe(g01 * (g01 + g12))
    P1 = (A0 @ A2) / safe(-g01 * g12)
    P2 = (A0 @ A1) / safe((g01 + g12) * g12)
    distinct = c[0] * P0 + c[1] * P1 + c[2] * P2
    # s0 ~= s1: P2 stays well-conditioned; the 01-pair projector is its
    # complement, and both pair coefficients coincide at degeneracy
    pair01 = 0.5 * (c[0] + c[1]) * (eye - P2) + c[2] * P2
    # s1 ~= s2: P0 stays well-conditioned
    pair12 = c[0] * P0 + 0.5 * (c[1] + c[2]) * (eye - P0)
    triple = (c[0] + c[1] + c[2]) / 3.0 * eye
    return jnp.where(near01 & near12, triple,
                     jnp.where(near01, pair01,
                               jnp.where(near12, pair12, distinct)))


def _flow_stress(alpha, plastic):
    Y = plastic["flow stress"]["initial yield"]["Y"]
    return Y + combined_hardening_fun(
        alpha, plastic["flow stress"]["hardening"],
        hardening_funs=get_hardening_funs())


def _sym_material(t, Q):
    """Material-frame symmetric part: Q^T sym(t) Q."""
    e = 0.5 * (t + t.T)
    return Q.T @ e @ Q


def _phi_and_normal(s, plastic):
    """Hosford effective stress of a principal-stress 3-vector and its
    flow normal's principal values."""
    a = plastic["effective stress"]["hosford_principal"]["a"]
    return value_and_grad(hosford_phi_of_principal)(s, a)


def make_principal_hosford_local_solve(model, max_iters: int = 10,
                                       abs_tol: float | None = None,
                                       rel_tol: float | None = None,
                                       line_search_settings=None):
    """Per-point ``local_solve(xi_guess, xi_prev, params, U, U_prev)``
    solving the reduced 4-dof principal-space system and reconstructing
    the full 7-dof state (requires
    ``principal_hosford_reducible(model)``)."""
    kind = principal_hosford_kind(model)
    if kind is None:
        raise ValueError(
            f"{type(model).__name__} is not principal-Hosford-reducible")
    # both model families construct with yield_tol=1e-14 and from_deck
    # never overrides it
    yield_tol = 1e-14

    if kind == "rate":
        # x4 = [principal stresses, alpha]; trial4 = [s_tr, alpha_prev]
        def residual4(x4, trial4, params):
            ec = ElasticConstants.from_params(params["elastic"])
            mu, lam = ec.mu, ec.lmbda
            plastic = params["plastic"]
            d, alpha = x4[:3], x4[3]
            s_tr, alpha_prev = trial4[:3], trial4[3]
            dg = alpha - alpha_prev
            phi, n = _phi_and_normal(d, plastic)
            yield_fun = (phi - _flow_stress(alpha, plastic)) / (2.0 * mu)
            # C : n with isotropic C; lam*sum(n) vanishes analytically
            # (phi depends on stress differences) but is kept for
            # exactness against the full residual
            corr = dg * (lam * jnp.sum(n) + 2.0 * mu * n)
            C_e = jnp.concatenate([(d - s_tr) / (2.0 * mu), dg[None]])
            C_p = jnp.concatenate(
                [(d - s_tr + corr) / (2.0 * mu), yield_fun[None]])
            return cond_residual(yield_fun, C_e, C_p, yield_tol)
    else:
        # x4 = [principal plastic-strain increments, alpha];
        # trial4 = [e_tr (principal trial elastic strains), alpha_prev]
        def residual4(x4, trial4, params):
            ec = ElasticConstants.from_params(params["elastic"])
            mu, lam = ec.mu, ec.lmbda
            plastic = params["plastic"]
            dp, alpha = x4[:3], x4[3]
            e_tr, alpha_prev = trial4[:3], trial4[3]
            dg = alpha - alpha_prev
            e = e_tr - dp
            s = lam * jnp.sum(e) + 2.0 * mu * e  # principal stresses
            phi, n = _phi_and_normal(s, plastic)
            yield_fun = (phi - _flow_stress(alpha, plastic)) / (2.0 * mu)
            C_e = jnp.concatenate([dp, dg[None]])
            C_p = jnp.concatenate([dp - dg * n, yield_fun[None]])
            return cond_residual(yield_fun, C_e, C_p, yield_tol)

    solve = make_newton_solve(residual4, max_iters=max_iters,
                              abs_tol=abs_tol, rel_tol=rel_tol,
                              line_search_settings=line_search_settings)

    def local_solve(xi_guess, xi_prev, params, U, U_prev):
        del xi_guess  # reduced solve seeds from the trial state
        ec = ElasticConstants.from_params(params["elastic"])
        mu, lam = ec.mu, ec.lmbda
        Q = jnp.asarray(params["rotation matrix"])
        alpha_prev = xi_prev[6]
        if kind == "rate":
            deps = _sym_material(
                U.grad_fields["u"] - U_prev.grad_fields["u"], Q)
            A_tr = (sym_tensor_from_vector(xi_prev[:6])
                    + lam * jnp.trace(deps) * jnp.eye(3, dtype=deps.dtype)
                    + 2.0 * mu * deps)
        else:
            eps = _sym_material(U.grad_fields["u"], Q)
            A_tr = eps - sym_tensor_from_vector(xi_prev[:6])
        s_tr = compute_eigenvalues(A_tr)
        trial4 = jnp.concatenate([s_tr, alpha_prev[None]])
        if kind == "rate":
            x0 = trial4  # elastic predictor
        else:
            x0 = jnp.concatenate([jnp.zeros_like(s_tr),
                                  alpha_prev[None]])
        x4 = solve(x0, trial4, params)
        # coaxial reconstruction: trial tensor + spectral correction
        if kind == "rate":
            sigma = A_tr + coaxial_recompose(A_tr, s_tr, x4[:3] - s_tr)
            xi6 = vector_from_sym_tensor(sigma)
        else:
            dP = coaxial_recompose(A_tr, s_tr, x4[:3])
            xi6 = xi_prev[:6] + vector_from_sym_tensor(dP)
        return jnp.concatenate([xi6, x4[3:4]])

    return local_solve
