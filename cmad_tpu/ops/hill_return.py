"""Reduced 1-dof local Newton for the Hill-1948 quadratic yield.

The Hill effective stress is a constant quadratic form, so its flow
normal is LINEAR in stress: n = B sigma / phi with a constant symmetric
6x6 operator B (reference ``cmad/models/effective_stress.py:40``,
:func:`cmad_tpu.models.effective_stress.hill_effective_stress`). The
backward-Euler return map

    sigma = sigma_tr - dg * C : n(sigma),    C : n = 2 mu n

therefore collapses to a LINEAR stress recovery per candidate plastic
multiplier: with s = 2 mu dg / phi(sigma),

    (I + s B) sigma = sigma_tr,

leaving ONE scalar unknown s >= 0 fixed by the yield condition

    phi(sigma(s)) = Y + H(alpha_prev + s * phi(sigma(s)) / (2 mu)).

Each residual evaluation is a 6x6 one-hot Gauss-Jordan solve
(``ops.linalg.small_solve`` — fuses into the vmapped point batch) plus
closed-form phi; the 7-dof coupled Newton of the generic path reduces
to a scalar solve, mirroring the classical anisotropic radial return.
Both model families are covered (rate form updates stress, total form
updates plastic strain via dp = (s / 2 mu) B sigma), with arbitrary
material rotations (the solve runs in the material frame exactly like
the full residual) and any ``combined_hardening_fun`` hardening.

Tangents come for free: the scalar solve runs under
:func:`cmad_tpu.models.nonlinear_solver.make_newton_solve` (IFT
``custom_jvp``), and the stress recovery is plain differentiable
arithmetic.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.models.hardening import (
    combined_hardening_fun,
    get_hardening_funs,
)
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.ops.linalg import small_solve


def hill_kind(model) -> str | None:
    """``"rate"`` / ``"total"`` when ``model`` admits the reduced Hill
    solve; ``None`` otherwise. Unlike the J2/Hosford specializations,
    material rotations are supported (the reduction runs in the
    material frame)."""
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
        if set(plastic["effective stress"]) != {"hill"}:
            return None
        if "initial yield" not in plastic["flow stress"]:
            return None
    except (KeyError, TypeError):
        return None
    return kind


def hill_reducible(model) -> bool:
    return hill_kind(model) is not None


def _hill_operator(coeffs, dtype):
    """The constant symmetric B with n6 = B v / phi, in the internal
    sym-vec order [xx, xy, xz, yy, yz, zz]."""
    F, G, H = coeffs["F"], coeffs["G"], coeffs["H"]
    L, M, N = coeffs["L"], coeffs["M"], coeffs["N"]
    z = jnp.zeros((), dtype=dtype)
    row = lambda *es: jnp.stack(  # noqa: E731
        [jnp.asarray(e, dtype=dtype) + z for e in es])
    return jnp.stack([
        row(G + H, 0.0, 0.0, -H, 0.0, -G),
        row(0.0, N, 0.0, 0.0, 0.0, 0.0),
        row(0.0, 0.0, M, 0.0, 0.0, 0.0),
        row(-H, 0.0, 0.0, F + H, 0.0, -F),
        row(0.0, 0.0, 0.0, 0.0, L, 0.0),
        row(-G, 0.0, 0.0, -F, 0.0, F + G),
    ])


def _phi6(v, coeffs):
    """Hill effective stress of a sym-vec in internal order; matches
    ``hill_effective_stress`` on the symmetric tensor exactly."""
    F, G, H = coeffs["F"], coeffs["G"], coeffs["H"]
    L, M, N = coeffs["L"], coeffs["M"], coeffs["N"]
    return jnp.sqrt(
        F * (v[..., 3] - v[..., 5]) ** 2
        + G * (v[..., 5] - v[..., 0]) ** 2
        + H * (v[..., 0] - v[..., 3]) ** 2
        + 2.0 * L * v[..., 4] ** 2
        + 2.0 * M * v[..., 2] ** 2
        + 2.0 * N * v[..., 1] ** 2)


def _flow_stress(alpha, plastic):
    Y = plastic["flow stress"]["initial yield"]["Y"]
    return Y + combined_hardening_fun(
        alpha, plastic["flow stress"]["hardening"],
        hardening_funs=get_hardening_funs())


def _sym_vec_material(t, Q):
    """Material-frame sym-vec [xx, xy, xz, yy, yz, zz] of Q^T sym(t) Q."""
    e = 0.5 * (t + t.T)
    m = Q.T @ e @ Q
    return jnp.stack([m[0, 0], m[0, 1], m[0, 2],
                      m[1, 1], m[1, 2], m[2, 2]])


def _trial_stress(kind, xi_prev, params, U, U_prev, mu, lam):
    Q = jnp.asarray(params["rotation matrix"])
    if kind == "rate":
        deps = _sym_vec_material(
            U.grad_fields["u"] - U_prev.grad_fields["u"], Q)
        tr = deps[0] + deps[3] + deps[5]
        iso = jnp.stack([lam * tr, 0.0 * tr, 0.0 * tr,
                         lam * tr, 0.0 * tr, lam * tr])
        return xi_prev[:6] + iso + 2.0 * mu * deps
    # total form: sigma_tr = C (eps - pe_prev)
    eps = _sym_vec_material(U.grad_fields["u"], Q)
    e = eps - xi_prev[:6]
    tr = e[0] + e[3] + e[5]
    iso = jnp.stack([lam * tr, 0.0 * tr, 0.0 * tr,
                     lam * tr, 0.0 * tr, lam * tr])
    return iso + 2.0 * mu * e


def make_hill_local_solve(model, max_iters: int = 10,
                          abs_tol: float | None = None,
                          rel_tol: float | None = None,
                          line_search_settings=None):
    """Per-point ``local_solve(xi_guess, xi_prev, params, U, U_prev)``
    solving the reduced scalar system and reconstructing the full
    7-dof state (requires ``hill_reducible(model)``)."""
    kind = hill_kind(model)
    if kind is None:
        raise ValueError(f"{type(model).__name__} is not Hill-reducible")
    yield_tol = 1e-14  # both model families construct with 1e-14

    def residual1(s_vec, x_aux, params, U, U_prev):
        """Scalar residual in s; ``x_aux`` carries the reduced
        previous state [sigma_tr(6), alpha_prev]."""
        ec = ElasticConstants.from_params(params["elastic"])
        mu = ec.mu
        plastic = params["plastic"]
        coeffs = plastic["effective stress"]["hill"]
        s = s_vec[0]
        v_tr, alpha_prev = x_aux[:6], x_aux[6]
        B = _hill_operator(coeffs, v_tr.dtype)
        eye = jnp.eye(6, dtype=v_tr.dtype)
        v = small_solve(eye + s * B, v_tr)
        phi = _phi6(v, plastic["effective stress"]["hill"])
        dg = s * phi / (2.0 * mu)
        rho = (phi - _flow_stress(alpha_prev + dg, plastic)) / (2.0 * mu)
        phi_tr = _phi6(v_tr, coeffs)
        f_trial = (phi_tr - _flow_stress(alpha_prev, plastic)) \
            / (2.0 * mu)
        is_plastic = jnp.logical_or(f_trial > yield_tol,
                                    jnp.abs(f_trial) < yield_tol)
        # elastic lanes solve s = 0 (identical branch-free shape to
        # cond_residual)
        return jnp.where(is_plastic, rho, s)[None]

    solve = make_newton_solve(residual1, max_iters=max_iters,
                              abs_tol=abs_tol, rel_tol=rel_tol,
                              line_search_settings=line_search_settings)

    def local_solve(xi_guess, xi_prev, params, U, U_prev):
        del xi_guess
        ec = ElasticConstants.from_params(params["elastic"])
        mu, lam = ec.mu, ec.lmbda
        plastic = params["plastic"]
        coeffs = plastic["effective stress"]["hill"]
        v_tr = _trial_stress(kind, xi_prev, params, U, U_prev, mu, lam)
        x_aux = jnp.concatenate([v_tr, xi_prev[6:7]])
        s = solve(jnp.zeros(1, dtype=v_tr.dtype), x_aux, params, U,
                  U_prev)[0]
        B = _hill_operator(coeffs, v_tr.dtype)
        eye = jnp.eye(6, dtype=v_tr.dtype)
        v = small_solve(eye + s * B, v_tr)
        phi = _phi6(v, coeffs)
        dg = s * phi / (2.0 * mu)
        alpha = xi_prev[6] + dg
        if kind == "rate":
            state6 = v
        else:
            state6 = xi_prev[:6] + (s / (2.0 * mu)) * (B @ v)
        return jnp.concatenate([state6, alpha[None]])

    return local_solve
