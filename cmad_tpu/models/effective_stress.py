"""Modular effective-stress (yield) functions on 3x3 Cauchy tensors.

Parity: reference ``cmad/models/effective_stress.py`` (J2 :30, Hill :40,
Barlat :81, Hosford :168, hybrid Hill+NN :149, scaled variants :97-130).
All conventional functions are batched (leading batch dims); the scaled
variants solve an inner scalar Newton per point and are written per-point
(vmap batches them, converting the inner ``lax.cond``s to selects).
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp
from jax.lax import cond

from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.typing import JaxArray, Scalar
from cmad_tpu.util.jax_eigen_decomposition import compute_eigenvalues
from cmad_tpu.verification.functions import jax_barlat_yield


def conventional_effective_stress_fun(name: str) -> Callable[..., JaxArray]:
    table = {
        "J2": J2_effective_stress,
        "hill": hill_effective_stress,
        "barlat": barlat_effective_stress,
        "hosford": hosford_effective_stress,
        "hosford_principal": hosford_principal_effective_stress,
    }
    try:
        return table[name]
    except KeyError as e:
        raise NotImplementedError(
            f"unknown effective stress type: {name!r}") from e


def J2_effective_stress(
        cauchy: JaxArray, params: dict[str, Any] | None = None) -> JaxArray:
    """von Mises: sqrt(3/2) ||dev(sigma)||_F."""
    tr = jnp.trace(cauchy, axis1=-2, axis2=-1)[..., None, None] / 3.0
    s = cauchy - tr * jnp.eye(3, dtype=cauchy.dtype)
    return jnp.sqrt(1.5 * jnp.sum(s * s, axis=(-2, -1)))


def hill_effective_stress(cauchy: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Hill-1948 quadratic anisotropic yield; written on the full tensor
    (both off-diagonal mirror entries) so its AD normal is symmetric."""
    c = params["effective stress"]["hill"]
    F, G, H = c["F"], c["G"], c["H"]
    L, M, N = c["L"], c["M"], c["N"]
    s = cauchy
    return jnp.sqrt(
        F * (s[..., 1, 1] - s[..., 2, 2]) ** 2
        + G * (s[..., 2, 2] - s[..., 0, 0]) ** 2
        + H * (s[..., 0, 0] - s[..., 1, 1]) ** 2
        + L * (s[..., 2, 1] ** 2 + s[..., 1, 2] ** 2)
        + M * (s[..., 2, 0] ** 2 + s[..., 0, 2] ** 2)
        + N * (s[..., 1, 0] ** 2 + s[..., 0, 1] ** 2))


def flatten_barlat_params(params: dict[str, Any]) -> JaxArray:
    """Pack the 18 Yld2004-18p linear-transform coefficients + exponent."""
    c = params["effective stress"]["barlat"]
    keys = ("sp_12", "sp_13", "sp_21", "sp_23", "sp_31", "sp_32",
            "sp_44", "sp_55", "sp_66",
            "dp_12", "dp_13", "dp_21", "dp_23", "dp_31", "dp_32",
            "dp_44", "dp_55", "dp_66", "a")
    return jnp.stack([jnp.asarray(c[k]) for k in keys])


def barlat_effective_stress(cauchy: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Barlat Yld2004-18p (two linear transforms + eigenvalue form)."""
    return jax_barlat_yield(cauchy, flatten_barlat_params(params))


def hosford_effective_stress(cauchy: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Hosford (diagonal-stress form, matching the reference
    effective_stress.py:168), rescaled by the LARGEST diagonal stress
    difference (logsumexp-style) so the a-th powers live in [0, 1] with
    the max ratio pinned at exactly 1. A von-Mises rescale is NOT
    enough in float32: for stress states whose diagonal differences are
    all small relative to vm (e.g. dominated by shear), every
    ``(d/vm)**a`` underflows to 0 at a = 100 and the outer
    ``0 ** (1/a)`` produces NaN gradients that poison the whole batched
    return map."""
    a = params["effective stress"]["hosford"]["a"]
    return _hosford_phi_of_three(
        cauchy[..., 0, 0], cauchy[..., 1, 1], cauchy[..., 2, 2], a)


def _hosford_phi_of_three(v0: JaxArray, v1: JaxArray, v2: JaxArray,
                          a: Scalar) -> JaxArray:
    """Hosford combination of three (diagonal or principal) stresses,
    rescaled by the largest pairwise difference (see
    :func:`hosford_effective_stress` for why a von-Mises rescale is not
    enough in float32)."""
    d01 = jnp.abs(v0 - v1)
    d12 = jnp.abs(v1 - v2)
    d20 = jnp.abs(v2 - v0)
    m = jnp.maximum(jnp.maximum(d01, d12), d20)
    safe_m = jnp.where(m > 0.0, m, 1.0)
    base = 0.5 * ((d01 / safe_m) ** a + (d12 / safe_m) ** a
                  + (d20 / safe_m) ** a)
    # double-where: keep the unselected branch's pow off base = 0
    safe_base = jnp.where(m > 0.0, base, 1.0)
    phi = safe_m * safe_base ** (1.0 / a)
    return jnp.where(m > 0.0, phi, 0.0)


def hosford_phi_of_principal(s: JaxArray, a: Scalar) -> JaxArray:
    """Hosford effective stress of a ``(..., 3)`` vector of principal
    stresses (any order)."""
    return _hosford_phi_of_three(s[..., 0], s[..., 1], s[..., 2], a)


def hosford_principal_effective_stress(
        cauchy: JaxArray, params: dict[str, Any]) -> JaxArray:
    """Hosford 1972 on the PRINCIPAL stresses — the textbook
    frame-invariant form, valid for arbitrary (non-diagonal) stress
    states. The reference's Hosford is diagonal-only (its
    ``effective_stress.py:167`` carries "only working for diagonal
    cauchy stress now"); this variant EXCEEDS that parity while
    ``hosford`` keeps the reference behavior bit-for-bit. Eigenvalues
    come from the guarded closed-form Cardano solution
    (``util/jax_eigen_decomposition.py``), so AD gradients (the yield
    normal) stay finite at repeated principal stresses and correct in
    the divided-difference limit away from them; for diagonal inputs
    the value agrees with ``hosford`` exactly."""
    a = params["effective stress"]["hosford_principal"]["a"]
    sym = 0.5 * (cauchy + jnp.swapaxes(cauchy, -1, -2))
    eig = compute_eigenvalues(sym)
    return hosford_phi_of_principal(eig, a)


# ----------------------------------------------------------------------
# hybrid (NN-augmented) and scaled/homogenized variants
# ----------------------------------------------------------------------
def hybrid_hill_effective_stress(
        cauchy: JaxArray, params: dict[str, Any],
        nn_fun: Callable[..., JaxArray]) -> JaxArray:
    """Hill + NN discrepancy on the (symmetrized) deviator components."""
    phi_hill = hill_effective_stress(cauchy, params)
    tr = jnp.trace(cauchy, axis1=-2, axis2=-1)[..., None, None] / 3.0
    dev = cauchy - tr * jnp.eye(3, dtype=cauchy.dtype)
    s = 0.5 * (dev + jnp.swapaxes(dev, -1, -2))
    flat_s = jnp.stack([s[..., 0, 0], s[..., 1, 1], s[..., 2, 2],
                        s[..., 0, 1], s[..., 0, 2], s[..., 1, 2]], axis=-1)
    phi_nn = nn_fun(flat_s, params["effective stress"]["neural network"])
    return phi_hill + phi_nn[..., 0]


def beta_initial_guess(
        cauchy: JaxArray, equivalent_stress: Scalar,
        tol: float = 1e-14) -> JaxArray:
    """Initial scaling guess Y/phi_J2; -1 sentinel when J2 ~ 0."""
    phi_J2 = J2_effective_stress(cauchy)
    near_zero = jnp.isclose(phi_J2, 0.0, tol, tol)
    guess = equivalent_stress / jnp.where(near_zero, 1.0, phi_J2)
    return jnp.where(near_zero, -1.0, guess)


def beta_make_newton_solve(
        effective_stress_fun: Callable[..., JaxArray],
        equivalent_stress: Scalar,
        max_iters: int = 10,
        abs_tol: float = 1e-14,
        rel_tol: float = 1e-14,
) -> Callable[..., JaxArray]:
    """Newton update for the scaling beta with phi(beta*sigma) = Y.

    The IFT custom_jvp in make_newton_solve keeps this inner solve
    differentiable w.r.t. both cauchy and params.
    """
    def residual(beta, cauchy, params):
        return effective_stress_fun(beta * cauchy, params) \
            / equivalent_stress - 1.0

    return make_newton_solve(residual, max_iters, abs_tol, rel_tol)


def make_safe_update_fun(
        initial_guess: JaxArray, cauchy: JaxArray, params: dict[str, Any],
        update_fun: Callable[..., JaxArray]) -> JaxArray:
    """Guard the beta solve against the J2 ~ 0 sentinel."""
    return cond(initial_guess < 0.0, lambda g, c, p: jnp.asarray(1.0, g.dtype),
                update_fun, initial_guess, cauchy, params)


def scaled_effective_stress(
        cauchy: JaxArray, params: dict[str, Any],
        effective_stress_fun: Callable[..., JaxArray],
        update_fun: Callable[..., JaxArray],
        tol: float = 1e-14) -> JaxArray:
    """Homogenized (degree-one) version of an arbitrary yield function:
    phi_scaled(sigma) = phi(beta sigma)/beta with beta from the inner
    Newton so phi(beta sigma) = Y."""
    phi_J2 = J2_effective_stress(cauchy)
    near_zero = jnp.isclose(phi_J2, 0.0, tol, tol)
    guess = params["flow stress"]["initial yield"]["Y"] \
        / jnp.where(near_zero, 1.0, phi_J2)
    beta = update_fun(guess, cauchy, params)

    def phi_beta(c, p, b):
        return effective_stress_fun(b * c, p) / b

    return cond(near_zero, lambda c, p, b: phi_J2, phi_beta,
                cauchy, params, beta)


def scaled_hybrid_hill_effective_stress(
        cauchy: JaxArray, params: dict[str, Any],
        nn_fun: Callable[..., JaxArray],
        safe_update: Callable[..., JaxArray]) -> JaxArray:
    """Degree-one homogenized hybrid Hill+NN yield."""
    Y = params["flow stress"]["initial yield"]["Y"]
    beta = safe_update(beta_initial_guess(cauchy, Y), cauchy, params)
    return hybrid_hill_effective_stress(beta * cauchy, params, nn_fun) / beta
