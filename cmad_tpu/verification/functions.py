"""Analytical yield functions and normals — the test-oracle layer.

Parity: reference ``cmad/verification/functions.py:7-138``. The numpy
versions are hand-derived oracles; the jax versions are traceable forms
used by the models themselves (Barlat in particular). All jax forms are
batched.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.util.jax_eigen_decomposition import compute_eigenvalues


def J2_yield(cauchy: np.ndarray) -> float:
    s = cauchy - np.trace(cauchy) / 3.0 * np.eye(3)
    return float(np.sqrt(1.5) * np.linalg.norm(s))


def J2_yield_normal(cauchy: np.ndarray) -> np.ndarray:
    s = cauchy - np.trace(cauchy) / 3.0 * np.eye(3)
    return np.sqrt(1.5) * s / np.linalg.norm(s)


def hill_yield(cauchy: np.ndarray, hill_params) -> float:
    """Hill-1948 with the symmetric-stress convention (2L, 2M, 2N on the
    single shear entries)."""
    F, G, H, L, M, N = hill_params
    return float(np.sqrt(
        F * (cauchy[1, 1] - cauchy[2, 2]) ** 2
        + G * (cauchy[2, 2] - cauchy[0, 0]) ** 2
        + H * (cauchy[0, 0] - cauchy[1, 1]) ** 2
        + 2.0 * (L * cauchy[1, 2] ** 2
                 + M * cauchy[0, 2] ** 2
                 + N * cauchy[0, 1] ** 2)))


def hill_yield_normal(cauchy: np.ndarray, hill_params) -> np.ndarray:
    """Analytic Hill normal (symmetric-stress convention)."""
    F, G, H, L, M, N = hill_params
    n00 = (G + H) * cauchy[0, 0] - H * cauchy[1, 1] - G * cauchy[2, 2]
    n11 = (F + H) * cauchy[1, 1] - H * cauchy[0, 0] - F * cauchy[2, 2]
    n22 = (G + F) * cauchy[2, 2] - G * cauchy[0, 0] - F * cauchy[1, 1]
    n01 = N * cauchy[0, 1]
    n02 = M * cauchy[0, 2]
    n12 = L * cauchy[1, 2]
    normal = np.array([[n00, n01, n02],
                       [n01, n11, n12],
                       [n02, n12, n22]])
    return normal / hill_yield(cauchy, hill_params)


def jax_hill_yield(cauchy, hill_params):
    """Full-tensor (AD-safe) Hill form; batched."""
    F, G, H, L, M, N = hill_params
    s = cauchy
    return jnp.sqrt(
        F * (s[..., 1, 1] - s[..., 2, 2]) ** 2
        + G * (s[..., 2, 2] - s[..., 0, 0]) ** 2
        + H * (s[..., 0, 0] - s[..., 1, 1]) ** 2
        + L * (s[..., 2, 1] ** 2 + s[..., 1, 2] ** 2)
        + M * (s[..., 2, 0] ** 2 + s[..., 0, 2] ** 2)
        + N * (s[..., 1, 0] ** 2 + s[..., 0, 1] ** 2))


# ----------------------------------------------------------------------
# Barlat Yld2004-18p
# ----------------------------------------------------------------------
# The transform matrices act on the 9-slot flattened stress in the order
# [00, 11, 22, 01, 12, 20, 10, 21, 02] (reference functions.py:105-135).
_FLAT_RC = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (2, 0),
            (1, 0), (2, 1), (0, 2))


def jax_flatten_stress(stress):
    return jnp.stack([stress[..., r, c] for r, c in _FLAT_RC], axis=-1)


def jax_unflatten_stress(flat):
    rows = [
        jnp.stack([flat[..., 0], flat[..., 3], flat[..., 8]], axis=-1),
        jnp.stack([flat[..., 6], flat[..., 1], flat[..., 4]], axis=-1),
        jnp.stack([flat[..., 5], flat[..., 7], flat[..., 2]], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _barlat_L(c12, c13, c21, c23, c31, c32, c44, c55, c66):
    """One 9x9 Yld2004 linear transform from its 9 coefficients."""
    upper = jnp.array([
        [c12 + c13, -2.0 * c12 + c13, c12 - 2.0 * c13],
        [-2.0 * c21 + c23, c21 + c23, c21 - 2.0 * c23],
        [-2.0 * c31 + c32, c31 - 2.0 * c32, c31 + c32]]) / 3.0
    shear = jnp.diag(jnp.stack([c44, c55, c66]))
    L = jnp.zeros((9, 9), dtype=upper.dtype)
    L = L.at[:3, :3].set(upper)
    L = L.at[3:6, 3:6].set(shear)
    return L.at[6:9, 6:9].set(shear)


def jax_unpack_barlat_params(barlat_params):
    L_sp = _barlat_L(*[barlat_params[i] for i in range(9)])
    L_dp = _barlat_L(*[barlat_params[9 + i] for i in range(9)])
    return L_sp, L_dp


def jax_compute_sbar_matrices(cauchy, barlat_params):
    L_sp, L_dp = jax_unpack_barlat_params(barlat_params)
    flat = jax_flatten_stress(cauchy)
    sbar_sp = jax_unflatten_stress(flat @ L_sp.T)
    sbar_dp = jax_unflatten_stress(flat @ L_dp.T)
    return sbar_sp, sbar_dp


def jax_barlat_yield(cauchy, barlat_params):
    """Yld2004-18p effective stress; batched over leading dims of cauchy."""
    a = barlat_params[-1]
    sbar_sp, sbar_dp = jax_compute_sbar_matrices(cauchy, barlat_params)
    # symmetrize: the linear transforms of a symmetric stress stay symmetric
    # analytically, but the 9-slot form keeps both mirror entries, and the
    # closed-form eigensolver expects exact symmetry
    sbar_sp = 0.5 * (sbar_sp + jnp.swapaxes(sbar_sp, -1, -2))
    sbar_dp = 0.5 * (sbar_dp + jnp.swapaxes(sbar_dp, -1, -2))
    ev_sp = compute_eigenvalues(sbar_sp)
    ev_dp = compute_eigenvalues(sbar_dp)
    diffs = ev_sp[..., :, None] - ev_dp[..., None, :]
    phi_a = 0.25 * jnp.sum(jnp.abs(diffs) ** a, axis=(-2, -1))
    return phi_a ** (1.0 / a)
