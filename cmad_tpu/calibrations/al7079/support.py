"""Support code for the Al-7079 calibration studies.

Parity: reference ``cmad/calibrations/al7079/support.py``. Data and
published fits from https://doi.org/10.1016/j.ijsolstr.2020.11.030:
uniaxial compression strengths and transverse-strain r-ratios of slab
specimens cut at angles (alpha, beta, gamma rotation families).
"""
from __future__ import annotations

import numpy as np
from jax.tree_util import tree_map

from cmad_tpu.parameters.parameters import Parameters

DEG = np.pi / 180.0


def compute_R(orig_basis: np.ndarray) -> np.ndarray:
    """Rotation matrix mapping the standard basis onto ``orig_basis``
    rows: R[i, j] = e_i . b_j."""
    return np.eye(3) @ orig_basis.T


def compute_rotation_A(alpha: float) -> np.ndarray:
    basis = np.array([
        [-1.0, 0.0, 0.0],
        [0.0, np.sin(alpha), np.cos(alpha)],
        [0.0, np.cos(alpha), -np.sin(alpha)]])
    return compute_R(basis)


def compute_rotation_B(beta: float) -> np.ndarray:
    basis = np.array([
        [0.0, np.sin(beta), np.cos(beta)],
        [1.0, 0.0, 0.0],
        [0.0, np.cos(beta), -np.sin(beta)]])
    return compute_R(basis)


def compute_rotation_C(gamma: float) -> np.ndarray:
    basis = np.array([
        [np.cos(gamma), np.sin(gamma), 0.0],
        [-np.sin(gamma), np.cos(gamma), 0.0],
        [0.0, 0.0, 1.0]])
    return compute_R(basis)


def slab_data(angle_type: str):
    """(angles, sigma_c, r_ratio, rotation matrices) for one specimen
    family."""
    if angle_type == "alpha":
        angles = np.array([0., 15., 30., 45., 60., 75., 90.]) * DEG
        sigma_c = np.array([525., 512., 515., 505., 493., 511., 530.])
        ratio_c = np.array([0.18, 0.27, 0.75, 1.2, 1.0, 0.7, 0.91])
        rot = compute_rotation_A
    elif angle_type == "beta":
        angles = np.array([45., 60., 90.]) * DEG
        sigma_c = np.array([510., 544., 523.])
        ratio_c = np.array([2.9, 1.5, 1.1])
        rot = compute_rotation_B
    elif angle_type == "gamma":
        angles = np.array([45., 60.]) * DEG
        sigma_c = np.array([486., 485.])
        ratio_c = np.array([0.47, 0.52])
        rot = compute_rotation_C
    else:
        raise ValueError(f"unknown angle_type {angle_type!r}")
    return angles, sigma_c, ratio_c, [rot(a) for a in angles]


def all_slab_data():
    """Concatenated (sigma_c, ratio_c, R matrices) across all families."""
    sigmas, ratios, Rs = [], [], []
    for family in ("alpha", "beta", "gamma"):
        _, s, r, R = slab_data(family)
        sigmas.append(s)
        ratios.append(r)
        Rs.extend(R)
    return np.concatenate(sigmas), np.concatenate(ratios), Rs


def calibration_weights() -> np.ndarray:
    """(weight_sigma, weight_ratio)."""
    return np.array([10.0, 1.0])


def calibrated_hill_coefficients() -> np.ndarray:
    """Published Hill fit (F, G, H, L, M, N)."""
    return np.array([0.1477, 0.6805, 0.5345, 1.7977, 1.7148, 2.1675])


def calibrated_barlat_coefficients() -> np.ndarray:
    """Published Yld2004-18p fit (18 transform coefficients + a)."""
    return np.array([
        0.4555, 1.0274, 0.7101, 1.3755, 0.5314, 0.8817, 1.0558, 1.1133,
        0.9220,
        1.2431, 1.5438, 1.2204, 0.7632, 0.5327, 0.3015, 0.9722, 0.7399,
        1.0760,
        18.2])


ELASTIC_AL7079 = np.array([70.22857142857143e3, 0.33396551724137924])


def params_hill_voce(p_elastic=None, p_hill=None, p_voce=None,
                     hill_active: bool = True) -> Parameters:
    """Hill+Voce Parameters with the Hill coefficients active (bounds
    [0.1, 3]) for calibration."""
    E, nu = p_elastic if p_elastic is not None else ELASTIC_AL7079
    if p_hill is None:
        p_hill = np.r_[525.0, calibrated_hill_coefficients()]
    Y, F, G, H, L, M, N = p_hill
    S, D = p_voce if p_voce is not None else (1.0, 200.0)

    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": float(E), "nu": float(nu)},
        "plastic": {
            "effective stress": {"hill": {
                "F": float(F), "G": float(G), "H": float(H),
                "L": float(L), "M": float(M), "N": float(N)}},
            "flow stress": {
                "initial yield": {"Y": float(Y)},
                "hardening": {"voce": {"S": float(S), "D": float(D)}}}}}

    flags = tree_map(lambda _: False, values)
    transforms = tree_map(lambda _: None, values)
    if hill_active:
        for key in "FGHLMN":
            flags["plastic"]["effective stress"]["hill"][key] = True
            transforms["plastic"]["effective stress"]["hill"][key] = \
                [0.1, 3.0]
    return Parameters(values, flags, transforms)
