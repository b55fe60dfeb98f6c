"""NumPy flavor of the closed-form symmetric 3x3 eigendecomposition.

Parity: reference ``cmad/util/numpy_eigen_decomposition.py:79-158``. Host
verification oracle for the jax implementation.
"""
from __future__ import annotations

import numpy as np


def compute_deviator_eigenvalues(A: np.ndarray) -> np.ndarray:
    q = np.trace(A) / 3.0
    B = A - q * np.eye(3)
    J2 = np.sum(B * B) / 6.0
    p = np.sqrt(max(J2, 0.0))
    if p < 1e-30:
        return np.zeros(3)
    r = np.clip(np.linalg.det(B) / (2.0 * p**3), -1.0, 1.0)
    theta = np.arccos(r) / 3.0
    two_pi_3 = 2.0 * np.pi / 3.0
    return np.array([
        2.0 * p * np.cos(theta),
        2.0 * p * np.cos(theta - two_pi_3),
        2.0 * p * np.cos(theta + two_pi_3),
    ])


def compute_eigenvalues(A: np.ndarray) -> np.ndarray:
    return compute_deviator_eigenvalues(A) + np.trace(A) / 3.0


def compute_eigen_decomposition(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigen-pairs via numpy's symmetric solver (host-side oracle)."""
    eigenvalues, eigenvectors = np.linalg.eigh(A)
    return eigenvalues, eigenvectors


def sorted_eigen_decomposition(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    eigenvalues, eigenvectors = compute_eigen_decomposition(A)
    order = np.argsort(eigenvalues)
    return eigenvalues[order], eigenvectors[:, order]
