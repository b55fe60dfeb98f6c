"""Deviatoric pi-plane projection matrices (yield-surface plotting).

Parity: reference ``cmad/util/dev_plane_transformations.py:8-70``; see
Borja, *Plasticity* (Springer), section 3.2.
"""
from __future__ import annotations

import numpy as np


def compute_forward_and_backward_matrices(use_scaling: bool = False):
    """(F, B): F maps deviatoric principal stresses to pi-plane coords,
    B maps pi-plane coords back into deviatoric principal space."""
    s2 = np.sqrt(2.0) / 2.0
    # rotate pi/4 about s_2
    R1 = np.array([[s2, 0.0, -s2],
                   [0.0, 1.0, 0.0],
                   [s2, 0.0, s2]])
    # rotate -arccos(sqrt(2/3)) about s'_1
    R2 = np.array([[1.0, 0.0, 0.0],
                   [0.0, np.sqrt(2.0 / 3.0), -np.sqrt(1.0 / 3.0)],
                   [0.0, np.sqrt(1.0 / 3.0), np.sqrt(2.0 / 3.0)]])

    P = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0]])
    L = np.array([[1.0, 0.0],
                  [0.0, 1.0],
                  [0.0, 0.0]])
    if use_scaling:
        P = P * np.sqrt(3.0 / 2.0)
        L = L * np.sqrt(2.0 / 3.0)

    forward = P @ R2 @ R1
    backward = R1.T @ R2.T @ L
    return forward, backward


def compute_matrix_from_projection(projection_values, projection_basis):
    assert len(projection_values) == 3
    assert projection_basis.shape == (3, 3)
    return projection_basis @ np.diag(projection_values) @ projection_basis.T


def setup_dev_plane_plot(axis_scale_factor: float = 1.0):
    """Axes with the three deviatoric principal directions drawn."""
    import matplotlib.pyplot as plt

    t = np.array([-1.0, 1.0]) * axis_scale_factor
    s1 = np.column_stack((np.sqrt(3.0) / 2.0 * t, -0.5 * t))
    s2 = np.column_stack((0.0 * t, t))
    s3 = np.column_stack((-s1[:, 0], s1[:, 1]))

    fig, ax = plt.subplots(figsize=(11, 8))
    for axis in (s1, s2, s3):
        ax.plot(axis[:, 0], axis[:, 1], color="black", zorder=0)
    ax.axis("equal")
    return fig, ax
