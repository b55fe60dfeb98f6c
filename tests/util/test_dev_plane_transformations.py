"""Pi-plane projection matrices (parity: reference
tests/util/test_dev_plane_transformations.py)."""
from __future__ import annotations

import numpy as np

from cmad_tpu.util.dev_plane_transformations import (
    compute_forward_and_backward_matrices,
)


def test_forward_annihilates_hydrostatic_axis():
    F, B = compute_forward_and_backward_matrices()
    hydro = np.ones(3) / np.sqrt(3.0)
    assert np.allclose(F @ hydro, 0.0, atol=1e-14)


def test_roundtrip_on_deviatoric_vectors():
    F, B = compute_forward_and_backward_matrices()
    rng = np.random.RandomState(0)
    for _ in range(10):
        s = rng.normal(size=3)
        s -= s.mean()  # deviatoric
        assert np.allclose(B @ (F @ s), s, atol=1e-13)
    # pi-plane coords round-trip exactly too
    for _ in range(5):
        y = rng.normal(size=2)
        assert np.allclose(F @ (B @ y), y, atol=1e-13)


def test_scaling_preserves_deviatoric_norm():
    F, _ = compute_forward_and_backward_matrices(use_scaling=False)
    s = np.array([2.0, -0.5, -1.5])
    assert np.isclose(np.linalg.norm(F @ s), np.linalg.norm(s))
