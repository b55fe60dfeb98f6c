"""Two-level setup units: aggregation, centered rigid-body blocks,
pattern guards (regression coverage for the round-1 advisor findings
on degenerate-axis binning and rank-deficient aggregates)."""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.two_level import (
    _aggregate_nodes,
    _centered_rbm_blocks,
    build_two_level_pattern,
    build_two_level_pattern_mixed,
)


def _cloud(n=500, seed=0):
    return np.random.RandomState(seed).uniform(size=(n, 3))


def test_aggregation_covers_all_nodes_near_target():
    coords = _cloud()
    agg, n_aggs = _aggregate_nodes(coords, target=50)
    assert agg.shape == (coords.shape[0],)
    assert agg.min() == 0 and agg.max() == n_aggs - 1
    assert set(np.unique(agg)) == set(range(n_aggs))
    # within a factor ~4 of the requested aggregate count
    assert 500 // 50 / 4 <= n_aggs <= 4 * (500 // 50)


def test_aggregation_near_planar_mesh_is_safe():
    """A ~zero-span axis must not explode the bin ids (advisor
    finding: 1e-30 spans overflowed the flat id and merged far-apart
    nodes)."""
    coords = _cloud()
    coords[:, 2] *= 1e-30
    agg, n_aggs = _aggregate_nodes(coords, target=50)
    assert n_aggs > 1
    # far-apart nodes in x stay in different aggregates
    left = agg[coords[:, 0] < 0.1]
    right = agg[coords[:, 0] > 0.9]
    assert not set(left.tolist()) & set(right.tolist())


def test_aggregation_single_point_cloud():
    coords = np.zeros((10, 3))
    agg, n_aggs = _aggregate_nodes(coords, target=4)
    assert n_aggs == 1
    assert np.all(agg == 0)


def test_rbm_blocks_annihilate_rigid_rotation():
    coords = _cloud(100)
    agg, n_aggs = _aggregate_nodes(coords, target=30)
    B = _centered_rbm_blocks(coords, agg, n_aggs, np.float64)
    # a rigid rotation about each aggregate's centroid lies exactly in
    # the span of the rotational modes
    omega = np.array([0.3, -0.2, 0.5])
    centroids = np.stack([
        coords[agg == a].mean(axis=0) for a in range(n_aggs)])
    r = coords - centroids[agg]
    rigid = np.cross(omega, r)                      # (n, 3)
    # coefficients: modes 3..5 are e_k x r, so rigid = B[:, :, 3:6] @ omega
    recon = np.einsum("ncm,m->nc", B[:, :, 3:6], omega)
    np.testing.assert_allclose(recon, rigid, atol=1e-12)


def test_pattern_shapes_and_masking():
    coords = _cloud(64)
    prescribed = np.array([0, 1, 2, 5])
    p = build_two_level_pattern(coords, prescribed, 3 * 64, 16)
    assert p.P_vals.shape == (192, 6)
    assert p.width == 6
    assert p.coarse_dim == 6 * p.num_aggregates
    assert np.all(p.P_vals[prescribed] == 0.0)
    # column norms are <= 1 after per-aggregate normalization
    sq = np.zeros((p.num_aggregates, 6))
    np.add.at(sq, np.asarray(p.agg_of_dof), np.asarray(p.P_vals) ** 2)
    assert np.all(sq <= 1.0 + 1e-12)


def test_pattern_rejects_wrong_layout():
    coords = _cloud(10)
    with pytest.raises(ValueError, match="3 dofs/node"):
        build_two_level_pattern(coords, np.array([]), 31, 4)
    with pytest.raises(ValueError, match="u \\(3/node\\)"):
        build_two_level_pattern_mixed(coords, np.array([]), 31, 4)


def test_mixed_pattern_pressure_slot():
    coords = _cloud(27)
    p = build_two_level_pattern_mixed(coords, np.array([]), 4 * 27, 9)
    assert p.width == 7
    P = np.asarray(p.P_vals)
    # u rows never touch the pressure slot; p rows only the pressure slot
    assert np.all(P[: 3 * 27, 6] == 0.0)
    assert np.all(P[3 * 27:, :6] == 0.0)
    assert np.all(P[3 * 27:, 6] > 0.0)
