"""Voxel filter tests mirroring cartographer/sensor/internal/voxel_filter_test.cc."""

import jax.numpy as jnp
import numpy as np

from dliom_tpu.ops.voxel_filter import (
    adaptive_voxel_filter,
    truncate_cloud,
    voxel_filter,
)


def _cloud(pts):
    pts = jnp.asarray(pts, jnp.float32)
    n = pts.shape[0]
    return pts, jnp.zeros(n, jnp.float32), jnp.ones(n, bool)


def test_returns_one_point_per_voxel_first_wins():
    # voxel_filter_test.cc ReturnsOnePointInEachVoxel
    pts, t, m = _cloud([[0.0, 0.0, 0.0], [0.1, -0.1, 0.3], [0.3, -0.1, 0.0],
                        [0.0, 0.0, 0.1]])
    out = voxel_filter(pts, t, m, 0.3)
    got = np.asarray(out.points)[np.asarray(out.mask)]
    # voxels (round(p/0.3)): [0,0,0],[0,0,1],[1,0,0],[0,0,0] → 3 survivors,
    # first-in-order per voxel
    assert got.shape[0] == 3
    np.testing.assert_allclose(
        sorted(got.tolist()), sorted([[0.0, 0.0, 0.0], [0.1, -0.1, 0.3], [0.3, -0.1, 0.0]])
    )


def test_handles_large_coordinates():
    # Within the +-192 m key window (640 cells at 0.3 m), distinct voxels
    # stay distinct; coordinates beyond it alias onto the boundary shell
    # (sensor points are always within max_range << 192 m).
    pts, t, m = _cloud(
        [[150.0, 0.0, 0.0], [150.0001, 0.0, 0.0], [150.4, 0.0, 0.0],
         [-180.0, 0.0, 0.0]]
    )
    out = voxel_filter(pts, t, m, 0.3)
    assert int(jnp.sum(out.mask)) == 3
    far, ft, fm = _cloud([[1e5, 0.0, 0.0], [2e5, 0.0, 0.0]])
    out2 = voxel_filter(far, ft, fm, 0.3)
    assert int(jnp.sum(out2.mask)) == 1  # both clamp to the boundary voxel


def test_respects_mask():
    pts, t, m = _cloud([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    m = jnp.asarray([True, False])
    out = voxel_filter(pts, t, m, 0.3)
    assert int(jnp.sum(out.mask)) == 1
    np.testing.assert_allclose(np.asarray(out.points[0]), [0.0, 0.0, 0.0])


def test_times_carried_through():
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    t = jnp.asarray([-0.05, -0.01], jnp.float32)
    out = voxel_filter(pts, t, jnp.ones(2, bool), 0.3)
    kept = np.asarray(out.times)[np.asarray(out.mask)]
    np.testing.assert_allclose(sorted(kept), [-0.05, -0.01], atol=1e-6)


def test_adaptive_filter_sparse_input_passthrough():
    # fewer than min_num_points -> untouched (voxel_filter.cc:39-42)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(30, 3)).astype(np.float32)
    out = adaptive_voxel_filter(
        jnp.asarray(pts), jnp.zeros(30), jnp.ones(30, bool),
        max_length=2.0, min_num_points=100, max_range=50.0,
    )
    assert int(jnp.sum(out.mask)) == 30


def test_adaptive_filter_reaches_min_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, size=(5000, 3)).astype(np.float32)
    out = adaptive_voxel_filter(
        jnp.asarray(pts), jnp.zeros(5000), jnp.ones(5000, bool),
        max_length=4.0, min_num_points=200, max_range=50.0,
    )
    count = int(jnp.sum(out.mask))
    assert count >= 200
    # but not unfiltered: must be fewer than the input
    assert count < 5000


def test_adaptive_filter_max_range():
    pts = jnp.asarray([[1.0, 0.0, 0.0], [30.0, 0.0, 0.0]], jnp.float32)
    out = adaptive_voxel_filter(
        pts, jnp.zeros(2), jnp.ones(2, bool),
        max_length=2.0, min_num_points=10, max_range=15.0,
    )
    got = np.asarray(out.points)[np.asarray(out.mask)]
    np.testing.assert_allclose(got, [[1.0, 0.0, 0.0]])


def test_truncate_cloud():
    pts = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    from dliom_tpu.ops.voxel_filter import FilteredCloud

    cloud = FilteredCloud(pts, jnp.zeros(10), jnp.ones(10, bool))
    small = truncate_cloud(cloud, 4)
    assert small.points.shape == (4, 3) and int(jnp.sum(small.mask)) == 4
    big = truncate_cloud(cloud, 16)
    assert big.points.shape == (16, 3) and int(jnp.sum(big.mask)) == 10
