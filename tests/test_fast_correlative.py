"""Loop-closure correlative matcher tests (fast_correlative_scan_matcher_3d_test.cc
analog): insert a known cloud into grids, search from a perturbed initial
pose, assert recovery; plus pyramid admissibility checks."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend.fast_correlative import CorrelativeResult, match
from dliom_tpu.backend.precomputation import (
    build_pyramid,
    lookup,
    to_precomputation_values,
)
from dliom_tpu.common.config import FastCorrelativeConfig
from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec, cell_index, make_grid, set_cells
from dliom_tpu.ops.rotational_histogram import compute_histogram
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw, quat_yaw

HIGH_SPEC = GridSpec(resolution=0.2, extent=128)
LOW_SPEC = GridSpec(resolution=0.8, extent=64)


def _world_cloud(rng, n=1200):
    """Structured cloud: two walls + floor (yaw-observable)."""
    wall_a = np.stack(
        [np.full(n // 3, 8.0), rng.uniform(-6, 6, n // 3), rng.uniform(-2, 2, n // 3)], -1
    )
    wall_b = np.stack(
        [rng.uniform(-6, 6, n // 3), np.full(n // 3, -7.0), rng.uniform(-2, 2, n // 3)], -1
    )
    floor = np.stack(
        [rng.uniform(-6, 6, n - 2 * (n // 3)), rng.uniform(-6, 6, n - 2 * (n // 3)),
         np.full(n - 2 * (n // 3), -2.0)], -1
    )
    return np.concatenate([wall_a, wall_b, floor]).astype(np.float32)


def _build_scene(expected_pose: Rigid3, points: np.ndarray):
    world = expected_pose.apply(jnp.asarray(points))
    vals = jnp.full((points.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    g_hi = set_cells(
        make_grid(HIGH_SPEC), cell_index(world, HIGH_SPEC.resolution), vals, HIGH_SPEC
    )
    g_lo = set_cells(
        make_grid(LOW_SPEC), cell_index(world, LOW_SPEC.resolution), vals, LOW_SPEC
    )
    return g_hi, g_lo


def test_pyramid_admissible_upper_bound():
    rng = np.random.default_rng(0)
    spec = GridSpec(resolution=0.5, extent=32)
    g = make_grid(spec)
    cells = jnp.asarray(rng.integers(-12, 12, size=(80, 3)), jnp.int32)
    vals = jnp.asarray(rng.integers(1, 32768, size=(80,)), jnp.int32)
    g = set_cells(g, cells, vals, spec)
    pyr = build_pyramid(g, spec, depth=4, full_resolution_depth=2)
    base = to_precomputation_values(g).reshape(32, 32, 32)
    # level 1 (full res): value >= max over the 2-cube at each cell
    l1 = np.asarray(pyr.levels[1])
    b = np.asarray(base)
    for _ in range(20):
        i, j, k = rng.integers(0, 30, 3)
        window_max = b[i : i + 2, j : j + 2, k : k + 2].max()
        assert l1[i, j, k] >= window_max
        assert l1[i, j, k] == window_max  # exact for full-res levels
    # level shapes: halving beyond full_resolution_depth
    assert pyr.levels[0].shape == (32, 32, 32)
    assert pyr.levels[1].shape == (32, 32, 32)
    assert pyr.levels[2].shape == (16, 16, 16)
    assert pyr.levels[3].shape == (8, 8, 8)


def _run_match(expected_pose, initial_pose, cfg=None, min_score=0.3):
    rng = np.random.default_rng(1)
    points = _world_cloud(rng)
    g_hi, g_lo = _build_scene(expected_pose, points)
    pyr = build_pyramid(
        g_hi, HIGH_SPEC, depth=6, full_resolution_depth=3
    )
    cfg = cfg or FastCorrelativeConfig(
        branch_and_bound_depth=6,
        full_resolution_depth=3,
        min_rotational_score=0.3,
        min_low_resolution_score=0.4,
        linear_xy_search_window=4.0,
        linear_z_search_window=2.0,
        angular_search_window=math.radians(30.0),
    )
    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    hist = compute_histogram(pts, mask, 120)
    # submap reference histogram = histogram of the scene content (the node
    # cloud as inserted, i.e. in the submap frame)
    submap_hist = compute_histogram(expected_pose.apply(pts), mask, 120)
    return match(
        pyr, HIGH_SPEC, g_lo, LOW_SPEC,
        pts, mask, pts, mask,
        initial_pose, hist, submap_hist, jnp.float32(0.0),
        cfg, min_score, num_angles=31, beam_width=256,
    )


def test_recovers_translation_offset():
    expected = Rigid3.translation_only(jnp.asarray([1.0, -0.6, 0.4]))
    initial = Rigid3.identity()
    res = _run_match(expected, initial)
    assert bool(res.found)
    np.testing.assert_allclose(
        np.asarray(res.pose.translation), [1.0, -0.6, 0.4], atol=HIGH_SPEC.resolution
    )
    assert float(res.score) > 0.6


def test_recovers_yaw_and_translation():
    # yaw chosen on the candidate-angle grid (31 angles over +-30 deg)
    yaw = math.radians(30.0) / 15 * 9  # = 0.349*9/15 ≈ 0.3142... exact grid pt
    expected = Rigid3(
        rotation=quat_from_yaw(jnp.float32(yaw)),
        translation=jnp.asarray([2.0, 1.5, -0.5]),
    )
    initial = Rigid3.identity()
    res = _run_match(expected, initial)
    assert bool(res.found)
    np.testing.assert_allclose(
        np.asarray(res.pose.translation),
        np.asarray(expected.translation),
        atol=2 * HIGH_SPEC.resolution,
    )
    assert abs(float(quat_yaw(res.pose.rotation)) - yaw) < 0.05


def test_no_match_in_empty_region():
    # scene built far away; searching near the origin must fail the gates
    expected = Rigid3.translation_only(jnp.asarray([30.0, 30.0, 5.0]))
    rng = np.random.default_rng(1)
    points = _world_cloud(rng)
    g_hi, g_lo = _build_scene(expected, points)
    pyr = build_pyramid(g_hi, HIGH_SPEC, depth=6, full_resolution_depth=3)
    cfg = FastCorrelativeConfig(
        branch_and_bound_depth=6, full_resolution_depth=3,
        min_rotational_score=0.0, min_low_resolution_score=0.4,
        linear_xy_search_window=2.0, linear_z_search_window=1.0,
        angular_search_window=math.radians(10.0),
    )
    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    hist = compute_histogram(pts, mask, 120)
    res = match(
        pyr, HIGH_SPEC, g_lo, LOW_SPEC, pts, mask, pts, mask,
        Rigid3.identity(), hist, hist, jnp.float32(0.0), cfg,
        min_score=0.45, num_angles=11,
    )
    assert not bool(res.found)


def test_match_with_initial_single_angle():
    # MatchWith3DofInitial mode: single discrete scan at the initial yaw
    expected = Rigid3.translation_only(jnp.asarray([0.8, 0.4, 0.2]))
    rng = np.random.default_rng(1)
    points = _world_cloud(rng)
    g_hi, g_lo = _build_scene(expected, points)
    pyr = build_pyramid(g_hi, HIGH_SPEC, depth=6, full_resolution_depth=3)
    cfg = FastCorrelativeConfig(
        branch_and_bound_depth=6, full_resolution_depth=3,
        min_rotational_score=0.0, min_low_resolution_score=0.4,
        linear_xy_search_window=2.0, linear_z_search_window=1.0,
        angular_search_window=0.0,
    )
    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    hist = compute_histogram(pts, mask, 120)
    res = match(
        pyr, HIGH_SPEC, g_lo, LOW_SPEC, pts, mask, pts, mask,
        Rigid3.identity(), hist, hist, jnp.float32(0.0), cfg,
        min_score=0.3, num_angles=1, use_rotational_gate=False,
    )
    assert bool(res.found)
    np.testing.assert_allclose(
        np.asarray(res.pose.translation), [0.8, 0.4, 0.2], atol=HIGH_SPEC.resolution
    )


def test_rotate_histogram_matches_rotated_cloud():
    # Locks the rotation convention: the histogram of a yaw-rotated cloud
    # equals rotate_histogram(histogram, yaw) (RotationalScanMatcher ctor
    # semantics).
    from dliom_tpu.ops.rotational_histogram import (
        compute_histogram,
        match_histograms,
        rotate_histogram,
    )

    # A rough structured cloud (noisy walls) spreads the histogram over
    # several buckets — perfectly planar walls concentrate all mass in one
    # 1.5-degree bucket where half-bucket quantization of the rotation
    # destroys cosine similarity (a property shared with the reference).
    rng = np.random.default_rng(5)
    raw = _world_cloud(rng, 900)
    raw += rng.normal(0.0, 0.35, raw.shape).astype(np.float32)
    pts = jnp.asarray(raw)
    mask = jnp.ones(pts.shape[0], bool)
    h0 = compute_histogram(pts, mask, 120)
    yaw = 0.6
    rot = Rigid3.rotation_only(quat_from_yaw(jnp.float32(yaw)))
    h1 = compute_histogram(rot.apply(pts), mask, 120)
    hr = rotate_histogram(h0, jnp.float32(yaw))
    sim_rot = float(
        jnp.dot(hr, h1) / (jnp.linalg.norm(hr) * jnp.linalg.norm(h1))
    )
    sim_raw = float(jnp.dot(h0, h1) / (jnp.linalg.norm(h0) * jnp.linalg.norm(h1)))
    assert sim_rot > 0.7, sim_rot
    assert sim_rot > sim_raw + 0.1
    # match_histograms peaks near the true yaw
    angles = jnp.linspace(-1.0, 1.0, 41)
    scores = match_histograms(h0, h1, angles)
    best = float(angles[int(jnp.argmax(scores))])
    assert abs(best - yaw) < 0.11
