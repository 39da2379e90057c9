"""Real-time correlative matcher tests (real_time_correlative_scan_matcher_3d
analog): exhaustive local search recovers a small offset."""

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec, cell_index, make_grid, set_cells
from dliom_tpu.ops.real_time_correlative import match
from dliom_tpu.transform.rigid import Rigid3


def _world(rng, n=600):
    # box walls
    pts = []
    for _ in range(n):
        axis = rng.integers(0, 3)
        sign = rng.choice([-1.0, 1.0])
        p = rng.uniform(-4, 4, 3)
        p[axis] = sign * 4.0
        pts.append(p)
    return np.asarray(pts, np.float32)


def test_recovers_translation_offset():
    rng = np.random.default_rng(0)
    pts = _world(rng)
    spec = GridSpec(resolution=0.2, extent=64)
    vals = jnp.full((pts.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    grid = set_cells(make_grid(spec), cell_index(jnp.asarray(pts), spec.resolution), vals, spec)

    true_offset = jnp.asarray([0.4, -0.2, 0.2])
    # cloud observed from a pose displaced by true_offset: points in tracking
    # frame are world points minus the offset
    cloud = jnp.asarray(pts) - true_offset
    mask = jnp.ones(cloud.shape[0], bool)

    res = jax.jit(
        lambda c, m, g: match(
            Rigid3.identity(), c, m, g, spec,
            linear_search_window=0.45, angular_search_window=0.0,
            max_scan_range=10.0,
        )
    )(cloud, mask, grid)
    np.testing.assert_allclose(
        np.asarray(res.pose.translation), np.asarray(true_offset), atol=0.21
    )
    assert float(res.score) > 0.5


def test_identity_beats_offsets_when_aligned():
    rng = np.random.default_rng(1)
    pts = _world(rng)
    spec = GridSpec(resolution=0.2, extent=64)
    vals = jnp.full((pts.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    grid = set_cells(make_grid(spec), cell_index(jnp.asarray(pts), spec.resolution), vals, spec)
    mask = jnp.ones(pts.shape[0], bool)
    res = match(
        Rigid3.identity(), jnp.asarray(pts), mask, grid, spec,
        linear_search_window=0.4, angular_search_window=0.0, max_scan_range=10.0,
    )
    np.testing.assert_allclose(np.asarray(res.pose.translation), 0.0, atol=1e-6)


def test_online_correlative_in_frontend():
    """use_online_correlative_scan_matching pre-seeds the Ceres matcher
    (local_trajectory_builder_3d.cc:514-520) — the step runs and matches."""
    import functools
    import tests.test_local_trajectory_builder as tltb
    import dataclasses
    from dliom_tpu.frontend.local_trajectory_builder import (
        ScanInput, make_initial_state, step)
    from dliom_tpu.io.synthetic import SyntheticWorld, corkscrew_trajectory
    from dliom_tpu.sensor.types import pad_point_cloud

    base = tltb._config()
    cfg = dataclasses.replace(base, use_online_correlative_scan_matching=True)
    world = SyntheticWorld.create()
    traj = corkscrew_trajectory()[:4]
    state = make_initial_state(cfg)
    jit_step = jax.jit(functools.partial(step, cfg=cfg))
    prev = Rigid3.identity()
    for t, pose in traj:
        pts, times = world.cast_scan(pose)
        cloud = pad_point_cloud(pts, times, tltb.CAPACITY)
        rel = prev.inverse().compose(pose)
        state, res = jit_step(state, ScanInput(
            time=jnp.float32(t), points=cloud.points, times=cloud.times,
            mask=cloud.mask, relative_prediction=rel))
        err = float(jnp.linalg.norm(res.local_pose.translation - pose.translation))
        assert err < 0.1, err
        prev = pose
