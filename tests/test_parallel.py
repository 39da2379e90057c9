"""Multi-sequence batched mapping + mesh sharding tests (BASELINE config #5;
the TPU-native analog of the reference's gRPC multi-robot scale-out,
SURVEY.md §2.4). Runs on the 8-virtual-device CPU mesh from conftest."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dliom_tpu.common.config import load_config
from dliom_tpu.frontend.local_trajectory_builder import ScanInput
from dliom_tpu.io.synthetic import SyntheticWorld
from dliom_tpu.parallel.batch import (
    batched_step,
    make_batched_state,
    make_mesh,
    shard_over_mesh,
    sharded_step,
)
from dliom_tpu.sensor.types import pad_point_cloud
from dliom_tpu.transform.rigid import Rigid3


def _cfg():
    return load_config(
        "basic",
        {
            "trajectory_builder": {
                "min_range": 0.5, "max_range": 50.0, "voxel_filter_size": 0.2,
                "scan_period": 0.3,
                "ceres_scan_matcher": {"max_num_iterations": 6},
                "motion_filter": {"max_time_seconds": 0.0,
                                  "max_distance_meters": 0.0,
                                  "max_angle_radians": 0.0},
                "submaps": {
                    "high_resolution": 0.25, "high_resolution_max_range": 50.0,
                    "low_resolution": 0.8, "num_range_data": 100,
                    "high_resolution_extent": 96, "low_resolution_extent": 48,
                },
                "max_filtered_points": 1024,
                "max_high_res_points": 512, "max_low_res_points": 512,
            }
        },
    ).trajectory_builder


def _scan_batch(cfg, batch, offsets):
    """One scan per sequence, each sequence in its own world offset."""
    world = SyntheticWorld.create(num_beams=4, num_azimuths=100)
    pts_list, times_list = [], []
    for b in range(batch):
        pts, times = world.cast_scan(
            Rigid3.translation_only(jnp.asarray(offsets[b], jnp.float32))
        )
        cloud = pad_point_cloud(pts, times, cfg.max_filtered_points)
        pts_list.append(cloud.points)
        times_list.append(cloud.times)
    n = cfg.max_filtered_points
    return ScanInput(
        time=jnp.full((batch,), 0.3, jnp.float32),
        points=jnp.stack(pts_list),
        times=jnp.stack(times_list),
        mask=jnp.ones((batch, n), bool),
        relative_prediction=Rigid3(
            jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (batch, 1)),
            jnp.zeros((batch, 3), jnp.float32),
        ),
    )


def test_batched_multi_sequence_step():
    cfg = _cfg()
    batch = 4
    offsets = [np.array([0.05 * b, -0.02 * b, 0.0]) for b in range(batch)]
    state = make_batched_state(cfg, batch)
    scan = _scan_batch(cfg, batch, offsets)
    vstep = jax.jit(batched_step(cfg))
    state, result = vstep(state, scan)
    # every sequence produced an independent pose and inserted into its
    # own grids
    assert result.local_pose.translation.shape == (batch, 3)
    assert bool(jnp.all(result.inserted))
    occupied = jnp.sum(
        (state.submaps.high_values > 0).reshape(batch, -1), axis=1
    )
    assert bool(jnp.all(occupied > 100))
    # sequences are independent: different worlds -> different grids
    assert not bool(
        jnp.array_equal(state.submaps.high_values[0], state.submaps.high_values[1])
    )


def test_sharded_multi_sequence_step_over_mesh():
    cfg = _cfg()
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("seq",))
    batch = 8
    offsets = [np.array([0.05 * b, 0.0, 0.0]) for b in range(batch)]
    state = make_batched_state(cfg, batch)
    state = shard_over_mesh(state, mesh)
    scan = shard_over_mesh(_scan_batch(cfg, batch, offsets), mesh)
    run = sharded_step(cfg, mesh)
    state, result = run(state, scan)
    jax.block_until_ready(result.local_pose.translation)
    assert result.local_pose.translation.shape == (batch, 3)
    # the grid bank stays sharded over the mesh (one sequence per device)
    shardings = state.submaps.high_values.sharding
    assert isinstance(shardings, NamedSharding)
    assert shardings.spec[0] == "seq"


def test_sharded_spa_constraints():
    """Pose-graph solve with constraint arrays laid out over the mesh:
    the matrix-free Hv products reduce across shards (psum over ICI on
    real hardware)."""
    import tests.test_optimization as topt

    rng = np.random.default_rng(3)
    data, true_submaps, _ = topt._build_problem(rng)
    devices = jax.devices("cpu")[:8]
    mesh = Mesh(np.array(devices), ("c",))
    # shard constraints; replicate poses
    def shard_constraints(x, name):
        if name.startswith("c_"):
            return jax.device_put(
                x, NamedSharding(mesh, P("c", *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    data = type(data)(
        **{k: shard_constraints(v, k) for k, v in data._asdict().items()}
    )
    from dliom_tpu.backend.optimization import solve

    out = jax.jit(lambda d: solve(d, iterations=6, cg_iterations=48))(data)
    for i, pose in enumerate(true_submaps):
        err = float(jnp.linalg.norm(out.submap_t[i] - pose.translation))
        assert err < 0.05, (i, err)


def test_batched_lio_matches_single():
    """Shared-flat-bank batched LIO (make_batched_lio_step) produces the
    same poses as independent single-sequence runs."""
    import functools
    from dliom_tpu.frontend.lio import LioScanInput, lio_step, make_lio_state
    from dliom_tpu.imu import preintegration as pre
    from dliom_tpu.parallel.batch import (
        make_batched_lio_state,
        make_batched_lio_step,
    )

    cfg = _small_cfg() if "_small_cfg" in globals() else None
    from dliom_tpu.common.config import load_config

    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": 0.1, "voxel_filter_size": 0.3,
                "enable_gravity_factor": False,
                "submaps": {"high_resolution": 0.2, "high_resolution_max_range": 20.0,
                            "low_resolution": 0.5, "num_range_data": 3,
                            "high_resolution_extent": 64, "low_resolution_extent": 32},
                "max_raw_points": 2048, "max_filtered_points": 1024,
                "max_high_res_points": 256, "max_low_res_points": 256,
                "max_imu_per_scan": 16, "window_size": 3, "gn_iterations": 2,
                "ceres_scan_matcher": {"max_num_iterations": 4},
            }
        },
    ).trajectory_builder

    B = 2
    rng = np.random.default_rng(0)
    G = 9.80511
    scans = []
    for i in range(5):
        pts = rng.uniform(-8, 8, (B, 512, 3)).astype(np.float32)
        dts = np.full((B, 16), 0.005, np.float32)
        accs = np.tile(np.array([0, 0, G], np.float32), (B, 16, 1))
        gyrs = np.zeros((B, 16, 3), np.float32)
        scans.append(
            LioScanInput(
                time=jnp.full((B,), 0.1 * i, jnp.float32),
                points=jnp.asarray(pts),
                times=jnp.zeros((B, 512), jnp.float32),
                mask=jnp.ones((B, 512), bool),
                imu_dts=jnp.asarray(dts),
                imu_acc=jnp.asarray(accs),
                imu_gyr=jnp.asarray(gyrs),
                imu_mask=jnp.ones((B, 16), bool),
            )
        )

    # batched run
    bstate = make_batched_lio_state(cfg, B)
    bstep = make_batched_lio_step(cfg, B)
    bposes = []
    for s in scans:
        bstate, res = bstep(bstate, s)
        bposes.append(np.asarray(res.scan.local_pose.translation))

    # single-sequence runs
    for b in range(B):
        st = make_lio_state(cfg, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3))
        jstep = jax.jit(functools.partial(lio_step, cfg=cfg))
        for i, s in enumerate(scans):
            one = jax.tree.map(lambda x: x[b], s)
            st, res = jstep(st, one)
            np.testing.assert_allclose(
                np.asarray(res.scan.local_pose.translation),
                bposes[i][b],
                atol=2e-4,
            )


def test_sharded_lio_step_runs():
    """Full LIO step shard_mapped over the virtual mesh: per-device lanes
    with local flat banks, no collectives on the hot path."""
    from dliom_tpu.common.config import load_config
    from dliom_tpu.frontend.lio import LioScanInput
    from dliom_tpu.parallel.batch import (
        make_mesh,
        make_sharded_lio_state,
        shard_over_mesh,
        sharded_lio_step,
    )

    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": 0.1, "voxel_filter_size": 0.3,
                "enable_gravity_factor": False,
                "submaps": {"high_resolution": 0.2, "low_resolution": 0.5,
                            "num_range_data": 3,
                            "high_resolution_extent": 64,
                            "low_resolution_extent": 32},
                "max_raw_points": 1024, "max_filtered_points": 512,
                "max_high_res_points": 128, "max_low_res_points": 128,
                "max_imu_per_scan": 8, "window_size": 3, "gn_iterations": 2,
                "ceres_scan_matcher": {"max_num_iterations": 3},
            }
        },
    ).trajectory_builder
    n_dev = len(jax.devices())
    B = 2 * n_dev  # two lanes per device
    mesh = make_mesh(n_dev)
    state = make_sharded_lio_state(cfg, B, mesh)
    stepf = sharded_lio_step(cfg, B, mesh)
    rng = np.random.default_rng(0)
    G = 9.80511
    scan = LioScanInput(
        time=jnp.zeros(B, jnp.float32),
        points=jnp.asarray(rng.uniform(-6, 6, (B, 512, 3)).astype(np.float32)),
        times=jnp.zeros((B, 512), jnp.float32),
        mask=jnp.ones((B, 512), bool),
        imu_dts=jnp.full((B, 8), 0.01),
        imu_acc=jnp.tile(jnp.asarray([0.0, 0.0, G]), (B, 8, 1)),
        imu_gyr=jnp.zeros((B, 8, 3)),
        imu_mask=jnp.ones((B, 8), bool),
    )
    scan = shard_over_mesh(scan, mesh)
    for _ in range(2):
        state, res = stepf(state, scan)
    assert res.scan.local_pose.translation.shape == (B, 3)
    assert bool(jnp.all(jnp.isfinite(res.scan.local_pose.translation)))

import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy e2e (see pytest.ini)
