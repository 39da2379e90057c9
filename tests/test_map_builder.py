"""MapBuilder integration (the map_builder.cc API surface): sensor ingest ->
initialization -> LIO -> pose graph routing; serialization round-trip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.common.config import load_config
from dliom_tpu.evaluation.ate import ate_rmse, read_trajectory_csv, write_trajectory_csv
from dliom_tpu.io.serialization import load_state, save_state
from dliom_tpu.io.synthetic import SyntheticWorld
from dliom_tpu.map_builder import MapBuilder
from dliom_tpu.transform.rigid import Rigid3

G = 9.80511


def _config(num_range_data=4):
    return load_config(
        "basic",
        {
            "trajectory_builder": {
                "min_range": 0.5, "max_range": 50.0, "voxel_filter_size": 0.2,
                "scan_period": 0.3, "enable_gravity_factor": False,
                "frames_for_static_initialization": 3,
                "high_resolution_adaptive_voxel_filter": {
                    "max_length": 0.7, "min_num_points": 150, "max_range": 50.0},
                "low_resolution_adaptive_voxel_filter": {
                    "max_length": 0.7, "min_num_points": 150, "max_range": 50.0},
                "ceres_scan_matcher": {
                    "occupied_space_weight_0": 5.0, "occupied_space_weight_1": 20.0,
                    "translation_weight": 0.1, "rotation_weight": 0.3,
                    "max_num_iterations": 10},
                "motion_filter": {"max_time_seconds": 0.1,
                                  "max_distance_meters": 0.0,
                                  "max_angle_radians": 0.0},
                "imu": {"prior_vel_noise": 0.5, "prior_bias_noise": 0.05},
                "submaps": {
                    "high_resolution": 0.2, "high_resolution_max_range": 50.0,
                    "low_resolution": 0.5, "num_range_data": num_range_data,
                    "high_resolution_extent": 160, "low_resolution_extent": 80,
                    "range_data_inserter": {"hit_probability": 0.7,
                                            "miss_probability": 0.4,
                                            "num_free_space_voxels": 0}},
                "max_filtered_points": 4096,
                "max_high_res_points": 1024, "max_low_res_points": 1024,
                "max_imu_per_scan": 64,
                "window_size": 4, "gn_iterations": 4,
            },
            "pose_graph": {
                "optimize_every_n_nodes": 0,
                "max_submaps": 16, "max_nodes": 64, "max_constraints": 256,
            },
        },
    )


def _feed_static_imu(builder, t0, n=40, dt=0.01):
    for i in range(n):
        builder.add_imu_data(t0 + i * dt, [0.0, 0.0, G], [0.0, 0.0, 0.0])
    return t0 + n * dt


def test_map_builder_end_to_end_and_serialization():
    cfg = _config()
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)

    t = 0.0
    poses = []
    # static phase: initializer needs frames_for_static_initialization scans
    k = 0
    scan_idx = 0
    positions = [np.array([0.05 * i, 0.0, 0.0]) for i in range(10)]
    while scan_idx < 10:
        t = _feed_static_imu(builder, t, n=30)
        pose = (
            Rigid3.identity()
            if not builder.initialized
            else Rigid3.translation_only(jnp.asarray(positions[scan_idx], jnp.float32))
        )
        pts, ptimes = world.cast_scan(pose)
        res = builder.add_range_data(t, pts, ptimes)
        if builder.initialized:
            poses.append((t, pose, res))
            scan_idx += 1
        else:
            positions[0] = np.zeros(3)  # still initializing
            k += 1
            assert k < 10, "initializer never triggered"

    assert builder.initialized
    assert len(builder.pose_graph.nodes) >= 8
    assert len(builder.pose_graph.submaps) >= 2
    # finished submaps got compressed grids
    finished = [s for s in builder.pose_graph.submaps if s.finished]
    assert finished and all(s.high is not None for s in finished)
    # INTRA constraints reference valid ids
    for c in builder.pose_graph.constraints:
        assert 0 <= c.submap_id < len(builder.pose_graph.submaps)
        assert 0 <= c.node_id < len(builder.pose_graph.nodes)

    builder.finish_trajectory()
    nodes = builder.optimized_node_poses()
    # trajectory tracks the slow x-motion within a few cm
    errs = []
    for (t_exp, pose_exp, _), (t_got, pose_got) in zip(poses, nodes):
        errs.append(
            float(jnp.linalg.norm(pose_got.translation - pose_exp.translation))
        )
    assert max(errs) < 0.1, errs

    # serialization round-trip
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.npz")
        save_state(path, builder.pose_graph)
        pg2 = load_state(path, cfg)
        assert len(pg2.nodes) == len(builder.pose_graph.nodes)
        assert len(pg2.submaps) == len(builder.pose_graph.submaps)
        assert len(pg2.constraints) == len(builder.pose_graph.constraints)
        np.testing.assert_allclose(
            np.asarray(pg2.nodes[0].global_pose.translation),
            np.asarray(builder.pose_graph.nodes[0].global_pose.translation),
            atol=1e-6,
        )
        # the restored graph re-optimizes without error
        pg2.run_optimization(iterations=2)

        # CSV export/import round-trip
        csv = os.path.join(d, "traj.csv")
        write_trajectory_csv(csv, [t for t, _ in nodes], [p for _, p in nodes])
        times, pos = read_trajectory_csv(csv)
        assert len(times) == len(nodes)
        np.testing.assert_allclose(
            pos[0], np.asarray(nodes[0][1].translation), atol=1e-5
        )


def test_ate_metrics():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    # a rotated+shifted copy has zero aligned ATE
    from dliom_tpu.evaluation.ate import umeyama_alignment

    theta = 0.3
    r = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    est = gt @ r.T + np.array([1.0, -2.0, 0.5])
    assert ate_rmse(est, gt, align=True) < 1e-6
    assert ate_rmse(est, gt, align=False) > 1.0


def test_collated_ingest_and_gps_landmarks():
    """Native-collator ingest: range data arriving BEFORE the IMU that
    precedes it is re-merged into time order (sensor::Collator /
    OrderedMultiQueue), and GPS/landmark ingest attaches to nodes."""
    cfg = _config()
    builder = MapBuilder(cfg, use_native_collator=True)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)

    t = 0.0
    scan_idx = 0
    k = 0
    positions = [np.array([0.05 * i, 0.0, 0.0]) for i in range(8)]
    while scan_idx < 8:
        pose = (
            Rigid3.identity()
            if not builder.initialized
            else Rigid3.translation_only(jnp.asarray(positions[scan_idx], jnp.float32))
        )
        pts, ptimes = world.cast_scan(pose)
        t_scan = t + 30 * 0.01
        # out of order: the scan is enqueued BEFORE the IMU leading up to it
        builder.add_range_data(t_scan, pts, ptimes)
        t = _feed_static_imu(builder, t, n=31)
        builder.add_fixed_frame_pose_data(
            t_scan, np.asarray(positions[min(scan_idx, 7)], np.float32)
        )
        builder.add_landmark_data(
            t_scan, "beacon", np.array([1.0, 1.0, 1.0], np.float32)
        )
        if builder.initialized:
            scan_idx += 1
        else:
            k += 1
            assert k < 10, "initializer never triggered"

    assert builder.initialized
    assert len(builder.pose_graph.nodes) >= 6
    # GPS + landmark observations were attached to nodes
    assert len(builder.pose_graph.fixed_frame_observations) >= 4
    assert len(builder.pose_graph.landmark_observations) >= 4
    assert builder.trajectory(0)._collator.num_dropped == 0
    builder.finish_trajectory()
    assert "beacon" in builder.pose_graph.landmark_poses()


def test_map_builder_with_brick_grid():
    """End-to-end with the brick high-res grid: submaps finish via the
    on-device compress_brick capture path and loop-closure data stays
    intact (finish_submap accepts the pre-compressed grid)."""
    cfg = _config().override(
        {
            "trajectory_builder": {
                "submaps": {
                    "use_brick_grid": True,
                    "brick_dir_extent": 48,
                    "brick_max_bricks": 16384,
                }
            }
        }
    )
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
    t, scan_idx, k = 0.0, 0, 0
    while scan_idx < 10 and k < 20:
        t = _feed_static_imu(builder, t, n=30)
        pose = (
            Rigid3.identity()
            if not builder.initialized
            else Rigid3.translation_only(jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32))
        )
        pts, ptimes = world.cast_scan(pose)
        builder.add_range_data(t, pts, ptimes)
        if builder.initialized:
            scan_idx += 1
        k += 1
    assert builder.initialized
    finished = [s for s in builder.pose_graph.submaps if s.finished]
    assert finished, "no submap finished"
    for s in finished:
        assert s.high is not None and int(s.high.count) > 100
        assert s.image is not None or not cfg.pose_graph.constraint_builder.use_image_proposals
    builder.finish_trajectory()
    nodes = builder.optimized_node_poses()
    errs = [
        float(jnp.linalg.norm(pose.translation
              - jnp.asarray([0.05 * i, 0.0, 0.0])))
        for i, (_, pose) in enumerate(nodes)
    ]
    assert max(errs) < 0.1, errs

import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy e2e (see pytest.ini)


def _drive_trajectory(builder, world, tid, n_scans=6, x_step=0.05, t0=0.0):
    """Static-init then map n_scans on trajectory `tid`."""
    t = t0
    k = 0
    scan_idx = 0
    while scan_idx < n_scans:
        for i in range(30):
            builder.add_imu_data(
                t + i * 0.01, [0.0, 0.0, G], [0.0, 0.0, 0.0],
                trajectory_id=tid,
            )
        t += 0.30
        init = builder.trajectory(tid).initialized
        pose = (
            Rigid3.identity()
            if not init
            else Rigid3.translation_only(
                jnp.asarray([x_step * scan_idx, 0.0, 0.0], jnp.float32)
            )
        )
        pts, ptimes = world.cast_scan(pose)
        builder.add_range_data(t, pts, ptimes, trajectory_id=tid)
        if builder.trajectory(tid).initialized and init:
            scan_idx += 1
        k += 1
        assert k < 40
    return t


def test_map_builder_two_trajectories():
    """AddTrajectoryBuilder parity (map_builder.cc:98-169): two trajectories
    share one pose graph; nodes/submaps carry their ids; finishing one
    leaves the other mapping."""
    cfg = _config()
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
    t1 = builder.add_trajectory_builder()
    assert builder.num_trajectory_builders == 2

    _drive_trajectory(builder, world, 0, n_scans=5, t0=0.0)
    _drive_trajectory(builder, world, t1, n_scans=5, t0=0.0)

    tids_nodes = {n.trajectory_id for n in builder.pose_graph.nodes}
    tids_subs = {s.trajectory_id for s in builder.pose_graph.submaps}
    assert tids_nodes == {0, t1}
    assert tids_subs == {0, t1}
    # per-trajectory queries split correctly
    n0 = builder.optimized_node_poses(trajectory_id=0)
    n1 = builder.optimized_node_poses(trajectory_id=t1)
    assert len(n0) >= 4 and len(n1) >= 4
    assert len(n0) + len(n1) == len(builder.pose_graph.nodes)

    builder.finish_trajectory(t1)
    assert builder.pose_graph.trajectory_states()[t1] == "FINISHED"
    assert builder.pose_graph.trajectory_states()[0] == "ACTIVE"
    builder.finish_trajectory()  # all + final optimization


def test_num_accumulated_range_data():
    """num_accumulated_range_data > 1 (local_trajectory_builder_3d.cc:454):
    N merged scans accumulate into ONE frontend step."""
    cfg = _config().override(
        {"trajectory_builder": {"num_accumulated_range_data": 2}}
    )
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
    t = 0.0
    results = []
    for scan_idx in range(10):
        for i in range(30):
            builder.add_imu_data(t + i * 0.01, [0.0, 0.0, G], [0.0, 0.0, 0.0])
        t += 0.30
        pts, ptimes = world.cast_scan(Rigid3.identity())
        res = builder.add_range_data(t, pts, ptimes)
        results.append(res)
    # the first frames feed the initializer; once initialized, a result
    # appears only every SECOND scan
    post_init = [r for r in results[5:]]
    produced = [r for r in post_init if r is not None]
    assert produced, "no accumulated steps produced"
    assert len(produced) <= (len(post_init) + 1) // 2


def test_odometry_ingest_builds_links():
    """add_odometry_data -> consecutive-node odometry links
    (CalculateOdometryBetweenNodes) recorded on the pose graph."""
    cfg = _config().override(
        {
            "pose_graph": {
                "optimization_problem": {"use_consecutive_node_costs": True}
            }
        }
    )
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
    t = 0.0
    scan_idx = 0
    k = 0
    while scan_idx < 6:
        for i in range(30):
            ti = t + i * 0.01
            builder.add_imu_data(ti, [0.0, 0.0, G], [0.0, 0.0, 0.0])
            # odometry stream at 100 Hz: x = 0.05 * scan progress
            builder.add_odometry_data(
                ti,
                Rigid3.translation_only(
                    jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32)
                ),
            )
        t += 0.30
        init = builder.initialized
        pose = (
            Rigid3.identity()
            if not init
            else Rigid3.translation_only(
                jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32)
            )
        )
        # bracket the scan stamp (interpolation needs odometry at/after it)
        builder.add_odometry_data(
            t,
            Rigid3.translation_only(
                jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32)
            ),
        )
        pts, ptimes = world.cast_scan(pose)
        builder.add_range_data(t, pts, ptimes)
        if builder.initialized and init:
            scan_idx += 1
        k += 1
        assert k < 40
    links = builder.pose_graph.odometry_links
    assert len(links) >= 3
    a, b, rel = links[-1]
    assert b == a + 1 or b > a
    # consecutive odometry says ~0.05 m forward between nodes
    assert abs(float(rel.translation[0]) - 0.05) < 0.03
    # with use_consecutive_node_costs the SPA consumes them
    builder.pose_graph.run_optimization(iterations=2)


def test_imu_bridge_capacity_scales_with_accumulation():
    """With num_accumulated_range_data = N the bridge is consumed once per N
    scan-intervals, so its capacity must scale by N — otherwise the
    preintegration window silently shortens to the newest max_imu_per_scan
    samples (round-2 review finding)."""
    import warnings

    cfg = _config().override(
        {"trajectory_builder": {"num_accumulated_range_data": 2}}
    )
    builder = MapBuilder(cfg)
    traj = builder._trajectories[0]
    cap1 = cfg.trajectory_builder.max_imu_per_scan
    # feed 1.5x the single-scan capacity across the two-scan window: must be
    # retained in full, with no overflow warning
    n = cap1 + cap1 // 2
    for i in range(n):
        traj._imu_times.append(0.001 * (i + 1))
        traj._imu_acc.append(np.zeros(3, np.float32))
        traj._imu_gyr.append(np.zeros(3, np.float32))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dts, accs, gyrs, mask = traj._imu_bridge(1.0)
    assert int(np.asarray(mask).sum()) == n
    assert dts.shape[0] == 2 * cap1
    # overflow beyond the scaled capacity is surfaced, never silent
    for i in range(2 * cap1 + 5):
        traj._imu_times.append(1.0 + 0.001 * (i + 1))
        traj._imu_acc.append(np.zeros(3, np.float32))
        traj._imu_gyr.append(np.zeros(3, np.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, _, _, mask2 = traj._imu_bridge(2.0)
    assert any("IMU bridge overflow" in str(x.message) for x in w)
    assert int(np.asarray(mask2).sum()) == 2 * cap1


def test_out_of_order_samples_rejected_on_default_path():
    """Default (non-collator) ingest enforces the reference's per-queue
    monotonicity invariant (OrderedMultiQueue, ordered_multi_queue.cc): a
    non-increasing stamp is dropped with a warning instead of silently
    corrupting the IMU window with a negative dt."""
    import warnings

    builder = MapBuilder(_config())
    traj = builder._trajectories[0]
    builder.add_imu_data(0.10, [0.0, 0.0, G], [0.0, 0.0, 0.0])
    builder.add_imu_data(0.11, [0.0, 0.0, G], [0.0, 0.0, 0.0])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        builder.add_imu_data(0.105, [0.0, 0.0, G], [0.0, 0.0, 0.0])  # late
        builder.add_imu_data(0.11, [0.0, 0.0, G], [0.0, 0.0, 0.0])  # dup
    assert sum("out-of-order imu" in str(x.message) for x in w) == 2
    assert traj.num_out_of_order_dropped == 2
    assert traj._imu_times == [0.10, 0.11]
    # in-order continues to flow
    builder.add_imu_data(0.12, [0.0, 0.0, G], [0.0, 0.0, 0.0])
    assert traj._imu_times == [0.10, 0.11, 0.12]
    # range queue has its own independent monotonicity guard
    pts = np.zeros((8, 3), np.float32)
    builder.add_range_data(0.3, pts)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        builder.add_range_data(0.25, pts)
    assert sum("out-of-order" in str(x.message) for x in w) == 1
    assert traj.num_out_of_order_dropped == 3
    # EQUAL stamps on a range queue are legal (the reference's invariant is
    # CHECK_LE, ordered_multi_queue.cc:112 — e.g. two lidars feeding the
    # primary queue without distinct sensor ids): dispatched, not dropped
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        builder.add_range_data(0.3, pts)
    assert sum("out-of-order" in str(x.message) for x in w) == 0
    assert traj.num_out_of_order_dropped == 3


def test_live_checkpoint_resume_mid_submap():
    """save_checkpoint / map_builder_from_checkpoint (SURVEY §5's live
    device-state snapshot): checkpoint a RUNNING builder mid-submap,
    restore into a fresh builder, feed both the identical remaining
    sequence — trajectories, node counts, and submap bookkeeping must
    match exactly (same device programs on identical state)."""
    from dliom_tpu.map_builder import map_builder_from_checkpoint

    cfg = _config(num_range_data=4)
    world = SyntheticWorld.create(num_beams=8, num_azimuths=200)

    def drive(builder, t, scan_idx, n_scans):
        """Feed n_scans moving scans; returns (t, scan_idx)."""
        k = 0
        while k < n_scans and k < n_scans + 10:
            t = _feed_static_imu(builder, t, n=30)
            pose = (
                Rigid3.identity()
                if not builder.initialized
                else Rigid3.translation_only(
                    jnp.asarray([0.12 * scan_idx, 0.0, 0.0], jnp.float32)
                )
            )
            pts, ptimes = world.cast_scan(pose)
            builder.add_range_data(t, pts, ptimes)
            if builder.initialized:
                scan_idx += 1
                k += 1
        return t, scan_idx

    a = MapBuilder(cfg)
    # init + 6 scans: mid-way through the second 4-scan submap
    t, scan_idx = drive(a, 0.0, 0, 6)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "live.npz")
        a.save_checkpoint(path)
        b = map_builder_from_checkpoint(path, cfg)
        assert b.initialized
        assert len(b.pose_graph.nodes) == len(a.pose_graph.nodes)
        assert len(b.pose_graph.submaps) == len(a.pose_graph.submaps)

        # continue BOTH with the identical remaining sequence
        ta, sa = drive(a, t, scan_idx, 5)
        tb, sb = drive(b, t, scan_idx, 5)
        assert (ta, sa) == (tb, sb)
        pa = a.pose_graph
        pb = b.pose_graph
        assert len(pa.nodes) == len(pb.nodes)
        assert len(pa.submaps) == len(pb.submaps)
        assert len(pa.constraints) == len(pb.constraints)
        for na, nb in zip(pa.nodes, pb.nodes):
            np.testing.assert_allclose(
                np.asarray(na.local_pose.translation),
                np.asarray(nb.local_pose.translation), atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(na.local_pose.rotation),
                np.asarray(nb.local_pose.rotation), atol=1e-5,
            )
        # the resumed run's frontend state advanced identically
        va = np.asarray(jax.device_get(a._trajectories[0]._lio.nav.velocity))
        vb = np.asarray(jax.device_get(b._trajectories[0]._lio.nav.velocity))
        np.testing.assert_allclose(va, vb, atol=1e-5)
