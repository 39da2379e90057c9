"""Distributed mapping service tests (cloud/ MapBuilderServer/Stub analog):
stream a short sequence over the wire, query poses, write state remotely."""

import os
import tempfile
import time

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_map_builder import _config, _feed_static_imu, G
from dliom_tpu.cloud import MapBuilderServer, MapBuilderStub
from dliom_tpu.io.synthetic import SyntheticWorld
from dliom_tpu.map_builder import MapBuilder
from dliom_tpu.transform.rigid import Rigid3

pytestmark = pytest.mark.slow


def test_server_end_to_end():
    cfg = _config()
    server = MapBuilderServer(MapBuilder(cfg))
    server.start()
    host, port = server.address
    stub = MapBuilderStub(host, port)
    try:
        assert stub.ping() == 0
        world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
        t, scan_idx, tries = 0.0, 0, 0
        while scan_idx < 6 and tries < 16:
            for i in range(30):
                stub.add_imu_data(t + i * 0.01, [0.0, 0.0, G], [0.0, 0.0, 0.0])
            t += 0.30
            init = server.map_builder.initialized
            pose = (
                Rigid3.identity()
                if not init
                else Rigid3.translation_only(
                    jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32)
                )
            )
            pts, ptimes = world.cast_scan(pose)
            stub.add_range_data(t, pts, ptimes)
            stub.add_fixed_frame_pose_data(t, [0.05 * scan_idx, 0.0, 0.0])
            # wait for the SLAM thread to drain before deciding progress
            # (sleep between polls: a hot ping loop starves the SLAM thread
            # on a loaded host — the round-1 flake)
            stub.finish_queue = None
            while stub.ping() > 0:
                time.sleep(0.02)
            if server.map_builder.initialized and init:
                scan_idx += 1
            tries += 1

        stub.finish_trajectory()
        times, trans, rots = stub.node_poses()
        assert len(times) >= 4
        assert trans.shape[1] == 3 and rots.shape[1] == 4
        subs = stub.submap_poses()
        assert subs.shape[0] >= 1
        s, n, inter = stub.constraints()
        assert len(s) == len(n) >= 4
        assert "dliom" in stub.metrics_text() or len(stub.metrics_text()) > 0
        # live occupancy surface (occupancy_grid_node analog, R7)
        img, origin, res = stub.occupancy_grid(resolution=0.25)
        assert img.dtype == np.uint8 and img.size > 1 and img.max() > 0
        assert origin.shape == (3,) or origin.shape == (2,)

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "remote_state.npz")
            stub.write_state(path)
            assert os.path.getsize(path) > 1000

        # PROBE: unknown method -> clean error, connection stays usable
        try:
            stub._call("no_such_method")
            assert False, "expected error"
        except RuntimeError as e:
            assert "unknown method" in str(e)
        assert stub.ping() == 0
    finally:
        stub.close()
        server.shutdown()


def test_multi_robot_two_stubs_one_server():
    """Multi-robot hub-and-spoke (cloud C37 + map_builder.cc trajectories):
    two client stubs each drive their OWN trajectory on one shared server;
    the server's pose graph carries both, with per-trajectory states."""
    cfg = _config()
    server = MapBuilderServer(MapBuilder(cfg))
    server.start()
    host, port = server.address
    robot_a = MapBuilderStub(host, port)
    robot_b = MapBuilderStub(host, port)
    try:
        tid_b = robot_b.add_trajectory()
        assert tid_b >= 1
        world = SyntheticWorld.create(num_beams=8, num_azimuths=200)

        def drive(stub, tid, n_scans):
            t, scan_idx, tries = 0.0, 0, 0
            while scan_idx < n_scans and tries < 16:
                for i in range(30):
                    stub.add_imu_data(
                        t + i * 0.01, [0.0, 0.0, G], [0.0, 0.0, 0.0],
                        trajectory_id=tid,
                    )
                t += 0.30
                init = server.map_builder.trajectory(tid).initialized
                pose = (
                    Rigid3.identity()
                    if not init
                    else Rigid3.translation_only(
                        jnp.asarray([0.05 * scan_idx, 0.0, 0.0], jnp.float32)
                    )
                )
                pts, ptimes = world.cast_scan(pose)
                stub.add_range_data(t, pts, ptimes, trajectory_id=tid)
                while stub.ping() > 0:
                    time.sleep(0.02)
                if server.map_builder.trajectory(tid).initialized and init:
                    scan_idx += 1
                tries += 1

        drive(robot_a, 0, 4)
        drive(robot_b, tid_b, 4)

        states = robot_a.trajectory_states()
        assert set(states) == {0, tid_b}
        tids = {n.trajectory_id for n in server.map_builder.pose_graph.nodes}
        assert tids == {0, tid_b}
        robot_b.finish_trajectory(tid_b)
        assert robot_a.trajectory_states()[tid_b] == "FINISHED"
        robot_a.finish_trajectory()  # all + final optimization
    finally:
        robot_a.close()
        robot_b.close()
        server.shutdown()


def test_navsat_rpc_converts_to_local():
    """add_navsat_data RPC: geodetic fixes anchor at the first fix and land
    as local fixed-frame observations (sensor_bridge HandleNavSatFixMessage
    semantics over the wire)."""
    cfg = _config()
    server = MapBuilderServer(MapBuilder(cfg))
    server.start()
    host, port = server.address
    stub = MapBuilderStub(host, port)
    try:
        stub.add_navsat_data(0.0, 48.1372149, 11.5748024, 517.1)
        stub.add_navsat_data(0.1, 48.1382149, 11.5748024, 517.1)
        while stub.ping() > 0:
            time.sleep(0.02)
        buf = server.map_builder._trajectories[0]._ff_buffer
        assert len(buf) == 2
        np.testing.assert_allclose(buf[0][1], [0.0, 0.0, 517.1], atol=1e-3)
        # ~111 m of northing for +0.001 deg latitude
        assert 80.0 < np.linalg.norm(buf[1][1] - buf[0][1]) < 140.0
        # the full-map cloud RPC round-trips (empty map -> (0, 3))
        pts = stub.map_cloud(voxel_size=0.1)
        assert pts.shape == (0, 3)
    finally:
        stub.close()
        server.shutdown()
