"""Batching uplink tests (LocalTrajectoryUploader analog,
cloud/internal/local_trajectory_uploader.h:31-58 +
handlers/add_sensor_data_batch_handler.cc): batch packing, in-order
delivery, trajectory-id translation, and — beyond the reference — loss-free
recovery across a server restart. Plus the per-submap query RPC
(MapBuilder::SubmapToProto, map_builder.cc:186-204)."""

import threading
import time

import numpy as np

from dliom_tpu.cloud import (
    LocalTrajectoryUploader,
    MapBuilderServer,
    MapBuilderStub,
)


class _Recorder:
    """MapBuilder stand-in recording every ingest call (the reference's
    mock_map_builder.h role in client_server_test.cc)."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()
        self._next_tid = 1  # 0 is the implicit default trajectory

    def add_trajectory_builder(self, range_sensor_ids=None):
        with self.lock:
            tid = self._next_tid
            self._next_tid += 1
            self.calls.append(("trajectory", tid, None))
            return tid

    def add_imu_data(self, time, acc, gyr, trajectory_id=0):
        with self.lock:
            self.calls.append(("imu", trajectory_id, float(time)))

    def add_range_data(self, time, points, times=None, sensor_id=None,
                       trajectory_id=0):
        with self.lock:
            self.calls.append(("range", trajectory_id, float(time)))

    def finish_trajectory(self, trajectory_id=None):
        with self.lock:
            self.calls.append(("finish", trajectory_id, None))

    def of(self, kind):
        with self.lock:
            return [c for c in self.calls if c[0] == kind]


def _wait_drained(server, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if server._queue.unfinished_tasks == 0:
            return
        time.sleep(0.01)
    raise TimeoutError("server SLAM queue did not drain")


def test_uploader_batches_in_order():
    rec = _Recorder()
    server = MapBuilderServer(rec)
    server.start()
    host, port = server.address
    up = LocalTrajectoryUploader(host, port, batch_size=8, flush_interval=0.02)
    # enqueue everything BEFORE starting the drain thread: the first pops
    # then always fill whole batches, making the batch count deterministic
    for i in range(50):
        up.add_imu_data(float(i), [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])
    up.start()
    try:
        up.flush()
        _wait_drained(server)
        imu = rec.of("imu")
        assert [t for _, _, t in imu] == [float(i) for i in range(50)]
        # 50 items at batch_size=8 -> ceil(50/8) = 7 batch RPCs, not 50
        assert up.num_batches_sent == 7
        assert up.num_items_sent == 50
    finally:
        up.shutdown()
        server.shutdown()


def test_uploader_translates_trajectory_ids():
    rec = _Recorder()
    server = MapBuilderServer(rec)
    server.start()
    host, port = server.address
    up = LocalTrajectoryUploader(host, port, batch_size=4, flush_interval=0.01)
    up.start()
    try:
        local = up.add_trajectory(["lidar"])
        assert local == 0
        for i in range(8):
            up.add_range_data(float(i), np.zeros((4, 3), np.float32),
                              trajectory_id=local)
        up.flush()
        _wait_drained(server)
        # the recorder minted cloud id 1 for the uploader's local id 0
        assert {tid for _, tid, _ in rec.of("range")} == {1}
    finally:
        up.shutdown()
        server.shutdown()


def test_uploader_survives_server_restart_without_loss():
    """Kill the uplink server mid-stream; a fresh server takes over the same
    port. The uploader must reconnect, RE-REGISTER its trajectory (fresh
    cloud id), and deliver every enqueued datum at least once."""
    rec = _Recorder()
    server_a = MapBuilderServer(rec)
    server_a.start()
    host, port = server_a.address
    up = LocalTrajectoryUploader(
        host, port, batch_size=4, flush_interval=0.01, reconnect_backoff=0.05
    )
    up.start()
    local = up.add_trajectory()
    try:
        for i in range(20):
            up.add_range_data(float(i), np.zeros((2, 3), np.float32),
                              trajectory_id=local)
        up.flush()
        _wait_drained(server_a)
        server_a.shutdown()

        # stream continues into the dead link: enqueue MUST NOT drop
        for i in range(20, 40):
            up.add_range_data(float(i), np.zeros((2, 3), np.float32),
                              trajectory_id=local)
        time.sleep(0.3)  # let the upload thread hit the dead connection

        # new server on the same port, same recorder (persistent-state analog)
        for _ in range(50):
            try:
                server_b = MapBuilderServer(rec, host=host, port=port)
                break
            except OSError:
                time.sleep(0.1)
        server_b.start()
        up.flush(timeout=30.0)
        _wait_drained(server_b)

        seen = {t for _, _, t in rec.of("range")}
        assert seen == {float(i) for i in range(40)}, sorted(seen)
        # translation refreshed: cloud ids 1 (server A) then 2 (after the
        # re-registration on server B)
        tids = [tid for _, tid, _ in rec.of("range")]
        assert tids[0] == 1 and tids[-1] == 2
        assert up.num_reconnects >= 2
        server_b.shutdown()
    finally:
        up.shutdown()


def test_transient_reconnect_does_not_reregister():
    """A reconnect to a SURVIVING server (transient TCP reset, not a
    restart) must reuse the existing cloud trajectory ids: re-registering
    would silently fork the robot's stream onto brand-new server
    trajectories mid-flight. The boot/session token tells the two cases
    apart (the reference never re-registers at all — it retries on the
    same channel, local_trajectory_uploader.cc:133-143)."""
    rec = _Recorder()
    server = MapBuilderServer(rec)
    server.start()
    host, port = server.address
    up = LocalTrajectoryUploader(
        host, port, batch_size=4, flush_interval=0.01, reconnect_backoff=0.02
    )
    up.start()
    local = up.add_trajectory()
    try:
        for i in range(8):
            up.add_range_data(float(i), np.zeros((2, 3), np.float32),
                              trajectory_id=local)
        up.flush()
        _wait_drained(server)

        # transient transport failure: the uploader's connection dies but
        # the server lives on (same boot token on reconnect)
        up._drop_connection()

        for i in range(8, 16):
            up.add_range_data(float(i), np.zeros((2, 3), np.float32),
                              trajectory_id=local)
        up.flush()
        _wait_drained(server)

        # exactly ONE registration ever; every datum landed on cloud id 1
        assert len(rec.of("trajectory")) == 1
        assert {tid for _, tid, _ in rec.of("range")} == {1}
        assert {t for _, _, t in rec.of("range")} == {float(i) for i in range(16)}
        assert up.num_reconnects >= 2
    finally:
        up.shutdown()
        server.shutdown()


def test_rejected_batch_is_dead_lettered_not_retried():
    """An application-level rejection (server alive, answers ok=False) must
    not wedge the uplink in an infinite retry loop nor mint trajectories:
    the batch is dead-lettered and the stream continues."""
    import warnings

    rec = _Recorder()
    server = MapBuilderServer(rec)
    server.start()
    host, port = server.address
    up = LocalTrajectoryUploader(
        host, port, batch_size=2, flush_interval=0.01, reconnect_backoff=0.02
    )
    local = up.add_trajectory()
    # poison pill the server's batch handler deterministically rejects,
    # enqueued between two good batches (before the drain thread starts so
    # batch packing is deterministic)
    up.add_imu_data(0.0, [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])
    up.add_imu_data(0.1, [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])
    up._enqueue("bogus_kind", {}, local)
    up._enqueue("bogus_kind", {}, local)
    up.add_imu_data(0.2, [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])
    up.add_imu_data(0.3, [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        up.start()
        try:
            up.flush(timeout=10.0)  # would TimeoutError if the uplink wedged
            _wait_drained(server)
        finally:
            up.shutdown()
            server.shutdown()
    assert any("dead-lettered" in str(x.message) for x in w)
    assert up.num_batches_rejected == 1
    assert up.num_items_rejected == 2
    assert len(up.dead_letters) == 1
    assert "unknown batch item kind" in up.dead_letters[0]["error"]
    # the good batches around the poison pill all delivered, in order,
    # onto the ONE registered trajectory
    assert [t for _, _, t in rec.of("imu")] == [0.0, 0.1, 0.2, 0.3]
    assert len(rec.of("trajectory")) == 1


def test_batch_rpc_rejects_unknown_kind():
    rec = _Recorder()
    server = MapBuilderServer(rec)
    server.start()
    host, port = server.address
    stub = MapBuilderStub(host, port)
    try:
        try:
            stub._call("add_sensor_data_batch",
                       items=[{"kind": "bogus", "params": {}}])
            assert False, "expected error"
        except RuntimeError as e:
            assert "unknown batch item kind" in str(e)
        assert len(rec.calls) == 0  # nothing partially enqueued
    finally:
        stub.close()
        server.shutdown()


class _SubmapHost:
    """map_builder stand-in owning a PoseGraph for the submap_query RPC."""

    def __init__(self, pose_graph):
        self.pose_graph = pose_graph

    def submap_query(self, submap_id):
        return self.pose_graph.submap_query(submap_id)


def test_submap_query_rpc_renders_headlessly():
    """submap_query end-to-end: a finished submap's texture + pose round-trip
    the wire and render as a headless image (the SubmapQuery service +
    rviz-slice parity check, node.cc:107-114)."""
    import jax.numpy as jnp

    from dliom_tpu.backend.pose_graph import PoseGraph
    from dliom_tpu.mapping.grid import make_grid, set_cells
    from dliom_tpu.mapping.submap import grid_specs
    from dliom_tpu.transform.rigid import Rigid3
    from tests.test_pose_graph import _cfg

    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    hi_spec, lo_spec = grid_specs(cfg.trajectory_builder.submaps)
    sid = pg.add_submap(Rigid3.identity())

    # pose-only while unfinished
    q = pg.submap_query(sid)
    assert q["finished"] is False and "texture" not in q

    # paint a wall of occupied cells and finish
    rng = np.random.default_rng(3)
    hi = make_grid(hi_spec)
    cells = jnp.asarray(
        np.stack([np.full(300, 20), rng.integers(-40, 40, 300),
                  rng.integers(-5, 5, 300)], -1), jnp.int32)
    hi = set_cells(hi, cells, jnp.full(300, 32000, jnp.int32), hi_spec)
    pg.finish_submap(sid, hi, make_grid(lo_spec))

    server = MapBuilderServer(_SubmapHost(pg))
    server.start()
    stub = MapBuilderStub(*server.address)
    try:
        r = stub.submap_query(sid)
        assert r["finished"] is True and r["version"] == 0
        img = r["texture"]
        assert img.dtype == np.uint8 and img.ndim == 2
        assert img.max() > 128  # the wall renders as bright pixels
        assert r["meters_per_pixel"] > 0
        np.testing.assert_allclose(r["global_pose_q"], [1, 0, 0, 0])
        # missing id -> clean error, connection stays usable
        try:
            stub.submap_query(99)
            assert False, "expected error"
        except RuntimeError as e:
            assert "does not exist" in str(e)
        assert stub.submap_query(sid)["submap_id"] == sid
    finally:
        stub.close()
        server.shutdown()
