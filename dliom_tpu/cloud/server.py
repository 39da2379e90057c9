"""Mapping server owning a MapBuilder.

Mirrors `MapBuilderServer` (cloud/internal/map_builder_server.cc): sensor
RPCs enqueue into a blocking queue (the handlers in cloud/internal/handlers/
add_{imu,rangefinder,fixed_frame,landmark}_data_handler.cc); one dedicated
SLAM thread drains it in arrival order (`ProcessSensorDataQueue` :142-153,
`StartSlamThread` :155-161); query RPCs read the pose graph under the
server's lock. `finish_trajectory` drains the queue, runs final optimization
and answers when done (finish_trajectory_handler.cc)."""

from __future__ import annotations

import queue
import socket
import threading
import uuid

import numpy as np

from dliom_tpu.cloud import wire


class MapBuilderServer:
    def __init__(self, map_builder, host: str = "127.0.0.1", port: int = 0):
        self.map_builder = map_builder
        # Boot/session token: minted once per server PROCESS. An uplink
        # client (LocalTrajectoryUploader) compares it across reconnects to
        # tell a transient transport failure to a surviving server (same
        # token -> its cloud trajectory ids are still valid, do NOT
        # re-register) from an actual server restart (new token -> the
        # trajectory registry is gone, re-register). The reference never
        # needs this because its gRPC channel retries writes on the same
        # channel and never re-registers (local_trajectory_uploader.cc:
        # 133-143); surviving a restart is beyond-reference behavior.
        self.boot_token = uuid.uuid4().hex
        self._queue: queue.Queue = queue.Queue(maxsize=2048)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(8)
        self.address = self._listener.getsockname()
        self._threads = []
        self._conns: set = set()
        self._conns_lock = threading.Lock()

    # ----- lifecycle -----

    def start(self) -> None:
        """StartSlamThread + accept loop (both daemonized)."""
        t = threading.Thread(target=self._slam_loop, daemon=True)
        t.start()
        self._threads.append(t)
        a = threading.Thread(target=self._accept_loop, daemon=True)
        a.start()
        self._threads.append(a)

    def shutdown(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass
        # Close live connections too: once the SLAM thread stops draining,
        # acking further sensor RPCs would fake acceptance of data that will
        # never be processed (an uplink client must instead see the failure
        # and retain its batch — LocalTrajectoryUploader resend semantics).
        with self._conns_lock:
            conns = list(self._conns)
        for c in conns:
            try:
                c.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass

    # ----- SLAM thread (ProcessSensorDataQueue) -----

    def _slam_loop(self) -> None:
        # Drain stays alive until the queue is empty even after shutdown():
        # an acked sensor RPC means "will be processed"; dropping queued
        # items at stop would silently break that contract for uplink
        # clients whose batches were already acknowledged.
        while not self._stop.is_set() or not self._queue.empty():
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            kind, payload, done = item
            try:
                with self._lock:
                    tid = int(payload.get("trajectory_id", 0))
                    if kind == "imu":
                        self.map_builder.add_imu_data(
                            payload["time"], payload["acc"], payload["gyr"],
                            trajectory_id=tid,
                        )
                    elif kind == "range":
                        self.map_builder.add_range_data(
                            payload["time"],
                            payload["points"],
                            payload.get("times"),
                            payload.get("sensor_id"),
                            trajectory_id=tid,
                        )
                    elif kind == "fixed_frame":
                        self.map_builder.add_fixed_frame_pose_data(
                            payload["time"], payload["position"],
                            trajectory_id=tid,
                        )
                    elif kind == "navsat":
                        self.map_builder.add_navsat_data(
                            payload["time"], payload["latitude"],
                            payload["longitude"], payload["altitude"],
                            trajectory_id=tid,
                        )
                    elif kind == "odometry":
                        from dliom_tpu.transform.rigid import Rigid3
                        import jax.numpy as jnp

                        pose = Rigid3(
                            jnp.asarray(payload["rotation"]),
                            jnp.asarray(payload["translation"]),
                        )
                        self.map_builder.add_odometry_data(
                            payload["time"], pose, trajectory_id=tid
                        )
                    elif kind == "landmark":
                        self.map_builder.add_landmark_data(
                            payload["time"], payload["id"], payload["position"],
                            trajectory_id=tid,
                        )
                    elif kind == "finish":
                        self.map_builder.finish_trajectory(
                            payload.get("trajectory_id")
                        )
            except Exception as e:  # noqa: BLE001
                # one malformed message must not kill the drain thread: the
                # queue would fill and every sensor RPC would block forever.
                # Record the error (surfaced by the status RPC) and keep
                # draining.
                self.last_error = f"{kind}: {e!r}"
                self.num_errors = getattr(self, "num_errors", 0) + 1
            finally:
                if done is not None:
                    done.set()
                self._queue.task_done()

    # ----- network -----

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            with self._conns_lock:
                self._conns.add(conn)
            t = threading.Thread(target=self._serve_conn, args=(conn,), daemon=True)
            t.start()

    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            with conn:
                while not self._stop.is_set():
                    try:
                        msg = wire.recv_msg(conn)
                    except (OSError, ValueError):
                        return
                    if msg is None or self._stop.is_set():
                        return
                    try:
                        reply = self._handle(msg)
                    except Exception as e:  # handler errors answer, not kill
                        reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                    try:
                        wire.send_msg(conn, reply)
                    except OSError:
                        return
        finally:
            with self._conns_lock:
                self._conns.discard(conn)

    # ----- handlers (cloud/internal/handlers/) -----

    def _handle(self, msg) -> dict:
        method = msg.get("method")
        p = msg.get("params", {})
        if method in ("add_imu_data", "add_range_data",
                      "add_fixed_frame_pose_data", "add_landmark_data",
                      "add_odometry_data", "add_navsat_data"):
            kind = {"add_imu_data": "imu", "add_range_data": "range",
                    "add_fixed_frame_pose_data": "fixed_frame",
                    "add_landmark_data": "landmark",
                    "add_odometry_data": "odometry",
                    "add_navsat_data": "navsat"}[method]
            self._queue.put((kind, p, None))
            return {"ok": True}
        if method == "add_sensor_data_batch":
            # batching uplink (add_sensor_data_batch_handler.cc): one RPC
            # carries many sensor items from a LocalTrajectoryUploader; all
            # enqueue in order, the ack means "accepted into the SLAM queue"
            kinds = {"imu", "range", "fixed_frame", "navsat", "odometry",
                     "landmark", "finish"}
            items = p.get("items", [])
            for item in items:
                if item.get("kind") not in kinds:
                    return {
                        "ok": False,
                        "error": f"unknown batch item kind {item.get('kind')!r}",
                    }
            for item in items:
                self._queue.put((item["kind"], item.get("params", {}), None))
            return {"ok": True, "count": len(items)}
        if method == "submap_query":
            # per-submap texture+pose query (MapBuilder::SubmapToProto,
            # map_builder.cc:186-204 / Submap3D::ToResponseProto,
            # submap_3d.cc:253; ROS SubmapQuery service, node.cc:107-114)
            with self._lock:
                return dict(
                    self.map_builder.submap_query(int(p["submap_id"])), ok=True
                )
        if method == "add_trajectory":
            # synchronous (add_trajectory_handler): the id must return
            with self._lock:
                tid = self.map_builder.add_trajectory_builder(
                    p.get("range_sensor_ids")
                )
            return {"ok": True, "trajectory_id": tid}
        if method == "finish_trajectory":
            done = threading.Event()
            self._queue.put(("finish", p, done))
            done.wait()
            return {"ok": True}
        if method == "trajectory_states":
            with self._lock:
                states = self.map_builder.pose_graph.trajectory_states()
            return {
                "ok": True,
                "states": {str(k): v for k, v in states.items()},
            }
        if method == "node_poses":
            with self._lock:
                nodes = self.map_builder.optimized_node_poses()
                return {
                    "ok": True,
                    "times": np.asarray([t for t, _ in nodes], np.float64),
                    "translations": np.stack(
                        [np.asarray(pose.translation) for _, pose in nodes]
                    ) if nodes else np.zeros((0, 3), np.float32),
                    "rotations": np.stack(
                        [np.asarray(pose.rotation) for _, pose in nodes]
                    ) if nodes else np.zeros((0, 4), np.float32),
                }
        if method == "submap_poses":
            with self._lock:
                poses = self.map_builder.pose_graph.submap_poses()
                return {
                    "ok": True,
                    "translations": np.stack(
                        [np.asarray(pose.translation) for pose in poses]
                    ) if poses else np.zeros((0, 3), np.float32),
                }
        if method == "constraints":
            with self._lock:
                cs = self.map_builder.pose_graph.constraints
                return {
                    "ok": True,
                    "submap": np.asarray([c.submap_id for c in cs], np.int32),
                    "node": np.asarray([c.node_id for c in cs], np.int32),
                    "inter": np.asarray([c.tag == "INTER" for c in cs], bool),
                }
        if method == "metrics":
            return {"ok": True, "text": self.map_builder.metrics_text()}
        if method == "occupancy_grid":
            # live top-down occupancy surface (occupancy_grid_node analog,
            # R7): aggregate node clouds under current optimized poses
            from dliom_tpu.io.assets_writer import (
                aggregate_point_cloud,
                snapshot_node_clouds,
                xray_image,
            )

            res = float(p.get("resolution", 0.2))
            # snapshot host refs under the lock; the O(nodes) transform work
            # runs outside it so a polling viewer never stalls the SLAM/drain
            # thread
            with self._lock:
                snap = snapshot_node_clouds(self.map_builder.pose_graph)
            pts = aggregate_point_cloud(snapshot=snap)
            img, origin = xray_image(pts, res)
            return {
                "ok": True,
                "image": img,
                "origin_xy": origin,
                "resolution": res,
            }
        if method == "map_cloud":
            # full-map point cloud under current optimized poses (node.cc
            # full-map publisher analog: cached per-node clouds republished
            # under the latest poses, R1); optional voxel downsample
            from dliom_tpu.io.assets_writer import (
                aggregate_point_cloud,
                snapshot_node_clouds,
                voxel_dedup,
            )

            with self._lock:
                snap = snapshot_node_clouds(self.map_builder.pose_graph)
            pts = aggregate_point_cloud(snapshot=snap)
            voxel = float(p.get("voxel_size", 0.0))
            if voxel > 0.0 and len(pts):
                pts = voxel_dedup(pts, voxel)
            return {"ok": True, "points": pts.astype(np.float32)}
        if method == "status":
            return {
                "ok": True,
                "queue_depth": self._queue.qsize(),
                "num_errors": getattr(self, "num_errors", 0),
                "last_error": getattr(self, "last_error", ""),
            }
        if method == "write_state":
            from dliom_tpu.io.serialization import save_state

            with self._lock:
                save_state(p["path"], self.map_builder.pose_graph)
            return {"ok": True}
        if method == "session_info":
            return {"ok": True, "boot_token": self.boot_token}
        if method == "ping":
            return {
                "ok": True,
                "queued": self._queue.qsize(),
                "boot_token": self.boot_token,
            }
        return {"ok": False, "error": f"unknown method {method!r}"}
