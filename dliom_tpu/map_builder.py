"""Top-level mapping API.

Counterpart of the reference's `MapBuilder` + `GlobalTrajectoryBuilder` +
`CollatedTrajectoryBuilder` stack (`cartographer/mapping/map_builder.cc:73-169`,
`internal/global_trajectory_builder.cc`): owns the pose graph and N
per-trajectory frontend chains (AddTrajectoryBuilder -> trajectory_id), and
routes per-scan results from local to global SLAM.

Sensor ingestion (per trajectory): IMU samples buffer host-side between scans
(the reference's Collator merges time-ordered streams; each trajectory
builder only needs the IMU bridge per scan). The first
`frames_for_static_initialization` scans feed the static initializer
(InitializeStatic, local_trajectory_builder_3d.cc:203-229); afterwards every
scan runs the compiled LIO step, and results flow to PoseGraph.add_node with
finished submap grids captured from the device before the deferred spawn
recycles their slot.

Multi-trajectory: every trajectory owns its frontend state (LIO window, two
active submaps, sensor buffers) but shares the pose graph, metrics, thread
pool, and — when configs match — the compiled LIO step. Inter-trajectory
loop closure and connectivity live in backend/pose_graph.py
(map_builder.cc:98-169, pose_graph_3d.cc trajectory connectivity).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend.pose_graph import NodeRecord, PoseGraph
from dliom_tpu.common.config import EngineConfig
from dliom_tpu.metrics import global_registry, register_all_metrics
from dliom_tpu.metrics.metrics import RateTimer
from dliom_tpu.sensor.range_synchronizer import RangeDataSynchronizer
from dliom_tpu.frontend.lio import (
    LioResult,
    LioScanInput,
    LioState,
    lio_step,
    make_lio_state,
)
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.imu.dynamic_initializer import DynamicInitializer
from dliom_tpu.imu.initialization import static_initialize
from dliom_tpu.sensor.types import pad_point_cloud
from dliom_tpu.transform.interpolation import TransformInterpolationBuffer
from dliom_tpu.transform.rigid import Rigid3


class _TrajectoryBuilder:
    """One CollatedTrajectoryBuilder -> GlobalTrajectoryBuilder ->
    LocalTrajectoryBuilder3D chain (map_builder.cc:98-169): per-trajectory
    sensor state machine + frontend, forwarding into the shared pose graph
    under this trajectory's id."""

    def __init__(
        self,
        parent: "MapBuilder",
        trajectory_id: int,
        range_sensor_ids: List[str],
        use_native_collator: bool,
        config: Optional[EngineConfig] = None,
    ):
        self.parent = parent
        self.trajectory_id = trajectory_id
        self.config = config or parent.config
        self.tb = self.config.trajectory_builder
        self._synchronizer = RangeDataSynchronizer(
            range_sensor_ids, self.tb.scan_period
        )
        self._dyn_init = (
            DynamicInitializer(self.tb)
            if self.tb.enable_ndt_initialization
            else None
        )
        self._lio: Optional[LioState] = None
        self._initialized = False
        self._init_acc: List[np.ndarray] = []
        self._init_gyr: List[np.ndarray] = []
        self._init_frames = 0
        self._imu_times: List[float] = []
        self._imu_acc: List[np.ndarray] = []
        self._imu_gyr: List[np.ndarray] = []
        self._last_imu_time: Optional[float] = None
        self._time_origin: Optional[float] = None
        if config is None or config is parent.config:
            self._jit_step = parent._jit_step  # shared compile
        else:
            self._jit_step = jax.jit(functools.partial(lio_step, cfg=self.tb))
        self._results: List[dict] = []
        # frontend submap id -> pose graph submap id
        self._pg_submap_ids: List[int] = []
        self._ff_buffer: List[Tuple[float, np.ndarray]] = []
        self._lm_buffer: List[Tuple[float, str, np.ndarray]] = []
        self._odom_buffer = TransformInterpolationBuffer()
        self._navsat = None  # lazily-anchored NavSatConverter
        self._jit_aux: dict = {}
        self._collator = None
        self._last_queue_time: dict = {}  # per-sensor monotonicity guard
        self.num_out_of_order_dropped = 0
        self.finished = False
        self._prev_node = None  # (pose-graph node id, time) of the last node
        # pipelined ingest: deferred (time, fetch, lio_state, t0) of the
        # most recent scan whose host fetch has not been read yet
        self._pending: Optional[Tuple] = None
        # num_accumulated_range_data > 1: merged scans accumulate (in the
        # tracking frame at their own stamps; deskew handles intra-scan
        # motion) until N are gathered (local_trajectory_builder_3d.cc:454)
        self._accum_points: List[np.ndarray] = []
        self._accum_times: List[np.ndarray] = []
        if use_native_collator:
            from dliom_tpu.native import OrderedMultiQueue

            self._collator = OrderedMultiQueue(["imu"] + list(range_sensor_ids))

    # ----- sensor ingest -----

    def _drain_collator(self) -> Optional[dict]:
        """Dispatch merged time-ordered items (OrderedMultiQueue::Dispatch).
        Returns the last range-data matching result, if any."""
        out = None
        for queue, t, payload in self._collator.dispatch():
            if queue == "imu":
                acc, gyr = payload
                self._handle_imu_data(t, acc, gyr)
            else:
                points, point_times = payload
                res = self._handle_range_data(t, points, point_times, queue)
                if res is not None:
                    out = res
        return out

    def add_imu_data(self, time, linear_acceleration, angular_velocity):
        """SensorBridge::HandleImuMessage -> AddImuData."""
        if self._collator is not None:
            self._collator.add(
                "imu", float(time), (linear_acceleration, angular_velocity)
            )
            self._drain_collator()
            return
        if self._reject_out_of_order("imu", float(time)):
            return
        self._handle_imu_data(time, linear_acceleration, angular_velocity)

    def _reject_out_of_order(
        self, queue: str, time: float, allow_equal: bool = False
    ) -> bool:
        """Default-path ordering invariant (OrderedMultiQueue's per-queue
        monotonicity check, sensor/internal/ordered_multi_queue.cc:112 —
        CHECK_LE, i.e. NON-DECREASING stamps are legal): the reference
        CRASHES on a decreasing stamp within one sensor queue; the default
        Python ingest (no native collator) instead drops the sample with a
        warning. Range queues pass `allow_equal=True` to accept equal
        stamps, matching CHECK_LE — two LiDARs feeding the primary queue
        without distinct sensor ids may legitimately stamp two scans
        identically, and the reference would dispatch both. The IMU queue
        keeps the stricter `<=` rejection: a dt=0 IMU sample contributes
        nothing to the preintegration window but would corrupt it with a
        duplicate reading (and an exact-duplicate resend from an
        at-least-once uplink is intentionally deduplicated there). Returns
        True if the sample must be dropped."""
        last = self._last_queue_time.get(queue)
        if last is not None and (time < last if allow_equal else time <= last):
            import warnings

            self.num_out_of_order_dropped += 1
            warnings.warn(
                f"out-of-order {queue} sample dropped: t={time:.6f} <= last "
                f"dispatched t={last:.6f} (trajectory {self.trajectory_id}); "
                "feed sensors in time order or enable the native collator "
                "(MapBuilder(use_native_collator=True))",
                stacklevel=3,
            )
            return True
        self._last_queue_time[queue] = time
        return False

    def _handle_imu_data(self, time, linear_acceleration, angular_velocity):
        self.parent._pulse(self.trajectory_id, "imu", time)
        acc = np.asarray(linear_acceleration, np.float32)
        gyr = np.asarray(angular_velocity, np.float32)
        if not self._initialized:
            self._init_acc.append(acc)
            self._init_gyr.append(gyr)
            if self._dyn_init is not None:
                self._dyn_init.add_imu(float(time), acc, gyr)
        self._imu_times.append(float(time))
        self._imu_acc.append(acc)
        self._imu_gyr.append(gyr)

    def add_odometry_data(self, time, pose: Rigid3):
        """Odometry ingest (SensorBridge::HandleOdometryMessage ->
        AddOdometryData). Buffered; consecutive-node relative odometry
        costs attach in the pose graph when enabled
        (optimization_problem_3d.cc:437-489). Out-of-order or duplicate
        stamps are dropped — first sample at a stamp wins (the reference
        CHECKs ordering; tolerate instead)."""
        if len(self._odom_buffer) and float(time) <= self._odom_buffer.latest_time:
            return
        self._odom_buffer.push(float(time), pose)

    def _imu_bridge(self, scan_time: float, warn_overflow: bool = True):
        """Consume buffered samples up to scan_time into a fixed-capacity
        batch (dts from consecutive stamps; first dt from the previous
        scan's last sample, AddImuData :183-186).

        Capacity scales with num_accumulated_range_data: with accumulation
        the bridge is consumed once per N scan-intervals, so the per-interval
        budget multiplies — otherwise the preintegrated window would silently
        shorten to the newest `max_imu_per_scan` samples. Overflow beyond the
        scaled capacity is surfaced, never silent."""
        cap = self.tb.max_imu_per_scan * max(
            1, self.tb.num_accumulated_range_data
        )
        take = 0
        while take < len(self._imu_times) and self._imu_times[take] <= scan_time:
            take += 1
        times = self._imu_times[:take]
        accs = self._imu_acc[:take]
        gyrs = self._imu_gyr[:take]
        del self._imu_times[:take], self._imu_acc[:take], self._imu_gyr[:take]
        dts = []
        last = self._last_imu_time
        for t in times:
            dts.append((t - last) if last is not None else 1.0 / 500.0)
            last = t
        if times:
            self._last_imu_time = times[-1]
        n = min(len(times), cap)
        if len(times) > cap and warn_overflow:
            import warnings

            warnings.warn(
                f"IMU bridge overflow: {len(times)} samples this window > "
                f"capacity {cap}; dropping the oldest {len(times) - cap} "
                "(preintegration window shortens — raise "
                "trajectory_builder.max_imu_per_scan)",
                stacklevel=2,
            )
        out_dt = np.zeros(cap, np.float32)
        out_a = np.zeros((cap, 3), np.float32)
        out_g = np.zeros((cap, 3), np.float32)
        if n:
            # keep the most recent samples if over capacity
            out_dt[:n] = np.asarray(dts[-n:], np.float32)
            out_a[:n] = np.asarray(accs[-n:], np.float32)
            out_g[:n] = np.asarray(gyrs[-n:], np.float32)
        mask = np.arange(cap) < n
        return (
            jnp.asarray(out_dt),
            jnp.asarray(out_a),
            jnp.asarray(out_g),
            jnp.asarray(mask),
        )

    def add_range_data(
        self, time, points, point_times=None, sensor_id=None
    ) -> Optional[dict]:
        if self._collator is not None:
            self._collator.add(
                sensor_id or self._synchronizer.primary,
                float(time),
                (points, point_times),
            )
            return self._drain_collator()
        if self._reject_out_of_order(
            sensor_id or self._synchronizer.primary, float(time),
            allow_equal=True,
        ):
            return None
        return self._handle_range_data(time, points, point_times, sensor_id)

    def _handle_range_data(
        self, time, points, point_times=None, sensor_id=None
    ) -> Optional[dict]:
        """SensorBridge::HandlePointCloud2Message -> AddRangeData. Secondary
        LiDARs buffer into the synchronizer; the primary triggers a step with
        the merged cloud. Returns a MatchingResult dict once initialized."""
        sensor_id = sensor_id or self._synchronizer.primary
        self.parent._pulse(self.trajectory_id, sensor_id, time)
        merged = self._synchronizer.add_range_data(
            sensor_id, time, points, point_times,
            synthesize_times=self.tb.manual_deskew_stamps,
        )
        if merged is None:
            return None
        time, points, point_times = merged
        if not self._initialized:
            if self._dyn_init is not None:
                # dynamic (in-motion) initialization (InitilizeByNDT)
                result = self._dyn_init.add_scan(time, points)
                if result is None:
                    return None
                self._lio = make_lio_state(
                    self.tb, result.nav, result.ba, result.bg
                )
                self._initialized = True
                self._init_acc.clear()
                self._init_gyr.clear()
                # flush stale IMU so the bridge starts at this scan
                self._imu_bridge(time, warn_overflow=False)
                return None
            self._init_frames += 1
            if self._init_frames > self.tb.frames_for_static_initialization:
                self._initialize_static()
            else:
                return None
            if not self._initialized:
                return None
            # flush the init window's IMU backlog so this first step's
            # preintegration covers one scan interval, not the whole static
            # phase (the reference's integrator starts fresh at init)
            self._imu_bridge(time - self.tb.scan_period, warn_overflow=False)

        # num_accumulated_range_data (local_trajectory_builder_3d.cc:454-492):
        # gather N synchronized scans before one frontend step. Per-point
        # times rebase onto the LAST scan's end (earlier scans get negative
        # offsets), matching the accumulation-window deskew convention.
        n_acc = max(1, self.tb.num_accumulated_range_data)
        if n_acc > 1:
            if point_times is None:
                point_times = np.zeros(len(points), np.float32)
            self._accum_points.append(np.asarray(points, np.float32))
            self._accum_times.append(
                np.asarray(point_times, np.float32) + float(time)
            )
            if len(self._accum_points) < n_acc:
                return None
            points = np.concatenate(self._accum_points)
            point_times = (
                np.concatenate(self._accum_times) - float(time)
            ).astype(np.float32)
            self._accum_points.clear()
            self._accum_times.clear()

        cloud = pad_point_cloud(points, point_times, self.tb.max_raw_points // 8)
        dts, accs, gyrs, imask = self._imu_bridge(time)
        # Rebase to trajectory-relative time before the f32 cast: absolute
        # ROS-epoch stamps (~1.7e9 s) have 256 s f32 spacing, which would
        # quantize the motion filter's dt to zero and disable its time gate.
        if self._time_origin is None:
            self._time_origin = float(time)
        inp = LioScanInput(
            time=jnp.float32(time - self._time_origin),
            points=cloud.points,
            times=cloud.times,
            mask=cloud.mask,
            imu_dts=dts,
            imu_acc=accs,
            imu_gyr=gyrs,
            imu_mask=imask,
        )
        import time as _wall

        t0 = _wall.perf_counter()
        self._lio, res = self._jit_step(self._lio, inp)
        self.parent.pose_graph._phase(
            "ingest_dispatch", _wall.perf_counter() - t0
        )
        # ONE batched host fetch per scan: a synchronous device read over a
        # tunneled TPU costs a full relay round trip (~30 ms measured), so
        # every scalar/small array the host bookkeeping needs rides a single
        # device_get instead of per-leaf float()/np.asarray reads. The
        # node's constant data (matched clouds + histogram, ~8 KB) rides the
        # same fetch so the pose graph holds HOST arrays — the background
        # constraint search then stages node batches with zero device reads
        # (a search over dozens of nodes otherwise paid dozens of RTTs).
        submaps = self._lio.frontend.submaps
        fetch = {
            "matcher_cost": res.scan.matcher_cost,
            "failed": res.failed,
            "inserted": res.scan.inserted,
            "finished_submap": res.scan.finished_submap,
            "insertion_submap_ids": res.scan.insertion_submap_ids,
            "gravity_alignment": res.scan.gravity_alignment,
            "local_q": res.scan.local_pose.rotation,
            "local_t": res.scan.local_pose.translation,
            "velocity": res.velocity,
            "num_created": submaps.num_created,
            "pending_spawn": submaps.pending_spawn,
            "pose_rotation": submaps.pose_rotation,
            "pose_translation": submaps.pose_translation,
            "pending_rotation": submaps.pending_rotation,
            "pending_translation": submaps.pending_translation,
            "high_points": res.scan.high_points,
            "high_mask": res.scan.high_mask,
            "low_points": res.scan.low_points,
            "low_mask": res.scan.low_mask,
            "histogram": res.scan.histogram,
        }
        if submaps.high_brick is not None:
            fetch["hi_dropped"] = submaps.high_brick.dropped
        if submaps.low_brick is not None:
            fetch["lo_dropped"] = submaps.low_brick.dropped
        if submaps.dense_dropped is not None:
            fetch["dense_dropped"] = submaps.dense_dropped
        if self.parent._pipeline_depth > 0:
            # Pipelined ingest: start the device→host copy but defer the
            # blocking read until the NEXT scan — the ~30 ms relay round
            # trip then overlaps the next scan's host prep + device step
            # instead of serializing after every dispatch (the reference's
            # analog is its free overlap between the ROS callback thread
            # and the SLAM thread). Results lag ingestion by one scan;
            # `flush()` drains the tail. Safe because this jit path does
            # not donate: the retained `self._lio` pytree stays valid for
            # the deferred finished-grid capture.
            jax.tree.map(lambda x: x.copy_to_host_async(), fetch)
            out = self._finish_pending()
            self._pending = (time, fetch, self._lio, t0)
            return out
        host = jax.device_get(fetch)
        return self._complete_scan(time, host, self._lio, t0)

    def _finish_pending(self) -> Optional[dict]:
        """Complete the deferred previous scan (pipelined ingest)."""
        if self._pending is None:
            return None
        import time as _wall

        time, fetch, lio, t0 = self._pending
        self._pending = None
        t_get = _wall.perf_counter()
        host = jax.device_get(fetch)
        self.parent.pose_graph._phase(
            "ingest_get", _wall.perf_counter() - t_get
        )
        return self._complete_scan(time, host, lio, t0)

    def flush(self) -> Optional[dict]:
        """Drain the pipelined-ingest tail (no-op without pipelining)."""
        return self._finish_pending()

    def _complete_scan(self, time, host, lio, t0) -> dict:
        """Host-side completion of one scan: forward to the pose graph,
        metrics, result record. `lio` is the post-step state that produced
        `host` (== self._lio except under pipelined ingest)."""
        import time as _wall

        t_f = _wall.perf_counter()
        self._forward_to_pose_graph(time, host, lio)
        self.parent.pose_graph._phase(
            "ingest_forward", _wall.perf_counter() - t_f
        )
        dt = _wall.perf_counter() - t0
        m = self.parent._metrics
        m["local_slam_latency"].add().set(dt)
        self.parent.local_slam_latency_seconds.append(dt)
        m["scan_matcher_cost"].add().observe(float(host["matcher_cost"]))
        dropped_total = None
        for key in ("hi_dropped", "lo_dropped", "dense_dropped"):
            if key in host:
                # brick and dense grouped-apply drops count in one gauge
                # (both are "grid update groups lost to capacity" — no
                # silent truncation)
                dropped_total = (dropped_total or 0.0) + float(host[key][0])
        if dropped_total is not None:
            m["brick_groups_dropped"].add().set(dropped_total)
        out = {
            "time": time,
            "trajectory_id": self.trajectory_id,
            "local_pose": Rigid3(host["local_q"], host["local_t"]),
            "velocity": host["velocity"],
            "failed": bool(host["failed"]),
            "inserted": bool(host["inserted"]),
        }
        self._results.append(out)
        return out

    # ----- initialization -----

    def _initialize_static(self):
        """InitializeStatic + InitializeIMU (:203-229, :332-357)."""
        if not self._init_acc:
            return
        accs = jnp.asarray(np.stack(self._init_acc))
        gyrs = jnp.asarray(np.stack(self._init_gyr))
        mask = jnp.ones(accs.shape[0], bool)
        rot, ba, bg = static_initialize(accs, gyrs, mask, self.tb.imu.gravity)
        nav = pre.NavState(rot, jnp.zeros(3), jnp.zeros(3))
        self._lio = make_lio_state(self.tb, nav, ba, bg)
        self._initialized = True
        self._init_acc.clear()
        self._init_gyr.clear()

    # ----- local -> global routing (GlobalTrajectoryBuilder::AddSensorData,
    # global_trajectory_builder.cc:56-97) -----

    def _sync_submaps(self, host):
        """Mirror frontend submap spawns into the pose graph. `host` is the
        per-scan batched device_get dict from `_add_range_data`."""
        pg = self.parent.pose_graph
        num_created = int(host["num_created"])
        pending = bool(host["pending_spawn"])
        while len(self._pg_submap_ids) < num_created:
            slot = len(self._pg_submap_ids) % 2
            pose = Rigid3(
                host["pose_rotation"][slot], host["pose_translation"][slot]
            )
            self._pg_submap_ids.append(
                pg.add_submap(pose, trajectory_id=self.trajectory_id)
            )
        if pending and len(self._pg_submap_ids) == num_created:
            # the next step spawns submap num_created with the pending pose
            pose = Rigid3(
                host["pending_rotation"], host["pending_translation"]
            )
            self._pg_submap_ids.append(
                pg.add_submap(pose, trajectory_id=self.trajectory_id)
            )

    def add_fixed_frame_pose_data(self, time, position):
        """GPS/navsat ingest (SensorBridge::HandleNavSatFixMessage ->
        AddFixedFramePoseData). Samples buffer until a node near their stamp
        exists; the position is linearly interpolated at node time."""
        self._ff_buffer.append((float(time), np.asarray(position, np.float32)))

    def add_navsat_data(self, time, latitude, longitude, altitude):
        """Geodetic NavSat fix → local fixed-frame position
        (sensor_bridge.cc:87-111: first fix anchors the ECEF→local frame,
        every fix becomes a fixed-frame observation)."""
        if self._navsat is None:
            from dliom_tpu.io.geodesy import NavSatConverter

            self._navsat = NavSatConverter()
        self.add_fixed_frame_pose_data(
            time, self._navsat.to_local(latitude, longitude, altitude)
        )

    def add_landmark_data(self, time, landmark_id, position_in_tracking):
        """Landmark ingest (SensorBridge::HandleLandmarkMessage). The
        observation attaches to the node nearest its stamp."""
        self._lm_buffer.append(
            (
                float(time),
                str(landmark_id),
                np.asarray(position_in_tracking, np.float32),
            )
        )

    def _attach_aux_observations(self, node_id: int, node_time: float):
        pg = self.parent.pose_graph
        # fixed-frame: interpolate buffered samples at the node's stamp
        if self._ff_buffer:
            ts = [t for t, _ in self._ff_buffer]
            if ts[0] <= node_time <= ts[-1] or abs(ts[-1] - node_time) < 0.5:
                ps = np.stack([p for _, p in self._ff_buffer])
                pos = np.stack(
                    [np.interp(node_time, ts, ps[:, k]) for k in range(3)]
                ).astype(np.float32)
                pg.add_fixed_frame_pose(node_id, pos)
            # drop samples older than the node (keep one for bracketing)
            while len(self._ff_buffer) > 1 and self._ff_buffer[1][0] <= node_time:
                self._ff_buffer.pop(0)
        # landmarks: attach observations stamped at/before this node with
        # the observing pose interpolated between the bracketing nodes
        # (landmark_cost_function_3d.h interpolation_parameter); without a
        # previous node the observation pins to this node (alpha = 1 on the
        # degenerate bracket)
        keep = []
        prev = self._prev_node  # (node_id, time) of this trajectory or None
        for t, lid, rel in self._lm_buffer:
            if t <= node_time + 0.5 * self.tb.scan_period:
                if prev is not None and prev[1] < node_time:
                    alpha = float(
                        np.clip((t - prev[1]) / (node_time - prev[1]), 0.0, 1.0)
                    )
                    pg.add_landmark_observation(
                        prev[0], lid, rel, node_id2=node_id, alpha=alpha
                    )
                else:
                    pg.add_landmark_observation(node_id, lid, rel)
            else:
                keep.append((t, lid, rel))
        self._lm_buffer = keep
        # odometry: relative pose between the previous and this node,
        # interpolated from the odometry buffer at both stamps
        # (OptimizationProblem3D::CalculateOdometryBetweenNodes)
        if len(self._odom_buffer):
            pg.add_odometry_between(
                node_id, node_time, self._odom_buffer,
                trajectory_id=self.trajectory_id,
                prev_node_id=prev[0] if prev is not None else None,
            )
            # drop samples no future node can need (keep one for bracketing)
            self._odom_buffer.trim_before(node_time)

    def _forward_to_pose_graph(self, time, host, lio):
        if not bool(host["inserted"]):
            return
        self._sync_submaps(host)
        ids = tuple(
            int(i) for i in host["insertion_submap_ids"] if int(i) >= 0
        )
        # node constant data stays HOST-side (numpy): the background
        # constraint search stages node batches from these without any
        # device read (one H2D upload per batched search instead)
        node = NodeRecord(
            time=time,
            local_pose=Rigid3(host["local_q"], host["local_t"]),
            gravity_alignment=host["gravity_alignment"],
            high_points=host["high_points"],
            high_mask=host["high_mask"],
            low_points=host["low_points"],
            low_mask=host["low_mask"],
            histogram=host["histogram"],
            submap_ids=ids,
            trajectory_id=self.trajectory_id,
        )
        finished = int(host["finished_submap"])
        grids = None
        pg = self.parent.pose_graph
        if finished >= 0:
            # the finishing submap's grids are intact until the next step
            # (under pipelined ingest: `lio` is the retained post-step state,
            # still valid — the ingest jit does not donate)
            slot = finished % 2
            submaps = lio.frontend.submaps
            # spec-derived slot size: grouped-apply banks carry a padding
            # group at the end, so shape[0] // 2 would be wrong there
            from dliom_tpu.mapping.submap import grid_specs as _gs

            hi_spec_c, lo_spec_c = _gs(self.tb.submaps)
            lo_c = lo_spec_c.num_cells
            if self.tb.submaps.use_brick_grid:
                # compress on-device straight from the brick pool
                if "compress_brick" not in self._jit_aux:
                    from dliom_tpu.mapping.brick_grid import compress_brick
                    from dliom_tpu.mapping.submap import brick_spec, grid_specs

                    bspec = brick_spec(self.tb.submaps)
                    hi_spec, _ = grid_specs(self.tb.submaps)
                    cap = pg._compress_capacity
                    self._jit_aux["compress_brick"] = jax.jit(
                        lambda bank, s: compress_brick(bank, bspec, s, hi_spec, cap)
                    )
                high = self._jit_aux["compress_brick"](submaps.high_brick, slot)
            else:
                hi_c = hi_spec_c.num_cells
                high = submaps.high_values[slot * hi_c : (slot + 1) * hi_c]
            if self.tb.submaps.use_brick_grid_low:
                if "compress_brick_low" not in self._jit_aux:
                    from dliom_tpu.mapping.brick_grid import compress_brick
                    from dliom_tpu.mapping.submap import brick_spec_low

                    lbspec = brick_spec_low(self.tb.submaps)
                    lcap = pg.low_compress_capacity
                    self._jit_aux["compress_brick_low"] = jax.jit(
                        lambda bank, s: compress_brick(
                            bank, lbspec, s, lo_spec_c, lcap
                        )
                    )
                low = self._jit_aux["compress_brick_low"](
                    submaps.low_brick, slot
                )
            else:
                low = submaps.low_values[slot * lo_c : (slot + 1) * lo_c]
            grids = (high, low)
        pg.add_node(
            node,
            tuple(self._pg_submap_ids[i] for i in ids),
            newly_finished_submap_id=(
                self._pg_submap_ids[finished] if finished >= 0 else -1
            ),
            finished_grids=grids,
        )
        self._attach_aux_observations(len(pg.nodes) - 1, time)
        self._prev_node = (len(pg.nodes) - 1, time)
        if self.parent._pure_localization:
            pg.trim_to_last_submaps(3)

    def finish(self):
        """FinishTrajectory(trajectory_id): flush the collator, mark the
        trajectory finished in the pose graph. No final optimization here —
        that is MapBuilder.finish_trajectory()/pose_graph.run_final_...'s
        job (offline_node.cc calls RunFinalOptimization separately)."""
        if self.finished:
            return
        if self._collator is not None:
            for name in ["imu"] + list(self._synchronizer.sensor_ids):
                self._collator.finish_queue(name)
            self._drain_collator()
        self._finish_pending()  # drain the pipelined-ingest tail
        self.parent.pose_graph.finish_trajectory(self.trajectory_id)
        self.finished = True

    @property
    def initialized(self) -> bool:
        return self._initialized


class MapBuilder:
    """Multi-trajectory mapping API (MapBuilderInterface surface). The
    original single-trajectory surface (add_imu_data(...) etc. without a
    trajectory id) operates on trajectory 0, which is created eagerly."""

    def __init__(
        self,
        config: EngineConfig,
        range_sensor_ids: Optional[List[str]] = None,
        use_background_threads: bool = False,
        use_native_collator: bool = False,
        mesh=None,
        pipeline_depth: int = 0,
        create_default_trajectory: bool = True,
    ):
        """`range_sensor_ids`: one entry per LiDAR (the first is the primary
        the others merge into, RangeDataSynchronizer). With
        `use_background_threads`, loop-constraint search runs on the native
        task pool (MAP_BUILDER.num_background_threads). With
        `use_native_collator`, sensor ingest routes through the native
        OrderedMultiQueue (sensor::Collator, collated_trajectory_builder.cc),
        so out-of-order arrival across sensors is merged to one
        time-ordered stream before dispatch. `mesh`: optional
        `jax.sharding.Mesh` — loop-constraint search shards its node batch
        over the mesh's chips (see backend/pose_graph.py).
        `pipeline_depth=1` defers each scan's host fetch to the next scan so
        the device round trip overlaps the next step (results lag ingestion
        by one scan; `flush()`/`finish_trajectory()` drain the tail)."""
        if not config.map_builder.use_trajectory_builder_3d:
            raise ValueError(
                "only the 3D pipeline is built (the 2D pipeline is gated off"
                " in every dlio config — SURVEY C39); set"
                " map_builder.use_trajectory_builder_3d=True"
            )
        self.config = config
        tb = config.trajectory_builder
        self.tb = tb
        self._pipeline_depth = int(pipeline_depth)
        # per-scan wall latency (dispatch → host completion), percentile
        # surface for the bench (the reference's local_slam_latency metric,
        # local_trajectory_builder_3d.cc:624-649)
        self.local_slam_latency_seconds: List[float] = []
        self._metrics = register_all_metrics(global_registry())
        pool = None
        if use_background_threads:
            from dliom_tpu.native import TaskThreadPool

            pool = TaskThreadPool(config.map_builder.num_background_threads)
        self._pool = pool
        self.pose_graph = PoseGraph(
            config.pose_graph, tb, pool=pool, metrics=self._metrics, mesh=mesh
        )
        self._jit_step = jax.jit(functools.partial(lio_step, cfg=tb))
        self._default_sensor_ids = range_sensor_ids or [
            f"points{i}" for i in range(max(1, config.num_point_clouds))
        ]
        self._use_native_collator = use_native_collator
        self._trajectories: Dict[int, _TrajectoryBuilder] = {}
        self._pure_localization = False
        self._rate_timers: dict = {}
        if create_default_trajectory:
            # trajectory 0 exists from the start (single-trajectory
            # back-compat); checkpoint restore re-creates trajectories
            # with their saved ids instead (map_builder_from_checkpoint)
            self.add_trajectory_builder(self._default_sensor_ids)

    # ----- trajectory lifecycle (AddTrajectoryBuilder, map_builder.cc:98) --

    def add_trajectory_builder(
        self,
        range_sensor_ids: Optional[List[str]] = None,
        config: Optional[EngineConfig] = None,
    ) -> int:
        """Create a new trajectory (its own frontend + sensor chain) sharing
        this map. Returns the trajectory id. `config` optionally overrides
        the frontend options for this trajectory (per-trajectory
        TrajectoryBuilderOptions); sharing the default config shares the
        compiled LIO step."""
        tid = self.pose_graph.add_trajectory()
        self._trajectories[tid] = _TrajectoryBuilder(
            self,
            tid,
            range_sensor_ids or self._default_sensor_ids,
            self._use_native_collator,
            config=config,
        )
        return tid

    def trajectory(self, trajectory_id: int) -> _TrajectoryBuilder:
        return self._trajectories[trajectory_id]

    def _pulse(self, trajectory_id: int, sensor: str, time: float):
        key = sensor if trajectory_id == 0 else f"t{trajectory_id}/{sensor}"
        self._rate_timers.setdefault(key, RateTimer()).pulse(time)

    # ----- sensor ingest (trajectory 0 by default) -----

    def add_imu_data(
        self, time, linear_acceleration, angular_velocity, trajectory_id: int = 0
    ):
        self._trajectories[trajectory_id].add_imu_data(
            time, linear_acceleration, angular_velocity
        )

    def add_range_data(
        self, time, points, point_times=None, sensor_id=None, trajectory_id: int = 0
    ) -> Optional[dict]:
        return self._trajectories[trajectory_id].add_range_data(
            time, points, point_times, sensor_id
        )

    def add_fixed_frame_pose_data(self, time, position, trajectory_id: int = 0):
        self._trajectories[trajectory_id].add_fixed_frame_pose_data(time, position)

    def add_navsat_data(
        self, time, latitude, longitude, altitude, trajectory_id: int = 0
    ):
        self._trajectories[trajectory_id].add_navsat_data(
            time, latitude, longitude, altitude
        )

    def add_landmark_data(
        self, time, landmark_id, position_in_tracking, trajectory_id: int = 0
    ):
        self._trajectories[trajectory_id].add_landmark_data(
            time, landmark_id, position_in_tracking
        )

    def add_odometry_data(self, time, pose: Rigid3, trajectory_id: int = 0):
        self._trajectories[trajectory_id].add_odometry_data(time, pose)

    def flush(self):
        """Drain all trajectories' pipelined-ingest tails (no-op unless
        constructed with pipeline_depth > 0)."""
        for t in self._trajectories.values():
            t.flush()

    # ----- finishing (FinishTrajectory / RunFinalOptimization) -----

    def finish_trajectory(self, trajectory_id: Optional[int] = None):
        """With an id: finish that trajectory only (no final optimization —
        other trajectories may still be mapping). Without: finish all
        trajectories, run the final optimization, and release the pool
        (FinishAllTrajectories + RunFinalOptimization, offline_node.cc)."""
        if trajectory_id is not None:
            self._trajectories[trajectory_id].finish()
            return
        for t in self._trajectories.values():
            t.finish()
        self.pose_graph.run_final_optimization()
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def metrics_text(self) -> str:
        """Prometheus-style metrics dump (cloud/metrics/prometheus analog),
        plus per-sensor arrival rates (common::RateTimer logging,
        collated_trajectory_builder.cc:56-76)."""
        lines = [global_registry().dump_text()]
        for name, rt in sorted(self._rate_timers.items()):
            lines.append(f"sensor_rate_hz{{sensor=\"{name}\"}} {rt.rate():.3f}")
        return "\n".join(lines)

    def sensor_rates(self) -> dict:
        return {k: v.rate() for k, v in self._rate_timers.items()}

    # ----- queries -----

    def submap_query(self, submap_id: int) -> dict:
        """Per-submap texture+pose query (MapBuilder::SubmapToProto,
        map_builder.cc:186-204); see PoseGraph.submap_query."""
        return self.pose_graph.submap_query(submap_id)

    def local_trajectory(self, trajectory_id: int = 0) -> List[dict]:
        return list(self._trajectories[trajectory_id]._results)

    def optimized_node_poses(
        self, trajectory_id: Optional[int] = None
    ) -> List[Tuple[float, Rigid3]]:
        return [
            (n.time, n.global_pose)
            for n in self.pose_graph.nodes
            if trajectory_id is None or n.trajectory_id == trajectory_id
        ]

    @property
    def initialized(self) -> bool:
        return 0 in self._trajectories and self._trajectories[0].initialized

    # ----- live checkpoint (SURVEY §5: orbax-style device-state snapshot;
    # beyond the reference, whose pbstream cannot resume a live run) -----

    def save_checkpoint(self, path: str, config_preset: str = "basic"):
        """Snapshot the FULL running state — map + every trajectory's
        device state (LIO window, biases, active submap grid banks) and
        sensor bookkeeping. `map_builder_from_checkpoint` resumes
        mid-submap with identical subsequent behavior."""
        from dliom_tpu.io.serialization import save_live_checkpoint

        save_live_checkpoint(path, self, config_preset)

    @property
    def num_trajectory_builders(self) -> int:
        return len(self._trajectories)


def map_builder_from_state(
    path: str,
    config: EngineConfig,
    pure_localization: bool = True,
    **kwargs,
) -> "MapBuilder":
    """Resume or localize against a saved map (MapBuilder::LoadState,
    map_builder.cc:209-367). Loaded trajectories are REMAPPED onto fresh
    trajectory ids of this builder (map_builder.cc:220-234), then the live
    trajectory (id of the last add_trajectory_builder call) maps against
    them. With `pure_localization`, loaded trajectories are frozen (their
    poses never move) and the live trajectory is trimmed to the reference's
    3 newest submaps (PureLocalizationTrimmer, map_builder.cc:147-151).

    `path` may be the native .npz state OR a reference-schema .pbstream
    (maps produced by cartographer tooling import directly)."""
    builder = MapBuilder(config, **kwargs)
    if path.endswith(".pbstream"):
        from dliom_tpu.io.pbstream import load_pbstream_into

        load_pbstream_into(builder.pose_graph, path, frozen=pure_localization)
    else:
        from dliom_tpu.io.serialization import load_state_into

        load_state_into(
            builder.pose_graph, path, config, frozen=pure_localization
        )
    builder._pure_localization = pure_localization
    return builder


def map_builder_from_checkpoint(
    path: str, config: EngineConfig, **kwargs
) -> "MapBuilder":
    """Resume a RUNNING map from a `MapBuilder.save_checkpoint` snapshot:
    the pose graph restores with its original ids, and every trajectory's
    device state (LIO window, biases, active submap grid banks) and host
    sensor bookkeeping come back exactly — ingestion continues mid-submap
    with identical subsequent behavior. The configuration must match the
    one the checkpoint was saved under (leaf shapes are validated).

    Beyond the reference: pbstream serializes only the finished map
    (GTSAM/ISAM2 state and active HybridGrids are never written), so a
    reference run cannot resume live (SURVEY §5)."""
    from dliom_tpu.io.serialization import (
        load_state_into,
        restore_live_trajectories,
    )

    builder = MapBuilder(config, create_default_trajectory=False, **kwargs)
    tid_map = load_state_into(builder.pose_graph, path, config)
    restore_live_trajectories(builder, path, tid_map)
    return builder
