"""Dynamic (in-motion) IMU-LiDAR initialization driver.

Counterpart of the reference's `InitilizeByNDT`
(local_trajectory_builder_3d.cc:231-330) + `AlignWithWorld` (:1010-1086):

  * buffer `frames_for_dynamic_initialization`+1 scans, each paired with the
    zero-bias IMU preintegration since the previous scan;
  * inter-scan odometry seeded by the preintegrated rotation and the
    constant-velocity translation guess, computed by NDT (ops/ndt.py — the
    same algorithm the reference uses via PCL; occupancy matching is biased
    on single sparse scans);
  * IMU excitation check: stddev of per-segment mean specific force >= 0.25
    (AlignWithWorld :1014-1042, from VINS);
  * VINS linear alignment solves per-frame velocities + the gravity vector
    (imu/initialization.py), then every state is rotated into the
    gravity-aligned world frame (:1060-1084).

One deliberate deviation: the reference stores each frame's "transform" as
(relative NDT translation, accumulated rotation) (:296-300); here poses
accumulate properly (T_i = T_{i-1} * T_rel), which is what the linear
alignment derivation assumes."""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.common.config import TrajectoryBuilderConfig
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.imu.initialization import AlignmentInput, initialize_dynamic
from dliom_tpu.mapping.grid import GridSpec
from dliom_tpu.ops.ndt import build_field, match as ndt_match
from dliom_tpu.ops.voxel_filter import voxel_filter
from dliom_tpu.transform.rigid import Rigid3, quat_from_two_vectors, quat_multiply, quat_normalize, quat_rotate


class InitResult(NamedTuple):
    nav: pre.NavState  # state of the newest frame, world (gravity) frame
    ba: jnp.ndarray
    bg: jnp.ndarray


class DynamicInitializer:
    ODOM_SPEC = GridSpec(resolution=1.0, extent=128)  # NDT voxel size
    ODOM_POINTS = 4096

    def __init__(self, cfg: TrajectoryBuilderConfig):
        self.cfg = cfg
        self._frames = cfg.frames_for_dynamic_initialization
        self._noise = pre.noise_matrix(cfg.imu)
        self._reset()
        self._jit_cache = {}

    def _reset(self):
        self._poses: List[Rigid3] = []
        self._preints: List[Optional[pre.Preintegrated]] = []
        self._last_points = None
        self._last_stamp = None
        self._lin_vel = np.zeros(3, np.float32)
        self._seg_dts: List[float] = []
        self._seg_acc: List[np.ndarray] = []
        self._seg_gyr: List[np.ndarray] = []
        self._last_imu_t: Optional[float] = None

    def add_imu(self, t: float, acc, gyr):
        dt = (t - self._last_imu_t) if self._last_imu_t is not None else 1.0 / 500.0
        self._last_imu_t = t
        self._seg_dts.append(dt)
        self._seg_acc.append(np.asarray(acc, np.float32))
        self._seg_gyr.append(np.asarray(gyr, np.float32))

    def _segment_preint(self) -> pre.Preintegrated:
        n = len(self._seg_dts)
        # pad to the next multiple of 32: IMU counts per scan interval
        # jitter by a few samples, and every distinct count would otherwise
        # compile a fresh preintegration program during the
        # latency-sensitive initialization window
        cap = max(32 * ((n + 31) // 32), 32)
        dts = np.zeros(cap, np.float32)
        accs = np.zeros((cap, 3), np.float32)
        gyrs = np.zeros((cap, 3), np.float32)
        if n:
            dts[:n] = self._seg_dts
            accs[:n] = np.stack(self._seg_acc)
            gyrs[:n] = np.stack(self._seg_gyr)
        mask = np.arange(cap) < n
        p0 = pre.make_preintegrated(
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(accs[0] if n else np.zeros(3, np.float32)),
            jnp.asarray(gyrs[0] if n else np.zeros(3, np.float32)),
        )
        out = pre.integrate(
            p0, jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
            jnp.asarray(mask), self._noise,
        )
        self._seg_dts, self._seg_acc, self._seg_gyr = [], [], []
        return out

    def _scan_to_scan(self, last_points, cur_points, initial: Rigid3) -> Rigid3:
        """Inter-scan odometry by NDT (MatchByNDT :969)."""
        if "odom" not in self._jit_cache:
            spec = self.ODOM_SPEC

            @jax.jit
            def odom(last_pts, last_mask, cur_pts, cur_mask, init_q, init_t):
                field = build_field(last_pts, last_mask, spec)
                return ndt_match(
                    field, spec, cur_pts, cur_mask, Rigid3(init_q, init_t)
                )

            self._jit_cache["odom"] = odom
        return Rigid3(
            *map(
                jnp.asarray,
                self._jit_cache["odom"](
                    last_points.points, last_points.mask,
                    cur_points.points, cur_points.mask,
                    initial.rotation, initial.translation,
                ),
            )
        )

    def _prep(self, points: np.ndarray):
        pts = jnp.asarray(points, jnp.float32).reshape(-1, 3)
        n = pts.shape[0]
        return voxel_filter(
            pts, jnp.zeros(n), jnp.ones(n, bool), 0.3,
            out_capacity=self.ODOM_POINTS,
        )

    def add_scan(self, stamp: float, points: np.ndarray) -> Optional[InitResult]:
        cur = self._prep(points)
        if self._last_points is None:
            self._poses = [Rigid3.identity()]
            self._preints = [None]
            self._last_points = cur
            self._last_stamp = stamp
            self._seg_dts, self._seg_acc, self._seg_gyr = [], [], []
            return None

        dt = stamp - self._last_stamp
        seg = self._segment_preint()
        guess = Rigid3(
            rotation=seg.delta_q,
            translation=jnp.asarray(self._lin_vel * dt, jnp.float32),
        )
        rel = self._scan_to_scan(self._last_points, cur, guess)
        self._poses.append(self._poses[-1].compose(rel))
        self._preints.append(seg)
        self._lin_vel = np.asarray(rel.translation) / max(dt, 1e-6)
        self._last_points = cur
        self._last_stamp = stamp

        if len(self._poses) < self._frames + 1:
            return None

        result = self._align_with_world()
        if result is None:
            # re-initialization (InitilizeByNDT :316-319)
            self._reset()
            self._poses = [Rigid3.identity()]
            self._preints = [None]
            self._last_points = cur
            self._last_stamp = stamp
        return result

    def _excitation_ok(self) -> bool:
        """VINS IMU-observability check (AlignWithWorld :1014-1042)."""
        gs = []
        for p in self._preints[1:]:
            if p is None or float(p.dt) <= 0:
                continue
            gs.append(np.asarray(p.delta_v) / float(p.dt))
        if not gs:
            return False
        gs = np.stack(gs)
        aver = gs.mean(axis=0)
        var = np.sqrt(np.mean(np.sum((gs - aver) ** 2, axis=1)))
        return var >= 0.25

    def _align_with_world(self) -> Optional[InitResult]:
        if not self._excitation_ok():
            return None
        w = len(self._poses)
        rot = jnp.stack([p.rotation for p in self._poses])
        trans = jnp.stack([p.translation for p in self._poses])
        dps, dvs, dts = [np.zeros(3)], [np.zeros(3)], [0.0]
        for p in self._preints[1:]:
            dps.append(np.asarray(p.delta_p))
            dvs.append(np.asarray(p.delta_v))
            dts.append(float(p.dt))
        inp = AlignmentInput(
            rotations=rot,
            translations=trans,
            delta_p=jnp.asarray(np.stack(dps), jnp.float32),
            delta_v=jnp.asarray(np.stack(dvs), jnp.float32),
            dts=jnp.asarray(dts, jnp.float32),
            pair_mask=jnp.asarray([False] + [True] * (w - 1)),
        )
        g_norm = self.cfg.imu.gravity
        g_est, vels_body, ok = initialize_dynamic(inp, Rigid3.identity(), g_norm)
        if not bool(ok):
            return None

        # AlignWithWorld (:1056-1084): the solved g is the "up" specific
        # force in frame 0; g in base = -g_est; R0 aligns it with world down.
        g_vec = jnp.asarray([0.0, 0.0, -g_norm], jnp.float32)
        g_in_base = -g_est
        r0 = quat_from_two_vectors(g_in_base, g_vec)

        last = self._poses[-1]
        world_rot = quat_normalize(quat_multiply(r0, last.rotation))
        world_pos = quat_rotate(r0, last.translation)
        v_world = quat_rotate(
            r0, quat_rotate(last.rotation, vels_body[-1])
        )
        nav = pre.NavState(world_rot, world_pos, v_world)
        return InitResult(nav=nav, ba=jnp.zeros(3), bg=jnp.zeros(3))
