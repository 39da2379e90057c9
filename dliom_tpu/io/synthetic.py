"""Synthetic world generator for end-to-end fidelity tests and benches.

Host-side (numpy) port of the reference's canonical test fixture
(`cartographer/mapping/internal/3d/local_trajectory_builder_3d_test.cc:40-283`):
a 30 m box containing 100 spherical "bubbles" of radius 0.5, scanned by two
orthogonal 16-beam 360-degree rangefinders along an analytic trajectory, with
ideal gravity-only IMU observations. Ray casting is vectorized numpy rather
than per-ray loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from dliom_tpu.transform.rigid import Rigid3

import jax.numpy as jnp

BOX_HALF = 15.0
BUBBLE_RADIUS = 0.5
GRAVITY = 9.81


def _np_quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """(w,x,y,z) quaternion -> 3x3 rotation matrix, pure numpy."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclass
class SyntheticWorld:
    bubbles: np.ndarray  # (B, 3)
    directions: np.ndarray  # (R, 3) unit rays in the rangefinder frame

    @staticmethod
    def create(
        num_bubbles: int = 100,
        num_beams: int = 16,
        num_azimuths: int = 500,
        seed: int = 42,
        two_rangefinders: bool = True,
    ) -> "SyntheticWorld":
        rng = np.random.default_rng(seed)
        v = rng.uniform(-1.0, 1.0, size=(num_bubbles, 3))
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
        bubbles = 10.0 * v

        # 16 beams spread +-15 deg in elevation x 500 azimuths (the fixture's
        # r in [-8,8) x s in [-250,250)).
        rs = np.arange(-num_beams // 2, num_beams // 2)
        ss = np.arange(-num_azimuths // 2, num_azimuths // 2)
        az, el = np.meshgrid(
            np.pi * ss / (num_azimuths // 2), np.pi / 12.0 * rs / (num_beams // 2),
            indexing="ij",
        )
        d = np.stack(
            [
                np.cos(az) * np.cos(el),
                np.sin(az) * np.cos(el),
                -np.sin(el),
            ],
            axis=-1,
        ).reshape(-1, 3)
        if two_rangefinders:
            # Second orthogonal rangefinder: rotate 90 deg about x.
            rot_x = np.array(
                [[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]
            )
            d = np.concatenate([d, d @ rot_x.T])
        return SyntheticWorld(bubbles=bubbles, directions=d.astype(np.float32))

    def cast_scan(self, pose: Rigid3) -> Tuple[np.ndarray, np.ndarray]:
        """Ray-cast one scan from `pose`. Returns (points_in_tracking (N,3),
        relative_times (N,)). Pure numpy — host data generation must never
        dispatch device ops."""
        rmat = _np_quat_to_matrix(np.asarray(pose.rotation, np.float64))
        origin = np.asarray(pose.translation, np.float64)
        d = self.directions.astype(np.float64) @ rmat.T  # (R, 3) world dirs

        # Box intersection: first axis-plane hit along +t.
        with np.errstate(divide="ignore", invalid="ignore"):
            t_box = np.full(d.shape[0], 1e9)
            for axis in range(3):
                pos = (BOX_HALF - origin[axis]) / d[:, axis]
                neg = (-BOX_HALF - origin[axis]) / d[:, axis]
                cand = np.where(d[:, axis] > 0, pos, np.where(d[:, axis] < 0, neg, 1e9))
                t_box = np.minimum(t_box, cand)

        # Bubble intersection: smallest positive root per ray over all bubbles.
        oc = origin[None, :] - self.bubbles  # (B, 3)
        beta = d @ oc.T  # (R, B)
        c = np.sum(oc * oc, axis=-1)[None, :] - BUBBLE_RADIUS**2  # (1, B)
        disc = beta * beta - c
        root = -beta - np.sqrt(np.maximum(disc, 0.0))
        root = np.where((disc >= 0.0) & (root > 0.0), root, 1e9)
        t_bub = np.min(root, axis=1)

        t = np.minimum(t_box, t_bub)
        world = origin[None, :] + t[:, None] * d
        rot_inv = (world - origin[None, :]) @ rmat  # back to tracking frame
        n = rot_inv.shape[0]
        # The fixture produces an instantaneous snapshot (per-point time 0,
        # GenerateRangeData). Sweep simulation for deskew tests sets
        # `sweep_period` instead.
        times = np.zeros(n, np.float32)
        return rot_inv.astype(np.float32), times


def corkscrew_trajectory() -> List[Tuple[float, Rigid3]]:
    """The fixture's trajectory (local_trajectory_builder_3d_test.cc:230-247):
    1.5 s at rest, then a corkscrew translation + slow rotation."""
    out: List[Tuple[float, Rigid3]] = []
    t = 0.0
    for _ in range(5):
        t += 0.3
        out.append((t, Rigid3.identity()))
    axis = np.array([1.0, -1.0, 2.0])
    axis /= np.linalg.norm(axis)
    for tau in np.arange(0.0, 0.6 + 1e-9, 0.05):
        t += 0.3
        from dliom_tpu.transform.rigid import quat_from_axis_angle

        pose = Rigid3(
            rotation=quat_from_axis_angle(jnp.asarray(0.3 * tau * axis, jnp.float32)),
            translation=jnp.asarray(
                [np.sin(4.0 * tau), 1.0 - np.cos(4.0 * tau), 1.0 * tau],
                jnp.float32,
            ),
        )
        out.append((t, pose))
    return out


def _np_quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _np_quat_conjugate(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _np_quat_slerp(a: np.ndarray, b: np.ndarray, s: float) -> np.ndarray:
    d = float(np.dot(a, b))
    if d < 0:
        b, d = -b, -d
    if d > 1.0 - 1e-9:
        out = a + s * (b - a)
    else:
        th = np.arccos(np.clip(d, -1.0, 1.0))
        out = (np.sin((1 - s) * th) * a + np.sin(s * th) * b) / np.sin(th)
    return out / np.linalg.norm(out)


def _np_quat_to_axis_angle(q: np.ndarray) -> np.ndarray:
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    v = q[1:4]
    n = np.linalg.norm(v)
    if n < 1e-12:
        return 2.0 * v
    return (2.0 * np.arctan2(n, q[0])) * v / n


@dataclass
class ImuNoise:
    """IMU error model for fidelity harnesses (the reference's imu_options
    noise densities, proto/imu_options.proto): white measurement noise,
    bias random walk, initial bias offsets. All std-devs are PER-SAMPLE at
    the simulator's rate (multiply a density by sqrt(rate) to convert)."""

    acc_noise: float = 0.0  # m/s^2 per sample
    gyr_noise: float = 0.0  # rad/s per sample
    acc_bias_walk: float = 0.0  # m/s^2 per sqrt(s)
    gyr_bias_walk: float = 0.0  # rad/s per sqrt(s)
    acc_bias0: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    gyr_bias0: Tuple[float, float, float] = (0.0, 0.0, 0.0)


class ImuSimulator:
    """Stateful IMU synthesis along a pose trajectory: constant body rate +
    constant world acceleration per interval (exact for the test
    trajectories' sampling), with an ImuNoise model applied on top. Bias
    states persist across calls (a true random walk, not per-call noise).
    Pure numpy — host data generation must never dispatch device ops."""

    def __init__(
        self,
        rate: float = 100.0,
        noise: ImuNoise | None = None,
        gravity: float = 9.80511,
        seed: int = 0,
    ):
        self.rate = rate
        self.noise = noise or ImuNoise()
        self.gravity = gravity
        self._rng = np.random.default_rng(seed)
        self.ba = np.asarray(self.noise.acc_bias0, np.float64).copy()
        self.bg = np.asarray(self.noise.gyr_bias0, np.float64).copy()

    def _measure(self, true_acc: np.ndarray, true_gyr: np.ndarray, dt: float):
        n = self.noise
        self.ba += self._rng.normal(0, n.acc_bias_walk * np.sqrt(dt), 3)
        self.bg += self._rng.normal(0, n.gyr_bias_walk * np.sqrt(dt), 3)
        acc = true_acc + self.ba + self._rng.normal(0, n.acc_noise, 3)
        gyr = true_gyr + self.bg + self._rng.normal(0, n.gyr_noise, 3)
        return acc, gyr

    def static_samples(self, duration: float, attitude_error_axis_angle=None):
        """Resting samples for static initialization; optional gravity
        misalignment (the IMU mount is tilted by the given axis-angle)."""
        n = max(2, int(round(duration * self.rate)))
        dt = duration / n
        g_body = np.array([0.0, 0.0, self.gravity])
        if attitude_error_axis_angle is not None:
            aa = np.asarray(attitude_error_axis_angle, np.float64)
            th = np.linalg.norm(aa)
            if th > 0:
                q = np.concatenate(
                    [[np.cos(th / 2)], np.sin(th / 2) * aa / th]
                )
                g_body = _np_quat_to_matrix(q).T @ g_body
        accs, gyrs = [], []
        for _ in range(n):
            a, g = self._measure(g_body, np.zeros(3), dt)
            accs.append(a)
            gyrs.append(g)
        return (
            np.asarray(accs, np.float32),
            np.asarray(gyrs, np.float32),
            np.full(n, dt, np.float32),
        )

    def between(
        self,
        pose_a: Rigid3,
        pose_b: Rigid3,
        v_a: np.ndarray,
        v_b: np.ndarray,
        dt_total: float,
        capacity: int,
    ):
        """Samples over [t_a, t_b], padded to `capacity`. Returns
        (dts, accs, gyrs, mask) as NUMPY arrays: host data generation must
        never hand device arrays back to a host feed loop — every
        per-sample scalar read would then pay a blocking device round trip
        (~30 ms through the TPU relay; measured at ~0.7 s/scan in the e2e
        bench's feed loop). LioScanInput accepts numpy directly."""
        n = max(2, int(round(dt_total * self.rate)))
        sub = dt_total / n
        qa = np.asarray(pose_a.rotation, np.float64)
        qb = np.asarray(pose_b.rotation, np.float64)
        dq = _np_quat_multiply(_np_quat_conjugate(qa), qb)
        omega = _np_quat_to_axis_angle(dq) / dt_total
        a_world = (np.asarray(v_b, np.float64) - np.asarray(v_a, np.float64)) / dt_total
        g_world = np.array([0.0, 0.0, -self.gravity])
        dts = np.full(n, sub, np.float32)
        accs = np.zeros((n, 3), np.float32)
        gyrs = np.zeros((n, 3), np.float32)
        for i in range(n):
            s = (i + 0.5) / n
            q_t = _np_quat_slerp(qa, qb, s)
            a_true = _np_quat_to_matrix(q_t).T @ (a_world - g_world)
            a, g = self._measure(a_true, omega, sub)
            accs[i] = a
            gyrs[i] = g
        pad = capacity - n
        assert pad >= 0, (n, capacity)
        return (
            np.pad(dts, (0, pad)),
            np.pad(accs, ((0, pad), (0, 0))),
            np.pad(gyrs, ((0, pad), (0, 0))),
            np.arange(capacity) < n,
        )
