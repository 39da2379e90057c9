"""Sensor data types as statically-shaped JAX pytrees.

Counterpart of the reference's `cartographer/sensor/` data types (`ImuData`,
`OdometryData`, `TimedPointCloudData` with per-point relative times,
`RangeData{origin, returns, misses}`). The TPU-native difference: every cloud
is a *fixed-capacity padded batch* with an explicit validity mask, so all
downstream computations compile once and reuse the executable for every scan.

Per-point relative times follow the reference convention (sensor_bridge.cc:
last point = 0, earlier points negative, all relative to the scan-end stamp).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ImuData(NamedTuple):
    """A batch of IMU samples (time-ascending). Shapes: time (N,),
    linear_acceleration / angular_velocity (N, 3)."""

    time: jnp.ndarray
    linear_acceleration: jnp.ndarray
    angular_velocity: jnp.ndarray


class OdometryData(NamedTuple):
    time: jnp.ndarray
    rotation: jnp.ndarray  # (N, 4) wxyz
    translation: jnp.ndarray  # (N, 3)


class TimedPointCloud(NamedTuple):
    """Fixed-capacity point cloud: positions (N, 3), per-point relative time
    (N,) (<= 0, scan end = 0), validity mask (N,) bool."""

    points: jnp.ndarray
    times: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


class RangeData(NamedTuple):
    """Deskewed range data in some frame: sensor origin (3,), hit points
    (N, 3) with mask (N,). Misses are represented implicitly by the ray from
    origin to each hit (the reference's `misses` cloud — out-of-max-range
    returns clamped to max_range — carries a separate mask)."""

    origin: jnp.ndarray
    returns: jnp.ndarray
    returns_mask: jnp.ndarray
    misses: jnp.ndarray
    misses_mask: jnp.ndarray

    @staticmethod
    def empty(capacity: int, miss_capacity: int | None = None) -> "RangeData":
        miss_capacity = capacity if miss_capacity is None else miss_capacity
        return RangeData(
            origin=jnp.zeros(3, jnp.float32),
            returns=jnp.zeros((capacity, 3), jnp.float32),
            returns_mask=jnp.zeros(capacity, bool),
            misses=jnp.zeros((miss_capacity, 3), jnp.float32),
            misses_mask=jnp.zeros(miss_capacity, bool),
        )


def pad_point_cloud(
    points: np.ndarray, times: np.ndarray | None, capacity: int
) -> TimedPointCloud:
    """Host-side: pad/truncate a variable-size cloud to `capacity`.

    Truncation keeps a uniform subsample rather than a prefix so that a
    too-small capacity degrades gracefully instead of dropping the end of the
    sweep.
    """
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    if times is None:
        times = np.zeros(n, np.float32)
    times = np.asarray(times, np.float32).reshape(-1)
    if n > capacity:
        idx = np.linspace(0, n - 1, capacity).round().astype(np.int64)
        points, times = points[idx], times[idx]
        n = capacity
    out_p = np.zeros((capacity, 3), np.float32)
    out_t = np.zeros(capacity, np.float32)
    out_m = np.zeros(capacity, bool)
    out_p[:n] = points
    out_t[:n] = times
    out_m[:n] = True
    return TimedPointCloud(
        jnp.asarray(out_p), jnp.asarray(out_t), jnp.asarray(out_m)
    )
