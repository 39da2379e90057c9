"""Motion filter: drop submap insertions when the pose barely moved.

Counterpart of the reference's `MotionFilter`
(`cartographer/mapping/internal/motion_filter.{h,cc}`): a scan is "similar"
to the last inserted one — and therefore skipped — unless time, distance, or
rotation since the last *kept* pose exceeds a threshold. State is a small
pytree carried through the scan loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from dliom_tpu.transform.rigid import Rigid3, quat_angle, quat_conjugate, quat_multiply


class MotionFilterState(NamedTuple):
    last_time: jnp.ndarray  # f32 seconds; -inf initially
    last_pose: Rigid3
    num_total: jnp.ndarray  # int32 counters (metrics parity)
    num_different: jnp.ndarray

    @staticmethod
    def initial() -> "MotionFilterState":
        return MotionFilterState(
            last_time=jnp.float32(-jnp.inf),
            last_pose=Rigid3.identity(),
            num_total=jnp.int32(0),
            num_different=jnp.int32(0),
        )


def is_similar(
    state: MotionFilterState,
    time: jnp.ndarray,
    pose: Rigid3,
    *,
    max_time_seconds: float,
    max_distance_meters: float,
    max_angle_radians: float,
) -> Tuple[jnp.ndarray, MotionFilterState]:
    """Returns (similar, new_state). When similar is True the caller skips
    insertion and the filter state is unchanged (motion_filter.cc IsSimilar)."""
    dt = time - state.last_time
    dd = jnp.linalg.norm(pose.translation - state.last_pose.translation)
    dq = quat_multiply(quat_conjugate(state.last_pose.rotation), pose.rotation)
    da = quat_angle(dq)
    keep = (
        (state.num_total == 0)
        | (dt > max_time_seconds)
        | (dd > max_distance_meters)
        | (da > max_angle_radians)
    )
    new_state = MotionFilterState(
        last_time=jnp.where(keep, time, state.last_time),
        last_pose=Rigid3(
            rotation=jnp.where(keep, pose.rotation, state.last_pose.rotation),
            translation=jnp.where(
                keep, pose.translation, state.last_pose.translation
            ),
        ),
        num_total=state.num_total + 1,
        num_different=state.num_different + keep.astype(jnp.int32),
    )
    return ~keep, new_state
