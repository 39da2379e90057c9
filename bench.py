#!/usr/bin/env python
"""Benchmark: frontend scans/sec on one chip (BASELINE config #1/#2 shape).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference's demonstrated real-time factor:
D-LIOM replays bags at 3x real time on a desktop CPU
(src/dlio/launch/demo/demo_dlio_viral.launch:41), i.e. ~30 scans/sec at the
10 Hz scan rate (BASELINE.md).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.common.config import load_config
from dliom_tpu.frontend.local_trajectory_builder import (
    ScanInput,
    make_initial_state,
    step,
)
from dliom_tpu.io.synthetic import SyntheticWorld, corkscrew_trajectory
from dliom_tpu.sensor.types import pad_point_cloud
from dliom_tpu.transform.rigid import Rigid3

CAPACITY = 32768  # raw points per scan fed to the step (VIRAL-like density)
WARMUP = 5
MEASURE = 40


def build_config():
    return load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": 0.1,
                "voxel_filter_size": 0.3,
                "submaps": {
                    # VIRAL-style: 0.1 m high res; extents sized to the
                    # synthetic 30 m world
                    "high_resolution": 0.1,
                    "high_resolution_max_range": 60.0,
                    "low_resolution": 0.45,
                    "num_range_data": 100,
                    "high_resolution_extent": 448,
                    "low_resolution_extent": 128,
                },
                "max_filtered_points": 8192,
                "max_high_res_points": 1024,
                "max_low_res_points": 1024,
            }
        },
    ).trajectory_builder


def main():
    # Pay the backend's one-time host-transfer handshake before anything
    # timed (first D2H through the TPU relay can take minutes).
    np.asarray(jnp.zeros(1))

    cfg = build_config()
    world = SyntheticWorld.create()
    traj = corkscrew_trajectory()

    # Pre-generate a cycle of scans on host (host data gen is not benched).
    scans = []
    prev = Rigid3.identity()
    for i, (t, pose) in enumerate(traj[: WARMUP + 5]):
        pts, times = world.cast_scan(pose)
        cloud = pad_point_cloud(pts, times, CAPACITY)
        rel = prev.inverse().compose(pose)
        scans.append(
            ScanInput(
                time=jnp.float32(t),
                points=cloud.points,
                times=cloud.times,
                mask=cloud.mask,
                relative_prediction=rel,
            )
        )
        prev = pose

    state = make_initial_state(cfg)
    jit_step = jax.jit(functools.partial(step, cfg=cfg), donate_argnums=0)

    # Warmup/compile.
    for i in range(WARMUP):
        state, result = jit_step(state, scans[i % len(scans)])
    jax.block_until_ready(result.local_pose.translation)

    t0 = time.perf_counter()
    for i in range(MEASURE):
        state, result = jit_step(state, scans[i % len(scans)])
    jax.block_until_ready(result.local_pose.translation)
    dt = time.perf_counter() - t0

    scans_per_sec = MEASURE / dt
    print(
        json.dumps(
            {
                "metric": "frontend_scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
