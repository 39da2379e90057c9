"""Batched multi-sequence scaling measurement + profile (BASELINE config #5).

Measures aggregate scans/s for B sequences stepped in lockstep on ONE chip
(shared flat grid banks, chunked dispatch — the same dispatch discipline as
bench.py), optionally capturing a jax profiler trace for the largest B.

Usage:
  python tools/batch_scaling.py [--bs 1,2,4,8] [--profile /tmp/trace]

Run on the real TPU. Record results + the trace-backed ceiling analysis in
PARITY.md (VERDICT r1 #5).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

np.asarray(jnp.zeros(1))  # prepay the relay D2H handshake

from bench import CAPACITY, G, IMU_CAP, build_config  # noqa: E402
from dliom_tpu.frontend.lio import LioScanInput  # noqa: E402
from dliom_tpu.io.synthetic import SyntheticWorld, corkscrew_trajectory  # noqa: E402
from dliom_tpu.parallel.batch import (  # noqa: E402
    make_batched_lio_chunk,
    make_batched_lio_state,
)
from dliom_tpu.sensor.types import pad_point_cloud  # noqa: E402

CHUNK = 10
WARMUP = 2
MEASURE = 6


def make_scans(cfg):
    world = SyntheticWorld.create()
    traj = corkscrew_trajectory()
    rng = np.random.default_rng(0)
    scans = []
    for t, pose in traj[:CHUNK]:
        pts, times = world.cast_scan(pose)
        cloud = pad_point_cloud(pts, times, CAPACITY)
        dts = np.full(IMU_CAP, 0.0025, np.float32)
        accs = np.tile(np.array([0, 0, G], np.float32), (IMU_CAP, 1))
        accs += rng.normal(0, 0.01, accs.shape).astype(np.float32)
        gyrs = rng.normal(0, 0.002, (IMU_CAP, 3)).astype(np.float32)
        mask = np.arange(IMU_CAP) < 40
        scans.append(
            LioScanInput(
                time=jnp.float32(t), points=cloud.points, times=cloud.times,
                mask=cloud.mask, imu_dts=jnp.asarray(dts),
                imu_acc=jnp.asarray(accs), imu_gyr=jnp.asarray(gyrs),
                imu_mask=jnp.asarray(mask),
            )
        )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scans)  # (CHUNK, ...)


def run_b(cfg, stacked, b, profile_dir=None):
    # scans: (CHUNK, B, ...) — every lane sees the same stream (worst case
    # for the shared banks: maximal concurrent grid traffic)
    scans = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[:, None], (x.shape[0], b) + x.shape[1:]
        ).copy(),
        stacked,
    )
    state = make_batched_lio_state(cfg, b)
    step = make_batched_lio_chunk(cfg, b, CHUNK)
    for _ in range(WARMUP):
        state, results = step(state, scans)
    jax.block_until_ready(results.scan.local_pose.translation)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        state, results = step(state, scans)
    jax.block_until_ready(results.scan.local_pose.translation)
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
    return MEASURE * CHUNK * b / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,2,4,8")
    ap.add_argument("--profile", default=None,
                    help="trace dir; captured for the LAST B only")
    args = ap.parse_args()
    bs = [int(x) for x in args.bs.split(",")]
    cfg = build_config()
    stacked = make_scans(cfg)
    base = None
    for i, b in enumerate(bs):
        prof = args.profile if i == len(bs) - 1 else None
        rate = run_b(cfg, stacked, b, profile_dir=prof)
        if base is None:
            base = rate / b if b else rate
        print(
            json.dumps(
                {
                    "batch": b,
                    "aggregate_scans_per_sec": round(rate, 2),
                    "per_seq_scans_per_sec": round(rate / b, 2),
                    "scaling_vs_b1": round(rate / (base * b), 3) if base else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
