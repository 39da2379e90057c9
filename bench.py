#!/usr/bin/env python
"""Benchmark: full tightly-coupled LIO scans/sec on one chip (BASELINE
config #2: IMU preintegration + deskew + voxel filters + GN scan match +
window fusion + grid insertion).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference's demonstrated real-time factor:
D-LIOM replays bags at 3x real time on a desktop CPU
(src/dlio/launch/demo/demo_dlio_viral.launch:41), i.e. ~30 scans/sec at the
10 Hz scan rate (BASELINE.md).
"""

import functools
import json
import os
import time

import numpy as np

# Pay the backend's one-time host-transfer handshake before anything timed
# (first D2H through the TPU relay can take minutes).
import jax
import jax.numpy as jnp

# Persistent compile cache: the backend-on phase compiles the loop-search /
# SPA programs once; repeated bench runs (and the driver's end-of-round run)
# then skip straight to execution.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

np.asarray(jnp.zeros(1))

from dliom_tpu.common.config import load_config
from dliom_tpu.frontend.lio import (
    LioScanInput,
    lio_step,
    make_jit_lio_chunk,
    make_lio_state,
)
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.io.synthetic import SyntheticWorld, corkscrew_trajectory
from dliom_tpu.sensor.types import pad_point_cloud
from dliom_tpu.transform.rigid import Rigid3

CAPACITY = 32768  # raw points per scan (VIRAL-like density)
IMU_CAP = 48  # 400 Hz x 0.1 s + margin
CHUNK = 10  # scans per device dispatch (offline-throughput batching)
WARMUP = 2
MEASURE = 8
G = 9.80511


def build_config():
    return load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": 0.1,
                "voxel_filter_size": 0.3,
                "enable_gravity_factor": False,
                "submaps": {
                    # VIRAL-faithful: 0.1 m high res with the full 60 m
                    # high_resolution_max_range via the brick grid
                    # (viral.lua:26 + basic_config_3d.lua:65)
                    "high_resolution": 0.1,
                    "high_resolution_max_range": 60.0,
                    "low_resolution": 0.45,
                    "num_range_data": 100,
                    "use_brick_grid": True,
                    "brick_dir_extent": 160,  # ±64 m at 0.1 m
                    "brick_max_bricks": 65536,
                    # Apply-capacity tuned to the measured touched-group
                    # working set (~400/insert on this world; 384 drops,
                    # 512 holds zero drops — verified via the
                    # brick_groups_dropped gauge). Kernel grid steps and
                    # the group-table one-hot matmul both scale with this:
                    # 1024 -> 512 bought ~11% whole-step throughput.
                    "brick_apply_groups": 512,
                    "dense_apply_groups": 256,
                    "high_resolution_extent": 448,  # backend capture crop
                    "low_resolution_extent": 128,  # backend capture crop
                    # low-res matching grid also on the brick path: full
                    # ±64.8 m coverage at 0.45 m (the reference's low
                    # HybridGrid is sparse and unbounded) — a dense low
                    # bank would cap coverage at the extent above
                    "use_brick_grid_low": True,
                    "low_brick_dir_extent": 40,
                    "low_brick_max_bricks": 8192,
                    "low_brick_apply_groups": 192,
                    "low_brick_apply_group_bricks": 8,
                },
                "max_filtered_points": 8192,
                # The adaptive filters target the reference's 150/200
                # min_num_points (trajectory_builder_3d.lua:33-43) and emit
                # 184/222 points on this world — 256 is pure-padding-free
                # capacity, not a fidelity cut.
                "max_high_res_points": 256,
                "max_low_res_points": 256,
                "max_imu_per_scan": IMU_CAP,
                "window_size": 6,
                # ISAM2-equivalent fidelity: the reference relinearizes
                # incrementally (~1 GN iteration per update); 3 full GN
                # iterations + 6 warm-started matcher iterations pass the
                # canonical corkscrew harness at the same 0.1 m bound as the
                # reference fixture (validated, see tests/test_lio.py).
                "gn_iterations": 3,
                # 1e-3 is the measured bench-world opt-in (config default
                # stays at the reference's Ceres-default 1e-6; see
                # CeresScanMatcherConfig.function_tolerance)
                "ceres_scan_matcher": {
                    "max_num_iterations": 6,
                    "function_tolerance": 1e-3,
                },
            }
        },
    ).trajectory_builder


def bench_e2e(flagship: bool = False, prefix: str = "e2e"):
    """Full-pipeline throughput: a PROGRESSING drifted circle through
    MapBuilder with submap finish, background loop-constraint search, and
    periodic + final optimization all running — the backend-on counterpart
    of the frontend-only number (the reference's >=3x real-time anchor
    includes its 8 background threads, basic_config_3d.lua:101 +
    demo_dlio_viral.launch:41). Returns extra JSON fields.

    `flagship=True` runs the same course at the VIRAL-faithful dual-brick
    configuration (0.1 m / 60 m high, 0.45 m low — the frontend phase's
    grids) instead of the toy dense config, so the backend cost is measured
    at the flagship submap scale (VERDICT r4 #3)."""
    from dliom_tpu.io.synthetic import ImuNoise, ImuSimulator
    from dliom_tpu.map_builder import MapBuilder

    radius, speed, scan_period = 5.0, 1.5, 0.1
    submaps = (
        {
            # dual-brick flagship grids (see build_config). Backend capture
            # crops obey the crop-coverage rule (PARITY long-course
            # finding): extent x resolution must cover the matched cloud's
            # max_range + the node's offset in the submap — high 448 cells
            # = ±22.4 m vs the 15 m high-cloud range, low 288 = ±64.8 m vs
            # the 60 m low-cloud range (an undersized crop silently
            # dilutes loop-search scores below min_score: a 256/64 crop
            # closed ZERO loops on this course).
            "high_resolution": 0.1,
            "high_resolution_max_range": 60.0,
            "low_resolution": 0.45,
            "num_range_data": 16,
            "use_brick_grid": True,
            "brick_dir_extent": 160,
            "brick_max_bricks": 65536,
            "brick_apply_groups": 512,
            "dense_apply_groups": 256,
            "high_resolution_extent": 448,
            "low_resolution_extent": 288,
            "use_brick_grid_low": True,
            "low_brick_dir_extent": 40,
            "low_brick_max_bricks": 8192,
            "low_brick_apply_groups": 192,
            "low_brick_apply_group_bricks": 8,
        }
        if flagship
        else {
            "high_resolution": 0.2,
            "low_resolution": 0.8,
            "high_resolution_extent": 128,
            "low_resolution_extent": 64,
            "num_range_data": 16,
        }
    )
    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": scan_period,
                "frames_for_static_initialization": 8,
                "enable_ndt_initialization": False,
                "submaps": submaps,
                # matched-cloud capacity 256 (the adaptive filters target
                # the reference's 150/200 min_num_points,
                # trajectory_builder_3d.lua:33-43 — the 1024 default is
                # over-provisioned padding whose zero rows the loop-search
                # gathers would still pay for, 4x the search device time)
                "max_filtered_points": 8192,
                "max_high_res_points": 256,
                "max_low_res_points": 256,
            },
            "pose_graph": {
                "optimize_every_n_nodes": 32,
                "max_submaps": 32,
                "max_nodes": 512,
                "max_constraints": 2048,
                "max_radius_enable_loop_detection": 10.0,
                "num_close_submaps_loop_with_initial_value": 5,
                "constraint_builder": {
                    "min_score": 0.45,
                    "every_nodes_to_find_constraint": 2,
                    "max_nodes_per_search_dispatch": int(
                        os.environ.get("BENCH_E2E_CHUNK", "4")
                    ),
                },
            },
        },
    )
    # Background constraint search on the native task pool — the
    # reference's >=3x real-time anchor runs its searches on 8 background
    # threads (MAP_BUILDER.num_background_threads), not inline with ingest.
    # pipeline_depth=1: each scan's host fetch overlaps the next scan's
    # step, hiding the ~30 ms tunneled-TPU round trip.
    # BENCH_E2E_POOL overrides the worker count (0 = inline searches) for
    # contention experiments; the chip executes one program at a time, so
    # extra workers buy queue-ahead, not parallel compute.
    # 2 workers, not the reference's 8: the chip executes one program at a
    # time, so worker count only sets dispatch queue-ahead depth — 2 was
    # measured fastest (8 workers thrash the GIL and overfill the FIFO
    # queue ahead of the latency-critical frontend fetch).
    n_pool = int(os.environ.get("BENCH_E2E_POOL", "2"))
    if n_pool > 0:
        cfg = cfg.override(
            {"map_builder": {"num_background_threads": n_pool}}
        )
    builder = MapBuilder(
        cfg, use_background_threads=n_pool > 0, pipeline_depth=1
    )
    world = SyntheticWorld.create(num_beams=16, num_azimuths=600)
    sim = ImuSimulator(
        rate=100.0,
        noise=ImuNoise(
            acc_noise=0.02, gyr_noise=0.002, gyr_bias0=(0.0, 0.0, 0.004)
        ),
        gravity=G,
        seed=4,
    )

    def circle_pose(tau):
        # numpy-backed poses throughout the feed loop: the host data
        # generator must not touch the device (a jnp quaternion here cost
        # 2 blocking relay reads per sim.between call)
        w = speed / radius
        ang = w * tau
        p = np.array(
            [radius * np.sin(ang), radius * (1.0 - np.cos(ang)), 0.0],
            np.float32,
        )
        v = np.array([speed * np.cos(ang), speed * np.sin(ang), 0.0])
        q = np.array(
            [np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)], np.float32
        )
        return Rigid3(q, p), v

    t = 0.0
    pose0, _ = circle_pose(0.0)

    def feed(prev_pose, pose, prev_v, v):
        nonlocal t
        dts, accs, gyrs, mask = sim.between(
            prev_pose, pose, prev_v, v, scan_period, 64
        )
        for i in range(int(np.asarray(mask).sum())):
            t += float(dts[i])
            builder.add_imu_data(t, np.asarray(accs[i]), np.asarray(gyrs[i]))
        pts, ptimes = world.cast_scan(pose)
        builder.add_range_data(t, pts, ptimes)

    # UNTIMED warmup: static init + 1.12 laps. The first lap pays every jit
    # compile exactly once — frontend step, finished-submap decompression +
    # pyramid, the batched loop search (fires at the revisit), periodic and
    # final-shape SPA — mirroring how the frontend phase warms its chunk
    # before timing. Loop closure is ACTIVE during warmup (the 1.12-lap
    # revisit), so the timed lap below runs the same steady-state mix.
    for _ in range(int(round(1.6 / scan_period))):
        feed(pose0, pose0, np.zeros(3), np.zeros(3))
    lap = 2 * np.pi * radius / speed / scan_period
    warm = int(round(1.12 * lap))
    prev_pose, prev_v = pose0, np.zeros(3)
    tau = 0.0
    for _ in range(warm):
        tau += scan_period
        pose, v = circle_pose(tau)
        feed(prev_pose, pose, prev_v, v)
        prev_pose, prev_v = pose, v
    pg = builder.pose_graph
    builder.flush()
    pg.wait_for_all_computations()
    # reset the percentile/phase surfaces so they cover the timed lap only
    builder.local_slam_latency_seconds.clear()
    pg.constraint_search_seconds.clear()
    pg.phase_seconds.clear()

    # TIMED: one more full lap with submap finish, loop-constraint search,
    # and periodic optimization all running — sustained backend-on
    # throughput (the reference's >=3x real-time anchor includes its
    # background threads).
    timed = int(round(lap))
    t0 = time.perf_counter()
    for _ in range(timed):
        tau += scan_period
        pose, v = circle_pose(tau)
        feed(prev_pose, pose, prev_v, v)
        prev_pose, prev_v = pose, v
    builder.flush()
    pg.wait_for_all_computations()
    dt = time.perf_counter() - t0
    inter = sum(1 for c in pg.constraints if c.tag == "INTER")
    lat = np.asarray(builder.local_slam_latency_seconds)
    search = np.asarray(pg.constraint_search_seconds)
    p = prefix
    out = {
        f"{p}_scans_per_sec": round(timed / dt, 2),
        f"{p}_vs_baseline": round(timed / dt / 30.0, 2),
        f"{p}_num_inter_constraints": inter,
        f"{p}_num_nodes": len(pg.nodes),
        f"{p}_num_submaps": len(pg.submaps),
    }
    if len(lat):
        # online-latency percentiles (VERDICT r4 #5: the reference registers
        # local_slam_latency, local_trajectory_builder_3d.cc:624-649)
        out[f"{p}_scan_latency_p50_ms"] = round(
            float(np.percentile(lat, 50)) * 1e3, 2
        )
        out[f"{p}_scan_latency_p99_ms"] = round(
            float(np.percentile(lat, 99)) * 1e3, 2
        )
    if len(search):
        out[f"{p}_search_p50_s"] = round(float(np.percentile(search, 50)), 3)
        out[f"{p}_search_p99_s"] = round(float(np.percentile(search, 99)), 3)
    # per-phase wall breakdown over the timed lap (seconds)
    for k, v in sorted(pg.phase_seconds.items()):
        out[f"{p}_phase_{k}_s"] = round(v, 3)
    out[f"{p}_wall_s"] = round(dt, 2)
    return out


def main():
    cfg = build_config()
    world = SyntheticWorld.create()
    traj = corkscrew_trajectory()

    # Pre-generate a cycle of scans + IMU bridges on host.
    scans = []
    prev = Rigid3.identity()
    rng = np.random.default_rng(0)
    for i, (t, pose) in enumerate(traj[:10]):
        pts, times = world.cast_scan(pose)
        cloud = pad_point_cloud(pts, times, CAPACITY)
        n_imu = 40  # 400 Hz IMU at 10 Hz scans
        dts = np.full(IMU_CAP, 0.0025, np.float32)
        accs = np.tile(np.array([0, 0, G], np.float32), (IMU_CAP, 1))
        accs += rng.normal(0, 0.01, accs.shape).astype(np.float32)
        gyrs = rng.normal(0, 0.002, (IMU_CAP, 3)).astype(np.float32)
        mask = np.arange(IMU_CAP) < n_imu
        scans.append(
            LioScanInput(
                time=jnp.float32(t),
                points=cloud.points,
                times=cloud.times,
                mask=cloud.mask,
                imu_dts=jnp.asarray(dts),
                imu_acc=jnp.asarray(accs),
                imu_gyr=jnp.asarray(gyrs),
                imu_mask=jnp.asarray(mask),
            )
        )
        prev = pose

    state = make_lio_state(
        cfg, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3)
    )
    # Offline-throughput dispatch: CHUNK scans per device dispatch (lax.scan
    # inside the jit) so the ~0.4 ms per-dispatch relay overhead amortizes.
    jit_chunk, split, join = make_jit_lio_chunk(cfg, CHUNK)
    grids, rest = split(state)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    for _ in range(WARMUP):
        grids, rest, results = jit_chunk(grids, rest, stacked)
    jax.block_until_ready(results.scan.local_pose.translation)

    t0 = time.perf_counter()
    for _ in range(MEASURE):
        grids, rest, results = jit_chunk(grids, rest, stacked)
    jax.block_until_ready(results.scan.local_pose.translation)
    dt = time.perf_counter() - t0

    scans_per_sec = MEASURE * CHUNK / dt

    # Validity guard: apply-group capacity overflow silently degrades the
    # map (updates dropped, only a gauge increments) while throughput stays
    # flat — a bench number with nonzero drops is not a valid result.
    sm = join(grids, rest).frontend.submaps
    drops = {
        "brick_groups_dropped": (
            int(np.asarray(sm.high_brick.dropped)[0])
            if sm.high_brick is not None
            else 0
        ),
        "low_brick_groups_dropped": (
            int(np.asarray(sm.low_brick.dropped)[0])
            if sm.low_brick is not None
            else 0
        ),
        "dense_groups_dropped": (
            int(np.asarray(sm.dense_dropped)[0])
            if sm.dense_dropped is not None
            else 0
        ),
    }
    if any(drops.values()):
        raise SystemExit(
            f"benchmark invalid: grid updates were dropped {drops} — raise "
            "the apply-group capacities (brick_apply_groups / "
            "low_brick_apply_groups / dense_apply_groups)"
        )

    # Backend-on phase (loop search + SPA in the loop); BENCH_E2E=0 skips
    # for a quick frontend-only run; BENCH_E2E_FLAGSHIP=1 adds a second
    # backend-on pass at the flagship dual-brick grid configuration
    # (fields prefixed e2e_flagship_).
    e2e = {} if os.environ.get("BENCH_E2E") == "0" else bench_e2e()
    if e2e and e2e["e2e_num_inter_constraints"] < 1:
        raise SystemExit(
            "benchmark invalid: the backend-on phase closed no loop — the "
            f"e2e throughput would not cover constraint work ({e2e})"
        )
    if os.environ.get("BENCH_E2E_FLAGSHIP") == "1":
        e2e.update(bench_e2e(flagship=True, prefix="e2e_flagship"))

    print(
        json.dumps(
            {
                "metric": "lio_scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 30.0, 2),
                **drops,
                **e2e,
            }
        )
    )


if __name__ == "__main__":
    main()
