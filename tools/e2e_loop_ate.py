"""End-to-end loop-closure ATE benchmark on a drifting circular trajectory.

The strongest end-to-end evidence chain: a full MapBuilder run (static init →
tightly-coupled frontend with NOISY gyro → submap lifecycle → background-style
loop search → final optimization) around a closed circle. Gyro bias makes the
odometry drift; the revisit must be recovered by loop closure and the final
optimization must cut the trajectory ATE.

Prints JSON lines:
  {"phase": "pre_optimization",  "ate_rmse_m": ..., "num_inter": ...}
  {"phase": "post_optimization", "ate_rmse_m": ..., "improvement": ...}

Usage: python tools/e2e_loop_ate.py   (TPU or JAX_PLATFORMS=cpu)
Record the numbers in PARITY.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from dliom_tpu.common.config import load_config  # noqa: E402
from dliom_tpu.evaluation.ate import ate_rmse  # noqa: E402
from dliom_tpu.io.synthetic import (  # noqa: E402
    ImuNoise,
    ImuSimulator,
    SyntheticWorld,
)
from dliom_tpu.map_builder import MapBuilder  # noqa: E402
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw  # noqa: E402

G = 9.80511
NOISE_SCALE = float(os.environ.get("E2E_NOISE", "1.0"))
BIAS_Z = float(os.environ.get("E2E_BIAS", "0.004"))
RADIUS = 5.0
SPEED = 1.5  # m/s -> one lap ~21 s at 10 Hz scans
SCAN_PERIOD = 0.1
REST = 1.6  # static-init phase
LAPS = float(os.environ.get("E2E_LAPS", "1.12"))


def circle_pose(tau: float) -> tuple:
    """Pose + world velocity on the circle at time tau (tangent heading)."""
    w = SPEED / RADIUS
    ang = w * tau
    p = np.array(
        [RADIUS * np.sin(ang), RADIUS * (1.0 - np.cos(ang)), 0.0], np.float64
    )
    v = np.array(
        [SPEED * np.cos(ang), SPEED * np.sin(ang), 0.0], np.float64
    )
    pose = Rigid3(
        quat_from_yaw(jnp.float32(ang)), jnp.asarray(p, jnp.float32)
    )
    return pose, v


def main():
    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": SCAN_PERIOD,
                "frames_for_static_initialization": 8,
                "enable_ndt_initialization": False,
                "submaps": {
                    "high_resolution": 0.2,
                    "low_resolution": 0.8,
                    "high_resolution_extent": 128,
                    "low_resolution_extent": 64,
                    "num_range_data": 16,
                },
            },
            "pose_graph": {
                "optimization_problem": {
                    "use_inter_huber": os.environ.get("E2E_HUBER", "1") == "1",
                },
                "optimize_every_n_nodes": 32,  # periodic, as the reference
                "max_submaps": 32,
                "max_nodes": 512,
                "max_constraints": 2048,
                "max_radius_enable_loop_detection": 10.0,
                "num_close_submaps_loop_with_initial_value": 5,
                "constraint_builder": {
                    "min_score": float(os.environ.get("E2E_MIN_SCORE", "0.45")),
                    "every_nodes_to_find_constraint": 2,
                },
            },
        },
    )
    builder = MapBuilder(cfg)
    world = SyntheticWorld.create(num_beams=16, num_azimuths=600)
    # gyro bias -> yaw drift over the lap; modest white noise on top
    sim = ImuSimulator(
        rate=100.0,
        noise=ImuNoise(
            acc_noise=0.02 * NOISE_SCALE,
            gyr_noise=0.002 * NOISE_SCALE,
            gyr_bias0=(0.0, 0.0, BIAS_Z),  # yaw-rate bias -> drift
        ),
        gravity=G,
        seed=4,
    )

    # static-init phase at the circle start
    t = 0.0
    n_rest = int(round(REST / SCAN_PERIOD))
    pose0, _ = circle_pose(0.0)
    for _ in range(n_rest):
        dts, accs, gyrs, mask = sim.between(
            pose0, pose0, np.zeros(3), np.zeros(3), SCAN_PERIOD, 64
        )
        k = int(np.asarray(mask).sum())
        for i in range(k):
            t += float(dts[i])
            builder.add_imu_data(t, np.asarray(accs[i]), np.asarray(gyrs[i]))
        pts, ptimes = world.cast_scan(pose0)
        builder.add_range_data(t, pts, ptimes)

    total = int(round(LAPS * 2 * np.pi * RADIUS / SPEED / SCAN_PERIOD))
    gt = []  # (node time approx, true position)
    prev_pose, prev_v = pose0, np.zeros(3)
    tau = 0.0
    for k in range(total):
        tau += SCAN_PERIOD
        pose, v = circle_pose(tau)
        dts, accs, gyrs, mask = sim.between(
            prev_pose, pose, prev_v, v, SCAN_PERIOD, 64
        )
        n = int(np.asarray(mask).sum())
        for i in range(n):
            t += float(dts[i])
            builder.add_imu_data(t, np.asarray(accs[i]), np.asarray(gyrs[i]))
        pts, ptimes = world.cast_scan(pose)
        n_before = len(builder.pose_graph.nodes)
        res = builder.add_range_data(t, pts, ptimes)
        # gt aligns with NODES: the motion filter drops slow scans without
        # creating a node (reference semantics)
        if len(builder.pose_graph.nodes) > n_before:
            gt.append((t, np.asarray(pose.translation, np.float64)))
            if os.environ.get("E2E_DEBUG"):
                est = np.asarray(
                    builder.pose_graph.nodes[-1].global_pose.translation
                )
                err = float(np.linalg.norm(est - gt[-1][1]))
                print(f"scan {k:3d} err {err:7.3f}  est {est.round(2)}  "
                      f"gt {gt[-1][1].round(2)}", flush=True)
        prev_pose, prev_v = pose, v

    pg = builder.pose_graph
    pg.wait_for_all_computations()
    inter = [c for c in pg.constraints if c.tag == "INTER"]

    def current_ate() -> float:
        # nodes append in scan order and gt records one entry per produced
        # result, so the sequences align by index
        n = min(len(pg.nodes), len(gt))
        est = np.stack(
            [np.asarray(pg.nodes[i].global_pose.translation) for i in range(n)]
        )
        true = np.stack([gt[i][1] for i in range(n)])
        return float(ate_rmse(est, true, align=False))

    def endpoint_err() -> float:
        n = min(len(pg.nodes), len(gt))
        return float(np.linalg.norm(
            np.asarray(pg.nodes[n - 1].global_pose.translation)
            - gt[n - 1][1]
        ))

    if os.environ.get("E2E_DEBUG"):
        from dliom_tpu.transform.rigid import (
            np_compose, np_inverse, np_rigid, np_quat_yaw,
        )

        for c in inter:
            sub = pg.submaps[c.submap_id]
            node = pg.nodes[c.node_id]
            implied = np_compose(
                np_inverse(np_rigid(sub.global_pose)),
                np_rigid(node.global_pose),
            )
            dt_ = float(np.linalg.norm(
                implied.translation - np.asarray(c.relative.translation)
            ))
            print(f"INTER s{c.submap_id} n{c.node_id} score {c.score:.2f} "
                  f"resid_t {dt_:6.2f} rel_t "
                  f"{np.asarray(c.relative.translation).round(2)}",
                  flush=True)

    pre, pre_end = current_ate(), endpoint_err()
    print(json.dumps({
        "phase": "pre_final_optimization", "ate_rmse_m": round(pre, 4),
        "endpoint_err_m": round(pre_end, 4),
        "num_inter": len(inter), "num_nodes": len(pg.nodes),
        "num_submaps": len(pg.submaps),
    }), flush=True)
    pg.run_final_optimization()
    post, post_end = current_ate(), endpoint_err()
    print(json.dumps({
        "phase": "post_final_optimization", "ate_rmse_m": round(post, 4),
        "endpoint_err_m": round(post_end, 4),
        "improvement": round(pre / max(post, 1e-9), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
