"""Long-course harness smoke test: the generator's IMU must be consistent
with its ground truth, and the offline runner must report the round-3
evidence fields (pre-optimization ATE, constraint-search latency) plus the
tool's constraint precision/recall metrics (tools/long_course.py; the
reference's eval loop is offline_node.cc replay -> ground_truth metrics)."""

import argparse
import json
import os
import tempfile

import numpy as np

import tools.long_course as lc


def test_generated_imu_consistent_with_ground_truth():
    """Strapdown-integrating the generated IMU from the first ground-truth
    state must track the ground-truth positions (validates tilt handling,
    the speed ramp, and the rest phase)."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "course.npz")
        gt_t, gt_q, gt_p = lc.generate(path, laps=0.02, seed=3)
        z = np.load(path)
    t_imu = z["imu/times"]
    acc = z["imu/acc"].astype(np.float64)
    gyr = z["imu/gyr"].astype(np.float64)
    G = lc.G

    def qmat(q):
        w, x, y, zz = q
        return np.array([
            [1 - 2 * (y * y + zz * zz), 2 * (x * y - w * zz), 2 * (x * zz + w * y)],
            [2 * (x * y + w * zz), 1 - 2 * (x * x + zz * zz), 2 * (y * zz - w * x)],
            [2 * (x * zz - w * y), 2 * (y * zz + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])

    q = gt_q[0].astype(np.float64)
    p = gt_p[0].astype(np.float64).copy()
    v = np.zeros(3)
    gw = np.array([0.0, 0.0, -G])
    i0 = int(np.searchsorted(t_imu, gt_t[0], side="right"))
    prev_t = gt_t[0]
    max_err = 0.0
    gi = 1
    for i in range(i0, len(t_imu)):
        dt = t_imu[i] - prev_t
        prev_t = t_imu[i]
        w = gyr[i] * dt
        th = np.linalg.norm(w)
        dq = (
            np.array([np.cos(th / 2), *(np.sin(th / 2) * w / th)])
            if th > 1e-12
            else np.array([1.0, *(0.5 * w)])
        )
        a_w = qmat(q) @ acc[i] + gw
        q = qmul(q, dq)
        q /= np.linalg.norm(q)
        v = v + a_w * dt
        p = p + v * dt + 0.5 * a_w * dt * dt
        while gi < len(gt_t) and gt_t[gi] <= t_imu[i] + 1e-9:
            max_err = max(max_err, float(np.linalg.norm(p - gt_p[gi])))
            gi += 1
    # the generator uses the noiseless limit only in this test's tolerance
    # sense: bias0 + noise integrate to a bounded error over ~7 s
    assert max_err < 1.0, max_err


def test_runner_reports_pre_optimization_and_latency(tmp_path):
    path = str(tmp_path / "course.npz")
    gt = lc.generate(path, laps=0.015, seed=5)

    from dliom_tpu.runner import offline

    overrides = {
        "trajectory_builder": {
            "scan_period": lc.SCAN_PERIOD,
            "min_range": 1.0,
            "max_range": 50.0,
            "voxel_filter_size": 0.4,
            "frames_for_static_initialization": 8,
            "enable_ndt_initialization": False,
            "enable_gravity_factor": False,
            "motion_filter": {"max_time_seconds": 0.2,
                              "max_distance_meters": 0.1,
                              "max_angle_radians": 0.004},
            "submaps": {
                "high_resolution": 0.3,
                "high_resolution_max_range": 30.0,
                "low_resolution": 0.9,
                "num_range_data": 8,
                "high_resolution_extent": 128,
                "low_resolution_extent": 64,
            },
            "max_filtered_points": 4096,
            "max_high_res_points": 512,
            "max_low_res_points": 512,
            "window_size": 4,
            "gn_iterations": 2,
            "ceres_scan_matcher": {"max_num_iterations": 6},
        },
        "pose_graph": {
            "optimize_every_n_nodes": 0,
            "constraint_builder": {"every_nodes_to_find_constraint": 4},
        },
    }
    args = argparse.Namespace(
        dataset=path, preset="basic",
        config_overrides=json.dumps(overrides),
        output_csv=None, output_state=None, output_pbstream=None,
        output_range_data=None, output_kitti=None, output_tum=None,
        output_relations=None, relations_min_covered_distance=100.0,
        output_ply=None, output_xray=None, assets_pipeline=None,
        assets_dir=None, verbose=False, load_state=None,
        pure_localization=False, profile=None,
    )
    captured = {}

    def on_builder(builder, report):
        captured.update(lc.evaluate_constraints(builder, gt))
        captured["n_lat"] = len(
            builder.pose_graph.constraint_search_seconds
        )

    report = offline.run(args, on_builder=on_builder)
    assert "pre_optimization_ate_rmse_m" in report
    assert "ate_rmse_m" in report
    # submaps finished (num_range_data=8) -> latency entries recorded and
    # surfaced in the report
    assert report["num_submaps"] >= 2
    assert captured["n_lat"] >= 1
    assert report["constraint_search_latency_s"]["count"] == captured["n_lat"]
    # the short straight segment tracks tightly even with noise + tilt
    assert report["pre_optimization_ate_rmse_aligned_m"] < 0.5
    # precision/recall fields exist (no revisits on a short straight)
    assert "constraint_precision" in captured
    assert "revisit_recall" in captured
