"""≥1 km multi-loop synthetic sequence through the offline runner.

VERDICT r2 item 3: one order of magnitude beyond the 36 m e2e circle — a
stadium course of ~529 m per lap driven for two laps (~1.06 km, ~2600
scans at 10 Hz), with DISTINCT sceneries along the track (procedural wall
segments + post clusters, a new layout every few meters), genuine revisit
drift (IMU white noise + bias offsets + bias random walk), and gravity
misalignment (constant 3 deg mount roll). The sequence is written in the
offline runner's .npz dataset schema and replayed with
`dliom_tpu.runner.offline.run` — the same eval loop as the reference
(offline_node.cc replay -> WriteTrajectoryForDLIO CSV ->
cartographer/ground_truth metrics) — with periodic + final optimization
and background-style loop search active.

Reports (JSON lines):
  - the runner report: end-to-end scans/s WITH the backend on,
    per-finished-submap constraint-search latency, pre- and
    post-final-optimization ATE
  - constraint precision vs ground truth: an INTER constraint is correct
    if its relative pose matches the ground-truth relative (submap gt
    anchored through its first node) within 1.0 m / 0.25 rad
  - revisit recall: of the (finished submap, sampled node) pairs whose
    ground-truth positions lie within `recall_radius` and are >= 60 s
    apart, the fraction with a found constraint

Usage:
  python tools/long_course.py                 # full 2-lap course (TPU)
  python tools/long_course.py --laps 0.3      # quick smoke (CPU ok)

Record the numbers in PARITY.md.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from dliom_tpu.io.synthetic import (  # noqa: E402
    ImuNoise,
    ImuSimulator,
    _np_quat_multiply,
    _np_quat_to_matrix,
)
from dliom_tpu.transform.rigid import Rigid3  # noqa: E402

G = 9.80511
SCAN_PERIOD = 0.1
SPEED = 4.0  # m/s — brisk ground robot / slow vehicle
STRAIGHT = 170.0  # stadium straight length (m)
RADIUS = 30.0  # stadium end-cap radius (m)
REST = 1.6  # static-init phase (s)
ROLL_TILT = 0.05  # rad (~3 deg) — gravity misalignment of the IMU mount
Z_AMPL = 0.8  # gentle vertical undulation (m)
Z_WAVELEN = 120.0  # (m)
SENSOR_Z = 1.5  # sensor height above ground plane (m)


def _perimeter() -> float:
    return 2.0 * STRAIGHT + 2.0 * np.pi * RADIUS


def _centerline(s: float):
    """Stadium centerline: arclength s -> (xy position, heading angle).
    Straights along +-x at y=0 and y=2R; end caps at x=+-STRAIGHT/2."""
    P = _perimeter()
    s = s % P
    L, R = STRAIGHT, RADIUS
    if s < L:  # bottom straight, +x
        return np.array([s - L / 2, 0.0]), 0.0
    s -= L
    if s < np.pi * R:  # right cap, CCW
        a = s / R
        c = np.array([L / 2, R])
        return c + R * np.array([np.sin(a), -np.cos(a)]), a
    s -= np.pi * R
    if s < L:  # top straight, -x
        return np.array([L / 2 - s, 2 * R]), np.pi
    s -= L
    a = s / R  # left cap
    c = np.array([-L / 2, R])
    return c + R * np.array([-np.sin(a), np.cos(a)]), np.pi + a


def _quat_yaw_roll(yaw: float, roll: float) -> np.ndarray:
    qz = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
    qx = np.array([np.cos(roll / 2), np.sin(roll / 2), 0.0, 0.0])
    return _np_quat_multiply(qz, qx)


T_RAMP = 3.0  # s of linear acceleration from rest to SPEED (~1.3 m/s^2)


def _arclength(tau: float) -> float:
    if tau < T_RAMP:
        return SPEED * tau * tau / (2.0 * T_RAMP)
    return SPEED * (tau - T_RAMP / 2.0)


def course_pose(tau: float):
    """Ground-truth pose (numpy q wxyz, p) at time tau along the course."""
    s = _arclength(tau)
    xy, heading = _centerline(s)
    # body origin IS the sensor origin (tracking frame), SENSOR_Z above
    # the ground plane, with gentle vertical undulation
    z = SENSOR_Z + Z_AMPL * np.sin(2 * np.pi * s / Z_WAVELEN)
    p = np.array([xy[0], xy[1], z])
    q = _quat_yaw_roll(heading, ROLL_TILT)
    return q, p


class CourseWorld:
    """Procedural pillar-and-wall world along the course corridor: every
    `seg` meters of arclength gets a distinct feature group (wall segments
    made of stacked sphere rows, or scattered post stacks) seeded by its
    segment index — distinct sceneries, so loop closures must match real
    local geometry. Plus a ground plane. Ray casting is pure numpy with
    per-scan distance culling (host data generation must not dispatch
    device ops)."""

    def __init__(self, seed: int = 7, seg: float = 6.0):
        rng = np.random.default_rng(seed)
        P = _perimeter()
        centers, radii = [], []
        for k in range(int(P / seg)):
            s = (k + 0.5) * seg
            xy, heading = _centerline(s)
            srng = np.random.default_rng(seed * 100003 + k)
            n_world = np.array([-np.sin(heading), np.cos(heading)])
            t_world = np.array([np.cos(heading), np.sin(heading)])
            if srng.random() < 0.5:
                # wall segment: a dense sphere row, 4 layers tall, at a
                # FULLY random world angle (track-parallel walls would
                # leave longitudinal translation unconstrained)
                side = 1.0 if srng.random() < 0.5 else -1.0
                dist = srng.uniform(7.0, 16.0)
                ang = srng.uniform(0.0, np.pi)
                length = srng.uniform(6.0, 12.0)
                base = xy + side * dist * n_world
                d = np.array([np.cos(ang), np.sin(ang)])
                for u in np.arange(-length / 2, length / 2, 0.8):
                    for h in (0.4, 1.2, 2.0, 2.8):
                        c = base + u * d
                        centers.append([c[0], c[1], h])
                        radii.append(0.5)
            else:
                # scattered posts: vertical stacks at random offsets
                # (longitudinal + lateral anchors at once)
                for _ in range(srng.integers(5, 10)):
                    side = 1.0 if srng.random() < 0.5 else -1.0
                    dist = srng.uniform(5.0, 18.0)
                    along = srng.uniform(-seg / 2, seg / 2)
                    c = xy + side * dist * n_world + along * t_world
                    r = srng.uniform(0.3, 0.7)
                    for h in (0.5, 1.5, 2.5, 3.5, 4.5):
                        centers.append([c[0], c[1], h])
                        radii.append(r)
            # Ground clutter (rocks/shrubs) in every segment: without it
            # the near field is a featureless plane whose grazing-incidence
            # ground cells don't repeat between passes, so a CORRECT
            # revisit pose scores 0.28-0.53 at the reference's 0.45 BnB
            # gate (measured via tools/loop_debug.py) — unrepresentative of
            # the real LiDAR scenes the gate was tuned on. Clutter gives
            # the <=15 m high-res matching cloud repeatable structure.
            for _ in range(srng.integers(8, 14)):
                side = 1.0 if srng.random() < 0.5 else -1.0
                dist = srng.uniform(2.0, 14.0)
                along = srng.uniform(-seg / 2, seg / 2)
                c = xy + side * dist * n_world + along * t_world
                r = srng.uniform(0.2, 0.5)
                centers.append([c[0], c[1], 0.8 * r])
                radii.append(r)
        self.centers = np.asarray(centers, np.float64)
        self.radii = np.asarray(radii, np.float64)
        self.ground_z = 0.0

        # 16-beam x 400-azimuth rangefinder, +-15 deg elevation (VIRAL-like)
        rs = np.arange(-8, 8)
        ss = np.arange(-200, 200)
        az, el = np.meshgrid(
            np.pi * ss / 200.0, np.pi / 12.0 * rs / 8.0, indexing="ij"
        )
        self.dirs = np.stack(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), -np.sin(el)],
            axis=-1,
        ).reshape(-1, 3)

    def cast_scan(self, q: np.ndarray, p: np.ndarray, max_range: float = 75.0):
        """Returns hit points in the tracking frame (N, 3) float32."""
        rmat = _np_quat_to_matrix(q)
        origin = np.asarray(p, np.float64)
        d = self.dirs @ rmat.T  # (R, 3) world directions

        t = np.full(d.shape[0], 1e9)
        # ground plane
        dz = d[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            tg = (self.ground_z - origin[2]) / dz
        t = np.where((dz < 0) & (tg > 0), np.minimum(t, tg), t)
        # spheres within range of this scan
        near = (
            np.linalg.norm(self.centers[:, :2] - origin[None, :2], axis=1)
            < max_range + 2.0
        )
        C, R = self.centers[near], self.radii[near]
        if len(C):
            oc = origin[None, :] - C  # (M, 3)
            beta = d @ oc.T  # (R, M)
            c = np.sum(oc * oc, axis=-1)[None, :] - (R**2)[None, :]
            disc = beta * beta - c
            root = -beta - np.sqrt(np.maximum(disc, 0.0))
            root = np.where((disc >= 0.0) & (root > 0.0), root, 1e9)
            t = np.minimum(t, np.min(root, axis=1))
        hit = t < max_range
        world = origin[None, :] + t[:, None] * d
        pts = (world[hit] - origin[None, :]) @ rmat  # tracking frame
        return pts.astype(np.float32)


def generate(path: str, laps: float, seed: int = 11):
    """Write the .npz dataset; returns (gt_times, gt_quats, gt_positions)."""
    world = CourseWorld()
    sim = ImuSimulator(
        rate=100.0,
        noise=ImuNoise(
            acc_noise=0.02,
            gyr_noise=0.002,
            acc_bias_walk=2e-4,
            gyr_bias_walk=2e-5,
            acc_bias0=(0.05, -0.03, 0.02),
            gyr_bias0=(0.0004, -0.0003, 0.0012),
        ),
        gravity=G,
        seed=seed,
    )

    arrays = {}
    imu_t, imu_a, imu_g = [], [], []

    # The REST phase must contain SCANS, not just IMU: the static
    # initializer consumes frames_for_static_initialization scans assuming
    # the platform is at rest — if motion starts with the first scan, init
    # ends with a ~1.3 m/s velocity error the window fusion then pays for
    # as a multi-meter longitudinal slip. The rest poses carry the tilted
    # mount (gravity misalignment the initializer must estimate away).
    q0, p0 = course_pose(0.0)
    t = 0.0
    total = int(round(
        (REST + laps * _perimeter() / SPEED + T_RAMP / 2.0) / SCAN_PERIOD
    ))
    gt_times, gt_quats, gt_pos = [], [], []
    prev_q, prev_p = q0, p0
    prev_v = np.zeros(3)
    tau = -REST
    n_scan = 0
    for k in range(total):
        tau += SCAN_PERIOD
        q, p = course_pose(max(tau, 0.0))
        qn, pn = course_pose(max(tau + SCAN_PERIOD, 0.0))
        v = (pn - prev_p) / (2 * SCAN_PERIOD)  # central difference
        # Rigid3 built directly from numpy (no jnp.asarray): host generation
        # must never dispatch device ops, and between() is pure numpy inside.
        dts_, accs_, gyrs_, mask = sim.between(
            Rigid3(rotation=prev_q, translation=prev_p),
            Rigid3(rotation=q, translation=p),
            prev_v,
            v,
            SCAN_PERIOD,
            16,
        )
        dts_np = np.asarray(dts_)
        accs_np = np.asarray(accs_, np.float32)
        gyrs_np = np.asarray(gyrs_, np.float32)
        n = int(np.asarray(mask).sum())
        for i in range(n):
            t += float(dts_np[i])
            imu_t.append(t)
            imu_a.append(accs_np[i])
            imu_g.append(gyrs_np[i])
        pts = world.cast_scan(q, p)
        arrays[f"scans/{n_scan}/points"] = pts
        arrays[f"scans/{n_scan}/times"] = np.zeros(len(pts), np.float32)
        arrays[f"scans/{n_scan}/stamp"] = np.float64(t)
        gt_times.append(t)
        gt_quats.append(q)
        gt_pos.append(p)
        n_scan += 1
        prev_q, prev_p, prev_v = q, p, v

    arrays["imu/times"] = np.asarray(imu_t)
    arrays["imu/acc"] = np.stack(imu_a)
    arrays["imu/gyr"] = np.stack(imu_g)
    arrays["gt/times"] = np.asarray(gt_times)
    # rebase ground truth onto the SLAM's local frame origin (the run
    # starts at identity): raw un-aligned ATE is then meaningful
    arrays["gt/positions"] = np.stack(gt_pos) - p0
    arrays["gt/rotations"] = np.stack(gt_quats)  # wxyz, extra key
    np.savez_compressed(path, **arrays)
    return (
        np.asarray(gt_times),
        np.stack(gt_quats),
        arrays["gt/positions"],
    )


def _np_rigid_inv_compose(qa, pa, qb, pb):
    """T_a^-1 * T_b as (q, p) numpy wxyz."""
    qa_c = qa * np.array([1.0, -1.0, -1.0, -1.0])
    q = _np_quat_multiply(qa_c, qb)
    p = _np_quat_to_matrix(qa).T @ (pb - pa)
    return q, p


def _quat_angle(q):
    return float(2.0 * np.arctan2(np.linalg.norm(q[1:]), abs(q[0])))


def evaluate_constraints(builder, gt, recall_radius=7.0, min_sep=60.0):
    """Constraint precision vs ground truth + revisit recall (see module
    docstring for the definitions)."""
    gt_times, gt_quats, gt_pos = gt
    pg = builder.pose_graph

    def node_gt(nid):
        tn = pg.nodes[nid].time
        i = int(np.argmin(np.abs(gt_times - tn)))
        return gt_quats[i], gt_pos[i]

    def submap_gt(sid):
        sub = pg.submaps[sid]
        if not sub.node_ids:
            return None
        n0 = sub.node_ids[0]
        qn, pn = node_gt(n0)
        node_l = pg.nodes[n0].local_pose
        # submap frame through its first node: local offset is drift-free
        # over the shared creation epoch
        qo, po = _np_rigid_inv_compose(
            np.asarray(node_l.rotation, np.float64),
            np.asarray(node_l.translation, np.float64),
            np.asarray(sub.local_pose.rotation, np.float64),
            np.asarray(sub.local_pose.translation, np.float64),
        )
        q = _np_quat_multiply(qn, qo)
        p = pn + _np_quat_to_matrix(qn) @ po
        return q, p

    inter = [c for c in pg.constraints if c.tag == "INTER"]
    correct = 0
    errs = []
    for c in inter:
        sgt = submap_gt(c.submap_id)
        if sgt is None:
            continue
        qs, ps = sgt
        qn, pn = node_gt(c.node_id)
        q_rel, p_rel = _np_rigid_inv_compose(qs, ps, qn, pn)
        dt_ = float(
            np.linalg.norm(
                p_rel - np.asarray(c.relative.translation, np.float64)
            )
        )
        dq = _np_quat_multiply(
            q_rel * np.array([1.0, -1.0, -1.0, -1.0]),
            np.asarray(c.relative.rotation, np.float64),
        )
        dr = _quat_angle(dq)
        errs.append((dt_, dr))
        if dt_ < 1.0 and dr < 0.25:
            correct += 1

    # revisit recall over time-separated close pairs, sampled at the
    # constraint builder's node stride
    every = max(1, pg.cfg.constraint_builder.every_nodes_to_find_constraint)
    have = {(c.submap_id, c.node_id) for c in inter}
    sub_centers = {}
    for sid, sub in enumerate(pg.submaps):
        if sub.finished and sub.node_ids:
            sgt = submap_gt(sid)
            if sgt is not None:
                sub_centers[sid] = (sgt[1], pg.nodes[sub.node_ids[0]].time)
    opportunities = 0
    hits = 0
    for sid, (ps, ts) in sub_centers.items():
        sub_nodes = set(pg.submaps[sid].node_ids)
        for nid in range(0, len(pg.nodes), every):
            if nid in sub_nodes:
                continue
            tn = pg.nodes[nid].time
            if abs(tn - ts) < min_sep:
                continue
            _, pn = node_gt(nid)
            if np.linalg.norm(pn - ps) < recall_radius:
                opportunities += 1
                if (sid, nid) in have:
                    hits += 1
    out = {
        "num_inter": len(inter),
        "constraint_precision": (
            round(correct / len(inter), 4) if inter else None
        ),
        "mean_constraint_t_err_m": (
            round(float(np.mean([e[0] for e in errs])), 3) if errs else None
        ),
        "revisit_opportunities": opportunities,
        "revisit_recall": (
            round(hits / opportunities, 4) if opportunities else None
        ),
    }
    # Yaw-fan validation at scale (VERDICT r4 #8): per-constraint yaw the
    # search had to recover vs the initial guess, bucketed along the course
    # (node time) so the fan half-width (config with_initial_yaw_window,
    # default 0.15 rad) is checked against the drift regime it must survive.
    yc = np.asarray([abs(c.yaw_correction) for c in inter])
    if len(yc):
        fan = pg.cfg.constraint_builder.with_initial_yaw_window
        t_nodes = np.asarray([pg.nodes[c.node_id].time for c in inter])
        half = t_nodes > np.median(t_nodes)
        out["yaw_correction_rad"] = {
            "p50": round(float(np.percentile(yc, 50)), 4),
            "p95": round(float(np.percentile(yc, 95)), 4),
            "max": round(float(np.max(yc)), 4),
            "fan_half_width": fan,
            "frac_beyond_half_fan": round(float(np.mean(yc > fan / 2)), 4),
            "late_half_p95": (
                round(float(np.percentile(yc[half], 95)), 4)
                if half.any() else None
            ),
        }
    return out


def course_overrides() -> dict:
    """The course's engine configuration (shared with tools/loop_debug.py)."""
    return {
        # 2 background workers (not the reference's 8): the chip runs one
        # program at a time — worker count is queue-ahead depth, and 2
        # measured fastest on the e2e bench (see bench.py).
        "map_builder": {"num_background_threads": 2},
        "trajectory_builder": {
            "scan_period": SCAN_PERIOD,
            "min_range": 1.0,
            "max_range": 60.0,
            "voxel_filter_size": 0.25,
            "frames_for_static_initialization": 10,
            "enable_ndt_initialization": False,
            # The reference's own outdoor configs disable the gravity
            # factor (viral.lua / kaist.lua): its GravityFactor pulls
            # yaw-removed roll/pitch toward the world gravity direction
            # (gravity_factor.cc attitudeError), which fights a platform
            # with a PERSISTENT mount tilt like this course's 3 deg roll.
            "enable_gravity_factor": False,
            "motion_filter": {"max_time_seconds": 0.2,
                              "max_distance_meters": 0.1,
                              "max_angle_radians": 0.004},
            "submaps": {
                "high_resolution": 0.2,
                "high_resolution_max_range": 40.0,
                "low_resolution": 0.8,
                "num_range_data": 40,
                "high_resolution_extent": 256,
                # Crop-coverage rule: extent * resolution must cover the
                # matched cloud's max_range from anywhere in the submap.
                # The low adaptive filter reaches 60 m (reference
                # MAX_3D_RANGE) and a node sits up to ~16 m from the
                # submap origin -> ±76.8 m at 192 cells. At 96 cells only
                # ~70% of a correct revisit's low cloud fell inside the
                # crop, diluting the 0.55 low-resolution gate below
                # passing (measured via tools/loop_debug.py).
                "low_resolution_extent": 192,
            },
            "max_filtered_points": 8192,
            # 512: the adaptive filters target the reference's 150/200
            # min_num_points; loop-search gather cost scales with this
            # capacity (padding rows still gather)
            "max_high_res_points": 512,
            "max_low_res_points": 512,
            "window_size": 6,
            "gn_iterations": 3,
            "ceres_scan_matcher": {"max_num_iterations": 12},
        },
        "pose_graph": {
            "optimize_every_n_nodes": 100,  # VIRAL (viral.lua:20)
            "max_submaps": 256,
            "max_nodes": 8192,
            "max_constraints": 8192,
            "max_radius_enable_loop_detection": 15.0,
            "num_close_submaps_loop_with_initial_value": 5,
            "constraint_builder": {
                "min_score": 0.45,
                "every_nodes_to_find_constraint": 4,
            },
        },
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--laps", type=float, default=2.0)
    ap.add_argument("--dataset", default=None,
                    help="reuse an existing generated .npz")
    ap.add_argument("--keep-dataset", default=None,
                    help="write the generated .npz here (default: temp)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--extra-overrides", default=None,
                    help="JSON config dict deep-merged over the course "
                         "defaults (A/B experiments, e.g. "
                         "'{\"pose_graph\": {\"constraint_builder\": "
                         "{\"coarse_scoring_stride\": 1}}}')")
    args = ap.parse_args()

    from dliom_tpu.runner import offline

    if args.dataset:
        path = args.dataset
        z = np.load(path)
        gt = (z["gt/times"], z["gt/rotations"], z["gt/positions"])
    else:
        path = args.keep_dataset or os.path.join(
            tempfile.gettempdir(), f"long_course_{args.laps}_{args.seed}.npz"
        )
        gt = generate(path, args.laps, args.seed)
        print(json.dumps({
            "phase": "generated", "dataset": path,
            "num_scans": int(len(gt[0])),
            "course_length_m": round(args.laps * _perimeter(), 1),
        }), flush=True)

    overrides = course_overrides()
    if args.extra_overrides:
        def deep_merge(base, extra):
            for k, v in extra.items():
                if isinstance(v, dict) and isinstance(base.get(k), dict):
                    deep_merge(base[k], v)
                else:
                    base[k] = v
        deep_merge(overrides, json.loads(args.extra_overrides))
    run_args = argparse.Namespace(
        dataset=path, preset="basic",
        config_overrides=json.dumps(overrides),
        output_csv=None, output_state=None, output_pbstream=None,
        output_range_data=None, output_kitti=None, output_tum=None,
        output_relations=None, relations_min_covered_distance=100.0,
        output_ply=None, output_xray=None, assets_pipeline=None,
        assets_dir=None, verbose=bool(os.environ.get("LC_VERBOSE")),
        load_state=None, pure_localization=False, profile=None,
        background_threads=True, pipeline_depth=1,
    )

    extra = {}

    def on_builder(builder, report):
        extra.update(evaluate_constraints(builder, gt))

    report = offline.run(run_args, on_builder=on_builder)
    report.update(extra)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
