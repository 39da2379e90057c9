"""Ground-truth relation tools (cartographer/ground_truth/ analog, C38).

`generate_ground_truth` derives loop-closure *relations* from an optimized
pose graph (autogenerate_ground_truth_main.cc:92-167): every INTER constraint
whose endpoints are far apart along the trajectory (covered distance >=
`min_covered_distance`) and whose constraint agrees with the optimized
solution within the outlier thresholds yields an expected relative pose
between the submap's representative node (its first INTRA node,
ComputeSubmapRepresentativeNode :72-89) and the matched node.

`compute_relations_metrics` replays relations against a (possibly different)
trajectory and reports the reference's statistics
(compute_relations_metrics_main.cc:55-112): abs translational error (m) and
abs rotational error (deg), each mean +/- stddev, plus squared versions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dliom_tpu.transform.rigid import Rigid3, quat_angle


@dataclass
class Relation:
    timestamp1: float
    timestamp2: float
    expected: Rigid3  # node1 -> node2
    covered_distance: float


def _covered_distance(node_positions: np.ndarray) -> np.ndarray:
    """Cumulative trajectory arc length per node (:49-63)."""
    steps = np.linalg.norm(np.diff(node_positions, axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(steps)])


def generate_ground_truth(
    pose_graph,
    min_covered_distance: float = 100.0,
    outlier_threshold_meters: float = 0.15,
    outlier_threshold_radians: float = 0.02,
) -> Tuple[List[Relation], int]:
    """Relations from INTER constraints of an optimized PoseGraph. Returns
    (relations, num_outliers)."""
    nodes = pose_graph.nodes
    positions = np.stack(
        [np.asarray(n.global_pose.translation) for n in nodes]
    )
    covered = _covered_distance(positions)

    # representative node per submap = its first INTRA-constrained node
    rep: Dict[int, int] = {}
    for c in pose_graph.constraints:
        if c.tag == "INTRA" and c.submap_id not in rep:
            rep[c.submap_id] = c.node_id

    relations: List[Relation] = []
    num_outliers = 0
    for c in pose_graph.constraints:
        if c.tag != "INTER" or c.submap_id not in rep:
            continue
        rep_node = rep[c.submap_id]
        matched = c.node_id
        d = abs(covered[matched] - covered[rep_node])
        if d < min_covered_distance:
            continue
        sol1 = nodes[rep_node].global_pose
        sol2 = nodes[matched].global_pose
        solution = sol1.inverse().compose(sol2)
        submap_sol = pose_graph.submaps[c.submap_id].global_pose
        expected = sol1.inverse().compose(submap_sol).compose(c.relative)
        err = solution.compose(expected.inverse())
        t_err = float(jnp.linalg.norm(err.translation))
        r_err = float(quat_angle(err.rotation))
        if t_err > outlier_threshold_meters or r_err > outlier_threshold_radians:
            num_outliers += 1
            continue
        relations.append(
            Relation(
                timestamp1=nodes[rep_node].time,
                timestamp2=nodes[matched].time,
                expected=expected,
                covered_distance=d,
            )
        )
    return relations, num_outliers


def _interpolated_pose(times: np.ndarray, poses: Sequence[Rigid3], t: float) -> Rigid3:
    """Pose at time t: nearest-neighbor between trajectory nodes (the
    reference interpolates through TransformInterpolationBuffer; relations
    are stamped at node times, so the lookup is exact in practice)."""
    i = int(np.clip(np.searchsorted(times, t), 0, len(times) - 1))
    if i > 0 and abs(times[i - 1] - t) < abs(times[i] - t):
        i -= 1
    return poses[i]


def compute_relations_metrics(
    relations: Sequence[Relation],
    times: np.ndarray,
    poses: Sequence[Rigid3],
) -> Dict[str, float]:
    """Abs trans/rot errors of a trajectory vs relations (:55-112)."""
    t_errs, r_errs_deg = [], []
    times = np.asarray(times)
    for rel in relations:
        p1 = _interpolated_pose(times, poses, rel.timestamp1)
        p2 = _interpolated_pose(times, poses, rel.timestamp2)
        solution = p1.inverse().compose(p2)
        err = solution.compose(rel.expected.inverse())
        t_errs.append(float(jnp.linalg.norm(err.translation)))
        r_errs_deg.append(math.degrees(float(quat_angle(err.rotation))))
    t = np.asarray(t_errs) if t_errs else np.zeros(0)
    r = np.asarray(r_errs_deg) if r_errs_deg else np.zeros(0)

    def stats(v):
        if len(v) == 0:
            return 0.0, 0.0
        return float(v.mean()), float(v.std())

    tm, ts = stats(t)
    rm, rs = stats(r)
    sq_tm, sq_ts = stats(t**2)
    sq_rm, sq_rs = stats(r**2)
    return {
        "num_relations": len(relations),
        "abs_translational_error_mean_m": tm,
        "abs_translational_error_std_m": ts,
        "sq_translational_error_mean_m2": sq_tm,
        "sq_translational_error_std_m2": sq_ts,
        "abs_rotational_error_mean_deg": rm,
        "abs_rotational_error_std_deg": rs,
        "sq_rotational_error_mean_deg2": sq_rm,
        "sq_rotational_error_std_deg2": sq_rs,
    }


def write_relations_csv(path: str, relations: Sequence[Relation]) -> None:
    """Text export (relations_text_file.cc analog; CSV instead of proto)."""
    with open(path, "w") as f:
        f.write("t1,t2,covered_distance,tx,ty,tz,qw,qx,qy,qz\n")
        for r in relations:
            t = np.asarray(r.expected.translation)
            q = np.asarray(r.expected.rotation)
            f.write(
                f"{r.timestamp1},{r.timestamp2},{r.covered_distance},"
                f"{t[0]},{t[1]},{t[2]},{q[0]},{q[1]},{q[2]},{q[3]}\n"
            )


def read_relations_csv(path: str) -> List[Relation]:
    out = []
    with open(path) as f:
        next(f)
        for line in f:
            vals = [float(x) for x in line.strip().split(",")]
            out.append(
                Relation(
                    timestamp1=vals[0],
                    timestamp2=vals[1],
                    covered_distance=vals[2],
                    expected=Rigid3(
                        rotation=jnp.asarray(vals[6:10], jnp.float32),
                        translation=jnp.asarray(vals[3:6], jnp.float32),
                    ),
                )
            )
    return out


def refine_relations_ndt(
    pose_graph,
    relations: List[Relation],
    *,
    ndt_resolution: float = 1.0,
    max_iterations: int = 35,
    max_refinement_meters: float = 0.5,
) -> Tuple[List[Relation], int]:
    """Refine relation transforms by NDT-aligning the two nodes' stored
    clouds, seeded with the optimized relative pose
    (gen_ground_truth_by_ndt_match.cc: PCL NDT at resolution 1.0, 35
    iterations, seeded with the pbstream relative; non-converged pairs are
    dropped). A refinement that moves the relative by more than
    `max_refinement_meters` is treated as non-converged. Returns
    (refined relations, num_dropped)."""
    import jax.numpy as jnp

    from dliom_tpu.mapping.grid import GridSpec
    from dliom_tpu.ops.ndt import build_field, match as ndt_match
    from dliom_tpu.transform.rigid import np_rigid

    spec = GridSpec(resolution=float(ndt_resolution), extent=128)
    # Relations carry no trajectory id (reference relations files don't
    # either), so an ambiguous stamp — two trajectories sharing a clock
    # origin — cannot be resolved; drop it loudly rather than refine
    # against the wrong trajectory's cloud.
    by_time: Dict[float, int] = {}
    ambiguous = set()
    for i, n in enumerate(pose_graph.nodes):
        k = round(n.time, 9)
        if k in by_time:
            ambiguous.add(k)
        by_time[k] = i
    refined: List[Relation] = []
    dropped = 0
    for rel in relations:
        k1, k2 = round(rel.timestamp1, 9), round(rel.timestamp2, 9)
        if k1 in ambiguous or k2 in ambiguous:
            import warnings

            warnings.warn(
                f"relation stamp {rel.timestamp1}/{rel.timestamp2} matches "
                "nodes on multiple trajectories; dropping (stamps must be "
                "unique to refine)",
                stacklevel=2,
            )
            dropped += 1
            continue
        i = by_time.get(k1)
        j = by_time.get(k2)
        if i is None or j is None:
            dropped += 1
            continue
        a, b = pose_graph.nodes[i], pose_graph.nodes[j]
        field = build_field(
            jnp.asarray(a.high_points), jnp.asarray(a.high_mask), spec
        )
        out = ndt_match(
            field, spec,
            jnp.asarray(b.high_points), jnp.asarray(b.high_mask),
            rel.expected,
            max_iterations=max_iterations,
        )
        out = np_rigid(out)
        shift = float(
            np.linalg.norm(
                out.translation - np.asarray(rel.expected.translation)
            )
        )
        if shift > max_refinement_meters:
            dropped += 1
            continue
        refined.append(
            Relation(
                timestamp1=rel.timestamp1,
                timestamp2=rel.timestamp2,
                expected=out,
                covered_distance=rel.covered_distance,
            )
        )
    return refined, dropped
