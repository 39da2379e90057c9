"""Ground-truth relation tools tests (cartographer/ground_truth analog)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from dliom_tpu.evaluation.ground_truth import (
    Relation,
    compute_relations_metrics,
    generate_ground_truth,
    read_relations_csv,
    write_relations_csv,
)
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw


class _Node:
    def __init__(self, time, pose):
        self.time = time
        self.global_pose = pose


class _Submap:
    def __init__(self, pose):
        self.global_pose = pose


class _Constraint:
    def __init__(self, submap_id, node_id, relative, tag):
        self.submap_id, self.node_id, self.relative, self.tag = (
            submap_id, node_id, relative, tag
        )


class _Graph:
    pass


def _loop_graph(constraint_noise=0.0):
    """Long out-and-back trajectory with a consistent loop constraint."""
    g = _Graph()
    # 0..60 m out along x, then back: nodes every 2 m
    xs = list(np.arange(0, 62, 2.0)) + list(np.arange(60, -2, -2.0))
    g.nodes = [
        _Node(float(i) * 0.5, Rigid3.translation_only(jnp.asarray([x, 0.0, 0.0])))
        for i, x in enumerate(xs)
    ]
    g.submaps = [_Submap(g.nodes[0].global_pose)]
    last = len(g.nodes) - 1
    g.constraints = [
        _Constraint(0, 0, Rigid3.identity(), "INTRA"),
        # loop: node `last` (back at x=0) vs submap 0
        _Constraint(
            0, last,
            Rigid3.translation_only(
                jnp.asarray([constraint_noise, 0.0, 0.0])
            ),
            "INTER",
        ),
    ]
    return g, last


def test_generate_and_metrics_roundtrip():
    g, last = _loop_graph()
    rels, outliers = generate_ground_truth(g, min_covered_distance=50.0)
    assert outliers == 0 and len(rels) == 1
    r = rels[0]
    assert r.covered_distance > 100.0
    np.testing.assert_allclose(np.asarray(r.expected.translation), 0.0, atol=1e-5)

    # perfect trajectory scores ~zero error
    times = [n.time for n in g.nodes]
    poses = [n.global_pose for n in g.nodes]
    m = compute_relations_metrics(rels, times, poses)
    assert m["num_relations"] == 1
    assert m["abs_translational_error_mean_m"] < 1e-5

    # a drifted trajectory scores the injected drift
    drifted = [
        Rigid3.translation_only(p.translation + jnp.asarray([0.0, 0.5 * (i == len(poses) - 1), 0.0]))
        for i, p in enumerate(poses)
    ]
    m2 = compute_relations_metrics(rels, times, drifted)
    np.testing.assert_allclose(m2["abs_translational_error_mean_m"], 0.5, atol=1e-5)


def test_outlier_rejection_and_min_distance():
    g, last = _loop_graph(constraint_noise=0.5)  # disagrees with solution
    rels, outliers = generate_ground_truth(g, min_covered_distance=50.0)
    assert outliers == 1 and len(rels) == 0
    g2, _ = _loop_graph()
    rels2, _ = generate_ground_truth(g2, min_covered_distance=1e6)
    assert len(rels2) == 0  # too little covered distance


def test_relations_csv_roundtrip():
    g, _ = _loop_graph()
    rels, _ = generate_ground_truth(g, min_covered_distance=50.0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "relations.csv")
        write_relations_csv(p, rels)
        back = read_relations_csv(p)
        assert len(back) == 1
        np.testing.assert_allclose(
            np.asarray(back[0].expected.translation),
            np.asarray(rels[0].expected.translation),
            atol=1e-6,
        )


def test_kitti_and_tum_export():
    from dliom_tpu.evaluation.ate import write_kitti_trajectory, write_tum_trajectory
    from dliom_tpu.transform.rigid import quat_from_yaw

    poses = [
        Rigid3(quat_from_yaw(jnp.float32(0.3 * k)),
               jnp.asarray([1.0 * k, 2.0, 0.5], jnp.float32))
        for k in range(3)
    ]
    with tempfile.TemporaryDirectory() as d:
        kp = os.path.join(d, "kitti.txt")
        write_kitti_trajectory(kp, poses)
        rows = open(kp).read().strip().splitlines()
        assert len(rows) == 3 and len(rows[0].split()) == 12
        vals = np.asarray([float(x) for x in rows[1].split()]).reshape(3, 4)
        np.testing.assert_allclose(vals[:, 3], [1.0, 2.0, 0.5], atol=1e-6)
        # rotation block orthonormal
        np.testing.assert_allclose(vals[:, :3] @ vals[:, :3].T, np.eye(3), atol=1e-5)

        tp = os.path.join(d, "tum.txt")
        write_tum_trajectory(tp, [0.0, 0.1, 0.2], poses)
        rows = open(tp).read().strip().splitlines()
        assert len(rows) == 3 and len(rows[0].split()) == 8


def test_refine_relations_ndt():
    """gen_ground_truth_by_ndt_match analog: NDT refinement recovers the
    true relative pose from a perturbed relation seed and drops
    non-converging pairs."""
    import jax.numpy as jnp

    import tests.test_pose_graph as tpg
    from dliom_tpu.backend.pose_graph import PoseGraph
    from dliom_tpu.evaluation.ground_truth import (
        Relation,
        refine_relations_ndt,
    )
    from dliom_tpu.transform.rigid import Rigid3

    cfg = tpg._cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    rng = np.random.default_rng(5)
    pts = tpg._world_cloud(rng, 400)
    s0 = pg.add_submap(Rigid3.identity())
    n0 = tpg._make_node(cfg, pts, Rigid3.identity())
    n0.time = 1.0
    pg.add_node(n0, (s0,))
    # second node observes the same world from 0.4 m away -> its tracking
    # cloud is the world shifted by -0.4 m
    true_rel = Rigid3.translation_only(jnp.asarray([0.4, 0.0, 0.0]))
    pts2 = np.asarray(true_rel.inverse().apply(jnp.asarray(pts)))
    n1 = tpg._make_node(cfg, pts2, true_rel)
    n1.time = 2.0
    pg.add_node(n1, (s0,))

    seed = Rigid3.translation_only(jnp.asarray([0.3, 0.05, 0.0]))  # off by 10 cm
    rels = [Relation(1.0, 2.0, seed, 10.0)]
    refined, dropped = refine_relations_ndt(pg, rels)
    assert dropped == 0 and len(refined) == 1
    np.testing.assert_allclose(
        np.asarray(refined[0].expected.translation), [0.4, 0.0, 0.0],
        atol=0.05,
    )
    # a relation whose timestamps match no node is dropped
    refined2, dropped2 = refine_relations_ndt(
        pg, [Relation(7.7, 8.8, seed, 10.0)]
    )
    assert dropped2 == 1 and not refined2
