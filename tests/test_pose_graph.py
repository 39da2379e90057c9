"""Pose graph tests (pose_graph_3d_test.cc / constraint_builder_3d_test.cc
analogs): bookkeeping, compression round-trip, loop-constraint discovery,
and drift correction through optimization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dliom_tpu.backend.compression import compress, decompress
from dliom_tpu.backend.pose_graph import Constraint, NodeRecord, PoseGraph
from dliom_tpu.common.config import load_config
from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec, cell_index, make_grid, set_cells
from dliom_tpu.mapping.submap import grid_specs
from dliom_tpu.ops.rotational_histogram import compute_histogram
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw


def _cfg():
    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "submaps": {
                    "high_resolution": 0.2,
                    "low_resolution": 0.8,
                    "high_resolution_extent": 128,
                    "low_resolution_extent": 64,
                },
            },
            "pose_graph": {
                "optimize_every_n_nodes": 0,  # manual
                "max_submaps": 16,
                "max_nodes": 128,
                "max_constraints": 512,
                "max_radius_enable_loop_detection": 10.0,
                "num_close_submaps_loop_with_initial_value": 5,
                "constraint_builder": {
                    "min_score": 0.4,
                    "every_nodes_to_find_constraint": 1,
                    "fast_correlative_scan_matcher": {
                        "branch_and_bound_depth": 6,
                        "full_resolution_depth": 3,
                        "min_low_resolution_score": 0.35,
                        "linear_xy_search_window": 3.0,
                        "linear_z_search_window": 1.5,
                    },
                },
            },
        },
    )
    return cfg


def _world_cloud(rng, n=1200):
    wall_a = np.stack(
        [np.full(n // 3, 8.0), rng.uniform(-6, 6, n // 3), rng.uniform(-2, 2, n // 3)], -1
    )
    wall_b = np.stack(
        [rng.uniform(-6, 6, n // 3), np.full(n // 3, -7.0), rng.uniform(-2, 2, n // 3)], -1
    )
    floor = np.stack(
        [rng.uniform(-6, 6, n - 2 * (n // 3)), rng.uniform(-6, 6, n - 2 * (n // 3)),
         np.full(n - 2 * (n // 3), -2.0)], -1
    )
    return np.concatenate([wall_a, wall_b, floor]).astype(np.float32)


def test_compression_roundtrip():
    spec = GridSpec(resolution=0.5, extent=32)
    rng = np.random.default_rng(0)
    g = make_grid(spec)
    cells = jnp.asarray(rng.integers(-14, 14, size=(200, 3)), jnp.int32)
    vals = jnp.asarray(rng.integers(1, 32768, size=(200,)), jnp.int32)
    g = set_cells(g, cells, vals, spec)
    comp = compress(g, spec, capacity=4096)
    back = decompress(comp, spec)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(g))
    # over-capacity keeps the highest-probability cells
    comp_small = compress(g, spec, capacity=64)
    back_small = np.asarray(decompress(comp_small, spec))
    kept = np.sort(back_small[back_small > 0])
    all_sorted = np.sort(np.asarray(g)[np.asarray(g) > 0])
    np.testing.assert_array_equal(kept, all_sorted[-len(kept):])


_HISTOGRAM_CACHE: dict = {}


def _make_node(cfg, points, local_pose, gravity_q=None):
    pts = jnp.asarray(points)
    mask = jnp.ones(pts.shape[0], bool)
    # cache the (eager, dispatch-heavy) histogram per distinct cloud: the
    # soak test makes 5k nodes from ONE cloud and must time graph
    # bookkeeping, not fixture compute. The cache holds the points array
    # itself and re-checks identity — id() alone can be recycled after GC.
    key = (id(points), cfg.trajectory_builder.rotational_histogram_size)
    entry = _HISTOGRAM_CACHE.get(key)
    if entry is not None and entry[0] is points:
        hist = entry[1]
    else:
        hist = np.asarray(
            compute_histogram(
                pts, mask, cfg.trajectory_builder.rotational_histogram_size
            )
        )
        _HISTOGRAM_CACHE[key] = (points, hist)
    return NodeRecord(
        time=0.0,
        local_pose=local_pose,
        gravity_alignment=np.asarray([1.0, 0, 0, 0], np.float32)
        if gravity_q is None
        else gravity_q,
        high_points=pts,
        high_mask=mask,
        low_points=pts,
        low_mask=mask,
        histogram=hist,
        submap_ids=(),
    )


def test_intra_constraints_and_global_poses():
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    rng = np.random.default_rng(1)
    points = _world_cloud(rng, 300)
    s0 = pg.add_submap(Rigid3.identity())
    node = _make_node(cfg, points, Rigid3.translation_only(jnp.asarray([1.0, 0.0, 0.0])))
    nid = pg.add_node(node, (s0,))
    assert nid == 0
    assert len(pg.constraints) == 1 and pg.constraints[0].tag == "INTRA"
    np.testing.assert_allclose(
        np.asarray(pg.nodes[0].global_pose.translation), [1.0, 0.0, 0.0], atol=1e-6
    )


@pytest.mark.parametrize("use_mesh", [False, True])
def test_loop_closure_finds_and_corrects_drift(use_mesh):
    # use_mesh: the same search with the node batch sharded over the 8
    # virtual devices (ICI-sharded constraint computation, SURVEY §2.4)
    cfg = _cfg()
    tb = cfg.trajectory_builder
    mesh = (
        jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
        if use_mesh
        else None
    )
    pg = PoseGraph(cfg.pose_graph, tb, mesh=mesh)
    hi, lo = grid_specs(tb.submaps)
    rng = np.random.default_rng(2)
    points = _world_cloud(rng)
    pts = jnp.asarray(points)
    vals = jnp.full((points.shape[0],), pv.probability_to_value(jnp.float32(0.9)))

    # Submap 0 at the origin containing the world structure.
    s0 = pg.add_submap(Rigid3.identity())
    g_hi0 = set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals, hi)
    g_lo0 = set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals, lo)
    n0 = pg.add_node(_make_node(cfg, points, Rigid3.identity()), (s0,))
    pg.finish_submap(s0, g_hi0, g_lo0)

    # Submap 1 elsewhere (no loop candidates: adjacent to both).
    s1 = pg.add_submap(Rigid3.translation_only(jnp.asarray([4.0, 0.0, 0.0])))
    pg.add_node(
        _make_node(cfg, points, Rigid3.translation_only(jnp.asarray([4.0, 0.0, 0.0]))),
        (s1,),
    )

    # Submap 2: the robot returns to the SAME place, but accumulated local
    # drift of ~0.8 m: its LOCAL pose says (0.8, -0.5, 0.2) while the true
    # pose is the origin. The node's cloud is the original world cloud.
    drift = jnp.asarray([0.8, -0.5, 0.2])
    s2 = pg.add_submap(Rigid3.translation_only(drift))
    node2 = _make_node(cfg, points, Rigid3.translation_only(drift))
    # finishing submap 2 triggers loop search of its nodes vs submap 0
    g_hi2 = set_cells(
        make_grid(hi), cell_index(pts + drift[None, :], hi.resolution), vals, hi
    )
    g_lo2 = set_cells(
        make_grid(lo), cell_index(pts + drift[None, :], lo.resolution), vals, lo
    )
    pg.add_node(
        node2, (s2,), newly_finished_submap_id=s2, finished_grids=(g_hi2, g_lo2)
    )

    inter = [c for c in pg.constraints if c.tag == "INTER"]
    assert len(inter) >= 1, "loop constraint not found"
    c = inter[0]
    assert c.submap_id == s0
    # the matched relative pose puts the node at the TRUE location (origin)
    # recovery to within ~1 high-res cell per axis
    np.testing.assert_allclose(
        np.asarray(c.relative.translation), [0.0, 0.0, 0.0], atol=0.3
    )

    # Optimization pulls the drifted node toward the truth.
    before = float(jnp.linalg.norm(pg.nodes[2].global_pose.translation))
    pg.run_final_optimization()
    after = float(jnp.linalg.norm(pg.nodes[2].global_pose.translation))
    assert after < 0.45 * before, (before, after)
    # first submap stays fixed
    np.testing.assert_allclose(
        np.asarray(pg.submap_poses()[0].translation), 0.0, atol=1e-6
    )


def test_image_proposal_recovers_high_drift_loop():
    """Drift far beyond max_radius_enable_loop_detection: the proximity path
    cannot propose the pair, but the submap-image correlation (the SURF-path
    substitute, C10) seeds a valid initial guess."""
    cfg = _cfg()
    import dataclasses as dc

    pgc = dc.replace(
        cfg.pose_graph,
        max_radius_enable_loop_detection=2.0,  # proximity gate too small
        num_close_submaps_loop_with_initial_value=1,
    )
    tb = cfg.trajectory_builder
    pg = PoseGraph(pgc, tb)
    hi, lo = grid_specs(tb.submaps)
    rng = np.random.default_rng(4)
    points = _world_cloud(rng)
    pts = jnp.asarray(points)
    vals = jnp.full((points.shape[0],), pv.probability_to_value(jnp.float32(0.9)))

    s0 = pg.add_submap(Rigid3.identity())
    g_hi0 = set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals, hi)
    g_lo0 = set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals, lo)
    pg.add_node(_make_node(cfg, points, Rigid3.identity()), (s0,))
    pg.finish_submap(s0, g_hi0, g_lo0)

    s1 = pg.add_submap(Rigid3.translation_only(jnp.asarray([5.0, 0.0, 0.0])))
    pg.add_node(
        _make_node(cfg, points, Rigid3.translation_only(jnp.asarray([5.0, 0.0, 0.0]))),
        (s1,),
    )
    pg.finish_submap(s1, g_hi0, g_lo0)

    # Revisit the origin with 8 m of accumulated drift (>> 2 m gate, and
    # outside the 3 m correlative search window without a proposal). Within
    # the submap the drift cancels (content is mapped with believed poses),
    # so submap 2's grid content equals submap 0's.
    drift = jnp.asarray([6.0, -5.0, 0.1])
    s2 = pg.add_submap(Rigid3.translation_only(drift))
    node2 = _make_node(cfg, points, Rigid3.translation_only(drift))
    pg.add_node(
        node2, (s2,), newly_finished_submap_id=s2, finished_grids=(g_hi0, g_lo0)
    )

    inter = [c for c in pg.constraints if c.tag == "INTER" and c.submap_id == s0]
    assert inter, "image proposal did not produce the high-drift loop"
    np.testing.assert_allclose(
        np.asarray(inter[0].relative.translation), [0.0, 0.0, 0.0], atol=0.4
    )

def test_gps_fixed_frame_corrects_drift_via_pose_graph_api():
    """add_fixed_frame_pose + optimization pulls a drifted chain toward
    the GPS positions (PoseGraph::AddFixedFramePoseData analog)."""
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    rng = np.random.default_rng(7)
    points = _world_cloud(rng, 300)
    true_xs = [0.0, 2.0, 4.0, 6.0]
    drift = np.array([0.0, 0.3, 0.6, 0.9], np.float32)  # growing drift
    for k, x in enumerate(true_xs):
        s = pg.add_submap(
            Rigid3.translation_only(jnp.asarray([x + drift[k], 0.0, 0.0]))
        )
        nid = pg.add_node(
            _make_node(
                cfg, points,
                Rigid3.translation_only(jnp.asarray([x + drift[k], 0.0, 0.0])),
            ),
            (s,),
        )
        pg.add_fixed_frame_pose(nid, np.asarray([x, 0.0, 0.0]), weight=100.0)
    pg.run_optimization(iterations=10)
    for k, x in enumerate(true_xs):
        got = float(pg.nodes[k].global_pose.translation[0])
        assert abs(got - x) < 0.1, (k, got, x)


def test_landmark_observations_via_pose_graph_api():
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    rng = np.random.default_rng(8)
    points = _world_cloud(rng, 300)
    true_lm = np.array([1.0, 2.0, 0.5], np.float32)
    for k in range(3):
        pose = Rigid3.translation_only(jnp.asarray([2.0 * k, 0.0, 0.0]))
        s = pg.add_submap(pose)
        nid = pg.add_node(_make_node(cfg, points, pose), (s,))
        pg.add_landmark_observation(
            nid, "lm0", true_lm - np.asarray(pose.translation), weight=10.0
        )
    pg.run_optimization(iterations=6)
    got = pg.landmark_poses()["lm0"]
    np.testing.assert_allclose(got, true_lm, atol=0.05)


@pytest.mark.slow
def test_host_bookkeeping_soak_5k_nodes():
    """Host-path scalability soak (round-1 weak #6): 5k nodes / ~100
    submaps of INTRA bookkeeping plus constraint-index queries must stay
    comfortably sub-linear-in-C per operation (the old linear
    _has_constraint scan made this loop O(C*N)). No device work: clouds
    are tiny and no submap is ever finished."""
    import time as _time

    cfg = _cfg()
    import dataclasses as dc

    pgc = dc.replace(
        cfg.pose_graph, optimize_every_n_nodes=0, max_nodes=8192,
        max_submaps=256, max_constraints=16384,
    )
    pg = PoseGraph(pgc, cfg.trajectory_builder)
    rng = np.random.default_rng(9)
    points = _world_cloud(rng, 32)
    t0 = _time.perf_counter()
    sid = pg.add_submap(Rigid3.identity())
    for k in range(5000):
        if k and k % 50 == 0:
            sid = pg.add_submap(
                Rigid3.translation_only(jnp.asarray([0.1 * k, 0.0, 0.0]))
            )
        pg.add_node(
            _make_node(
                cfg, points,
                Rigid3.translation_only(jnp.asarray([0.1 * k, 0.0, 0.0])),
            ),
            (sid,),
        )
        # the background-search membership probe pattern
        assert pg._has_constraint(sid, len(pg.nodes) - 1)
        assert not pg._has_constraint(sid, len(pg.nodes) + 7)
    elapsed = _time.perf_counter() - t0
    assert len(pg.nodes) == 5000 and len(pg.constraints) >= 5000
    # generous wall bound: the round-1 linear scan was O(C) per probe and
    # blew far past this on loaded hosts
    assert elapsed < 60.0, elapsed


def test_loop_closure_recovers_yaw_drifted_initial():
    """With-initial yaw fan (ConstraintBuilderConfig
    .with_initial_num_yaw_candidates): a revisit whose local estimate
    carries accumulated YAW drift — beyond what the single-yaw
    MatchWith3DofInitial tolerates — is still recovered, because the fan
    searches a narrow yaw window around the initial (a restriction of
    upstream Match()'s ±45° yaw search, fast_correlative_scan_matcher_3d
    .cc:146-196)."""
    cfg = _cfg()
    tb = cfg.trajectory_builder
    pg = PoseGraph(cfg.pose_graph, tb)
    hi, lo = grid_specs(tb.submaps)
    rng = np.random.default_rng(5)
    points = _world_cloud(rng)
    pts = jnp.asarray(points)
    vals = jnp.full(
        (points.shape[0],), pv.probability_to_value(jnp.float32(0.9))
    )

    s0 = pg.add_submap(Rigid3.identity())
    g_hi0 = set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals, hi)
    g_lo0 = set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals, lo)
    pg.add_node(_make_node(cfg, points, Rigid3.identity()), (s0,))
    pg.finish_submap(s0, g_hi0, g_lo0)

    s1 = pg.add_submap(Rigid3.translation_only(jnp.asarray([4.0, 0.0, 0.0])))
    pg.add_node(
        _make_node(
            cfg, points, Rigid3.translation_only(jnp.asarray([4.0, 0.0, 0.0]))
        ),
        (s1,),
    )

    # True pose: origin. Local estimate: 0.6 m translation drift AND a 6
    # degree yaw error (inside the ±0.15 rad fan window, outside what a
    # single-yaw discrete match scores above the gate on this world).
    yaw_err = 0.105
    drift_pose = Rigid3(
        quat_from_yaw(jnp.float32(yaw_err)), jnp.asarray([0.6, -0.4, 0.1])
    )
    s2 = pg.add_submap(drift_pose)
    node2 = _make_node(cfg, points, drift_pose)
    world2 = drift_pose.apply(pts)
    g_hi2 = set_cells(
        make_grid(hi), cell_index(world2, hi.resolution), vals, hi
    )
    g_lo2 = set_cells(
        make_grid(lo), cell_index(world2, lo.resolution), vals, lo
    )
    pg.add_node(
        node2, (s2,), newly_finished_submap_id=s2, finished_grids=(g_hi2, g_lo2)
    )

    inter = [c for c in pg.constraints if c.tag == "INTER"]
    assert len(inter) >= 1, "yaw-drifted loop constraint not found"
    c = [c for c in inter if c.submap_id == s0][0]
    # the recovered relative puts the node near the true origin with the
    # yaw error corrected (fan spacing 0.05 rad -> up to ~0.025 rad of
    # residual yaw and a couple of high-res cells of translation before the
    # GN refinement; the SPA consumes the refined pose)
    np.testing.assert_allclose(
        np.asarray(c.relative.translation), [0.0, 0.0, 0.0], atol=0.4
    )
    rel_yaw = 2.0 * float(
        jnp.arctan2(c.relative.rotation[3], c.relative.rotation[0])
    )
    assert abs(rel_yaw) < 0.06, rel_yaw
