"""Multi-trajectory mapping + global localization tests
(map_builder.cc:98-169 AddTrajectoryBuilder, pose_graph_3d.cc trajectory
connectivity, fast_correlative_scan_matcher_3d.cc:199-250 MatchFullSubmap).

Two trajectories map the same world in DIFFERENT local frames: no shared
frame exists until the whole-submap global search finds an inter-trajectory
constraint, connects the trajectories, and joint optimization aligns them.
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend.pose_graph import PoseGraph
from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import cell_index, make_grid, set_cells
from dliom_tpu.mapping.submap import grid_specs
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw
from tests.test_pose_graph import _cfg, _make_node, _world_cloud


def _grids(cfg, points):
    """Dense hi/lo grids of `points` (already in the submap frame)."""
    hi, lo = grid_specs(cfg.trajectory_builder.submaps)
    pts = jnp.asarray(points)
    vals = jnp.full((pts.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    g_hi = set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals, hi)
    g_lo = set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals, lo)
    return g_hi, g_lo


def test_connectivity_bookkeeping():
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    a = pg.add_trajectory()
    b = pg.add_trajectory()
    c = pg.add_trajectory()
    assert (a, b, c) == (0, 1, 2)
    assert pg.trajectories_connected(a, a)
    assert not pg.trajectories_connected(a, b)
    pg.connect_trajectories(a, b, time=5.0)
    assert pg.trajectories_connected(a, b)
    assert not pg.trajectories_connected(a, c)
    pg.connect_trajectories(b, c, time=9.0)
    assert pg.trajectories_connected(a, c)  # transitive
    assert pg.last_connection_time(a, b) == 5.0
    assert pg.last_connection_time(a, c) == float("-inf")  # never DIRECT
    pg.finish_trajectory(b)
    assert pg.trajectory_states()[b] == "FINISHED"


def test_inter_trajectory_global_constraint_and_joint_optimization():
    """Trajectory 1's local frame is offset+rotated vs trajectory 0's; the
    global (MatchFullSubmap) search must recover the alignment with NO
    usable translation prior, connect the trajectories, and optimization
    must bring both trajectories into one world frame."""
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    t0 = pg.add_trajectory()
    t1 = pg.add_trajectory()
    rng = np.random.default_rng(11)
    points = _world_cloud(rng)

    # trajectory 0: one finished submap of the world at its origin
    s0 = pg.add_submap(Rigid3.identity(), trajectory_id=t0)
    n0_rec = _make_node(cfg, points, Rigid3.identity())
    n0_rec.trajectory_id = t0
    pg.add_node(n0_rec, (s0,))
    g_hi0, g_lo0 = _grids(cfg, points)
    pg.finish_submap(s0, g_hi0, g_lo0)

    # trajectory 1 revisits the SAME place (true world pose: identity, so
    # its tracking-frame cloud is the raw world cloud), but its LOCAL frame
    # claims a (2.0, 1.0, 0) translation and a 45-degree yaw — a meaningless
    # prior across disconnected trajectories. node-in-submap is identity, so
    # s1's grids hold the raw cloud too.
    yaw = np.pi / 4
    offset = np.asarray([2.0, 1.0, 0.0], np.float32)
    local1 = Rigid3(quat_from_yaw(jnp.float32(yaw)), jnp.asarray(offset))
    s1 = pg.add_submap(local1, trajectory_id=t1)
    node1 = _make_node(cfg, points, local1)
    node1.trajectory_id = t1
    g_hi1, g_lo1 = _grids(cfg, points)
    pg.add_node(
        node1, (s1,), newly_finished_submap_id=s1, finished_grids=(g_hi1, g_lo1)
    )

    inter = [c for c in pg.constraints if c.tag == "INTER"]
    assert inter, "global inter-trajectory constraint not found"
    c = inter[0]
    assert pg.submaps[c.submap_id].trajectory_id != pg.nodes[c.node_id].trajectory_id
    assert pg.trajectories_connected(t0, t1)
    # the TRUE node-in-s0 pose is identity (same world place)
    np.testing.assert_allclose(
        np.asarray(c.relative.translation), [0.0, 0.0, 0.0], atol=0.4
    )

    pg.run_final_optimization()
    # trajectory 1's node lands on trajectory 0's frame (the world origin)
    err = float(jnp.linalg.norm(pg.nodes[1].global_pose.translation))
    assert err < 0.4, err
    # trajectory 0 stays anchored
    np.testing.assert_allclose(
        np.asarray(pg.submaps[s0].global_pose.translation), 0.0, atol=1e-6
    )


def test_global_localization_against_frozen_map():
    """Kidnapped-start pure localization: a saved map is loaded FROZEN; a
    new trajectory starts at an unknown pose. The whole-submap search must
    localize it and optimization must move ONLY the live trajectory."""
    from dliom_tpu.io.serialization import load_state_into, save_state

    cfg = _cfg()
    rng = np.random.default_rng(12)
    points = _world_cloud(rng)

    # build + save the reference map
    pg_ref = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    t_ref = pg_ref.add_trajectory()
    s0 = pg_ref.add_submap(Rigid3.identity(), trajectory_id=t_ref)
    pg_ref.add_node(_make_node(cfg, points, Rigid3.identity()), (s0,))
    g_hi0, g_lo0 = _grids(cfg, points)
    pg_ref.finish_submap(s0, g_hi0, g_lo0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ref_map.npz")
        save_state(path, pg_ref)

        # fresh graph: load the map frozen, then map a live trajectory whose
        # local frame starts 3 m away from where it really is
        pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
        tid_map = load_state_into(pg, path, cfg, frozen=True)
        assert len(tid_map) == 1
        frozen_tid = next(iter(tid_map.values()))
        assert pg.trajectory_states()[frozen_tid] == "FROZEN"
        assert pg.submaps[0].frozen and pg.nodes[0].frozen

        live = pg.add_trajectory()
        wrong_start = Rigid3.translation_only(jnp.asarray([3.0, -2.0, 0.0]))
        s1 = pg.add_submap(wrong_start, trajectory_id=live)
        node = _make_node(cfg, points, wrong_start)
        node.trajectory_id = live
        g_hi1, g_lo1 = _grids(cfg, points)
        pg.add_node(
            node, (s1,), newly_finished_submap_id=s1,
            finished_grids=(g_hi1, g_lo1),
        )

        inter = [c for c in pg.constraints if c.tag == "INTER"]
        assert inter, "global localization constraint not found"
        assert pg.trajectories_connected(frozen_tid, live)

        pg.run_final_optimization()
        # live node localized onto the frozen map (true pose: origin)
        err = float(jnp.linalg.norm(pg.nodes[1].global_pose.translation))
        assert err < 0.4, err
        # frozen map did not move
        np.testing.assert_allclose(
            np.asarray(pg.submaps[0].global_pose.translation), 0.0, atol=1e-6
        )


def test_state_roundtrip_preserves_trajectory_ids():
    from dliom_tpu.io.serialization import load_state_into, save_state

    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    a = pg.add_trajectory()
    b = pg.add_trajectory()
    rng = np.random.default_rng(13)
    points = _world_cloud(rng, 200)
    sa = pg.add_submap(Rigid3.identity(), trajectory_id=a)
    na = pg.add_node(_make_node(cfg, points, Rigid3.identity()), (sa,))
    pg.nodes[na].trajectory_id = a
    sb = pg.add_submap(
        Rigid3.translation_only(jnp.asarray([5.0, 0.0, 0.0])), trajectory_id=b
    )
    nb_rec = _make_node(
        cfg, points, Rigid3.translation_only(jnp.asarray([5.0, 0.0, 0.0]))
    )
    nb_rec.trajectory_id = b
    pg.add_node(nb_rec, (sb,))
    assert pg.submaps[sb].index_in_trajectory == 0  # first of trajectory b

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "two_traj.npz")
        save_state(path, pg)
        pg2 = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
        pg2.add_trajectory()  # pre-existing trajectory: remap must offset
        tid_map = load_state_into(pg2, path, cfg, frozen=False)
        assert sorted(tid_map.keys()) == [a, b]
        assert all(v >= 1 for v in tid_map.values())  # remapped past existing
        got = {pg2.submaps[0].trajectory_id, pg2.submaps[1].trajectory_id}
        assert got == set(tid_map.values())
        assert pg2.nodes[0].trajectory_id != pg2.nodes[1].trajectory_id


def test_num_close_zero_disables_all_loop_search():
    """num_close_submaps_loop_with_initial_value = 0 must disable BOTH the
    proximity path and the inter-trajectory global path (regression: the
    global candidate cap used out[-0:], returning everything instead of
    nothing)."""
    from dataclasses import replace

    cfg = _cfg()
    cfg = replace(
        cfg,
        pose_graph=replace(
            cfg.pose_graph, num_close_submaps_loop_with_initial_value=0
        ),
    )
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    t0 = pg.add_trajectory()
    t1 = pg.add_trajectory()
    rng = np.random.default_rng(7)
    points = _world_cloud(rng)

    s0 = pg.add_submap(Rigid3.identity(), trajectory_id=t0)
    n0 = _make_node(cfg, points, Rigid3.identity())
    n0.trajectory_id = t0
    pg.add_node(n0, (s0,))
    g_hi0, g_lo0 = _grids(cfg, points)
    pg.finish_submap(s0, g_hi0, g_lo0)

    s1 = pg.add_submap(Rigid3.identity(), trajectory_id=t1)
    n1 = _make_node(cfg, points, Rigid3.identity())
    n1.trajectory_id = t1
    g_hi1, g_lo1 = _grids(cfg, points)
    pg.add_node(
        n1, (s1,), newly_finished_submap_id=s1, finished_grids=(g_hi1, g_lo1)
    )
    pg.wait_for_all_computations()

    assert pg._close_submaps(s1) == []
    assert pg._global_candidates(s1) == []
    # NOTE: the image-proposal path (the SURF analog) is governed by the
    # constraint_builder options, not num_close — it may still propose, as
    # in the reference.
