"""pbstream write-path interop tests.

The strongest available oracle: compile the REFERENCE'S OWN .proto schema
(read-only, at test time, via protoc --descriptor_set_out) and parse the
file we emit with the real protobuf runtime — byte-level schema compliance,
not self-round-tripping. Skipped when protoc or the reference tree is
unavailable; the container-format test always runs.
"""

import os
import subprocess
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from dliom_tpu.backend.pose_graph import PoseGraph
from dliom_tpu.io.pbstream import (
    PbstreamReader,
    from_universal_ticks,
    to_universal_ticks,
    write_pbstream,
)
from dliom_tpu.transform.rigid import Rigid3
from tests.test_multi_trajectory import _grids
from tests.test_pose_graph import _cfg, _make_node, _world_cloud

_REF = "/root/reference/src/cartographer"
_HAVE_ORACLE = os.path.isdir(_REF) and os.system("which protoc > /dev/null") == 0


def _sample_graph():
    cfg = _cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    pg.add_trajectory()
    rng = np.random.default_rng(33)
    points = _world_cloud(rng, 400)
    s0 = pg.add_submap(Rigid3.identity())
    pg.add_node(_make_node(cfg, points, Rigid3.identity()), (s0,))
    g_hi, g_lo = _grids(cfg, points)
    pg.finish_submap(s0, g_hi, g_lo)
    s1 = pg.add_submap(Rigid3.translation_only(jnp.asarray([2.0, 0.5, 0.0])))
    n1 = _make_node(
        cfg, points, Rigid3.translation_only(jnp.asarray([2.0, 0.5, 0.0]))
    )
    n1.time = 12.25
    pg.add_node(n1, (s1,))
    return cfg, pg, points


def test_container_format_and_message_count():
    _, pg, _ = _sample_graph()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.pbstream")
        write_pbstream(path, pg)
        blobs = list(PbstreamReader(path))
    # header, pose graph, options, 2 submaps, 2 nodes, 1 trajectory data
    assert len(blobs) == 3 + 2 + 2 + 1
    assert all(isinstance(b, bytes) for b in blobs)


def test_time_conversion_roundtrip():
    t = 1723908000.1234567
    assert abs(from_universal_ticks(to_universal_ticks(t)) - t) < 1e-6


@pytest.mark.skipif(not _HAVE_ORACLE, reason="reference protos/protoc absent")
def test_reference_schema_parses_our_output():
    cfg, pg, points = _sample_graph()
    with tempfile.TemporaryDirectory() as d:
        ds = os.path.join(d, "schema.ds")
        subprocess.run(
            [
                "protoc", f"-I{_REF}", "--include_imports",
                f"--descriptor_set_out={ds}",
                "cartographer/mapping/proto/serialization.proto",
            ],
            check=True,
        )
        from google.protobuf import descriptor_pb2, descriptor_pool
        from google.protobuf import message_factory

        pool = descriptor_pool.DescriptorPool()
        fds = descriptor_pb2.FileDescriptorSet()
        with open(ds, "rb") as f:
            fds.ParseFromString(f.read())
        for fd in fds.file:
            pool.Add(fd)

        def msg(name):
            return message_factory.GetMessageClass(
                pool.FindMessageTypeByName(name)
            )

        Header = msg("cartographer.mapping.proto.SerializationHeader")
        Data = msg("cartographer.mapping.proto.SerializedData")

        path = os.path.join(d, "out.pbstream")
        write_pbstream(path, pg)
        blobs = list(PbstreamReader(path))

        header = Header.FromString(blobs[0])
        assert header.format_version == 1

        parsed = [Data.FromString(b) for b in blobs[1:]]
        kinds = [p.WhichOneof("data") for p in parsed]
        assert kinds[0] == "pose_graph"
        assert kinds[1] == "all_trajectory_builder_options"
        assert kinds.count("submap") == 2
        assert kinds.count("node") == 2
        assert kinds.count("trajectory_data") == 1

        pgp = parsed[0].pose_graph
        assert len(pgp.trajectory) == 1
        traj = pgp.trajectory[0]
        assert len(traj.node) == 2 and len(traj.submap) == 2
        # poses survive exactly
        np.testing.assert_allclose(
            [traj.submap[1].pose.translation.x,
             traj.submap[1].pose.translation.y],
            [2.0, 0.5], atol=1e-6,
        )
        assert traj.node[1].node_index == 1
        assert abs(from_universal_ticks(traj.node[1].timestamp) - 12.25) < 1e-6
        # constraints: 2 INTRA
        assert len(pgp.constraint) == 2
        assert all(c.tag == 0 for c in pgp.constraint)
        assert pgp.constraint[1].node_id.node_index == 1
        assert pgp.constraint[1].submap_id.submap_index == 1

        # submap 0 carries both hybrid grids; values/indices match the
        # compressed source
        sub0 = next(p.submap for p in parsed if p.WhichOneof("data") == "submap"
                    and p.submap.submap_id.submap_index == 0)
        grid = sub0.submap_3d.high_resolution_hybrid_grid
        assert grid.resolution == pytest.approx(
            cfg.trajectory_builder.submaps.high_resolution
        )
        count = int(pg.submaps[0].high.count)
        assert len(grid.values) == count
        assert len(grid.x_indices) == count
        assert all(1 <= v <= 32767 for v in grid.values)
        assert sub0.submap_3d.finished

        # node clouds decode through the reference block layout
        node0 = next(p.node for p in parsed if p.WhichOneof("data") == "node"
                     and p.node.node_id.node_index == 0)
        cloud = node0.node_data.high_resolution_point_cloud
        n_valid = int(np.asarray(pg.nodes[0].high_mask).sum())
        assert cloud.num_points == n_valid
        # unpack per the reference layout: [count, bx, by, bz, points...]
        data = list(cloud.point_data)
        total, i = 0, 0
        pts = []
        while i < len(data):
            cnt, bx, by, bz = data[i : i + 4]
            i += 4
            for p in data[i : i + cnt]:
                x = (p & 1023) + (bx << 10)
                y = ((p >> 10) & 1023) + (by << 10)
                z = ((p >> 20) & 1023) + (bz << 10)
                pts.append((x, y, z))
            i += cnt
            total += cnt
        assert total == n_valid
        got = np.asarray(pts, np.float64) * 0.001
        want = np.asarray(pg.nodes[0].high_points)[
            np.asarray(pg.nodes[0].high_mask)
        ]
        # same point set within quantization (order differs: block-sorted);
        # sort BOTH by (x, y, z)
        def xyz_sorted(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        got_sorted = xyz_sorted(got)
        want_sorted = xyz_sorted(np.round(want.astype(np.float64) / 0.001) * 0.001)
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-3)
        assert len(node0.node_data.rotational_scan_matcher_histogram) == (
            cfg.trajectory_builder.rotational_histogram_size
        )


def test_pbstream_read_path_roundtrip():
    """load_pbstream_into parses reference-schema streams back into a
    PoseGraph (the LoadState analog for maps produced by cartographer
    tooling): poses, grids, clouds, constraints and trajectory ids all
    survive the write -> read cycle."""
    from dliom_tpu.backend.compression import decompress
    from dliom_tpu.io.pbstream import load_pbstream_into

    cfg, pg, points = _sample_graph()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.pbstream")
        write_pbstream(path, pg)
        pg2 = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
        tid_map = load_pbstream_into(pg2, path, frozen=True)
        assert len(tid_map) == 1
        assert len(pg2.submaps) == len(pg.submaps)
        assert len(pg2.nodes) == len(pg.nodes)
        assert len(pg2.constraints) == len(pg.constraints)
        assert all(s.frozen for s in pg2.submaps)
        # poses survive (f32 <-> double round-trip)
        for a, b in zip(pg.submaps, pg2.submaps):
            np.testing.assert_allclose(
                np.asarray(a.global_pose.translation),
                np.asarray(b.global_pose.translation), atol=1e-5,
            )
        assert abs(pg2.nodes[1].time - pg.nodes[1].time) < 1e-6
        # the finished submap's grids decompress identically
        a, b = pg.submaps[0], pg2.submaps[0]
        assert b.finished and b.high is not None
        hi = pg._hi_spec
        np.testing.assert_array_equal(
            np.asarray(decompress(a.high, hi)), np.asarray(decompress(b.high, hi))
        )
        # node clouds: same point sets within 1 mm quantization
        va = np.asarray(pg.nodes[0].high_points)[np.asarray(pg.nodes[0].high_mask)]
        vb = np.asarray(pg2.nodes[0].high_points)[np.asarray(pg2.nodes[0].high_mask)]
        assert len(va) == len(vb)

        def srt(x):
            return x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]

        np.testing.assert_allclose(srt(vb), srt(va), atol=2e-3)
        # INTRA bookkeeping rebuilt
        assert pg2.submaps[0].node_ids and pg2.nodes[0].submap_ids
        # a loaded-then-reoptimized graph doesn't blow up
        pg2.run_optimization(iterations=2)


def test_localizes_against_reference_schema_fixture():
    """End-to-end interop with an artifact built THROUGH the reference's
    own proto schema: `tests/fixtures/reference_map.pbstream` was generated
    by `tools/make_reference_fixture.py` — its messages are serialized by
    protoc-compiled classes from the reference's serialization.proto (the
    byte encoding the reference's ProtoStreamWriter produces), NOT by this
    repo's writer. Loading it frozen and driving a live revisit must
    localize onto the fixture map (LoadState + pure localization,
    map_builder.cc:209-367 + 147-151)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.make_reference_fixture import fixture_specs, fixture_world_cloud

    from dliom_tpu.map_builder import map_builder_from_state

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "reference_map.pbstream"
    )
    assert os.path.exists(fixture), "checked-in fixture missing"
    cfg = _cfg()
    (hi_res, hi_ext), (lo_res, lo_ext) = fixture_specs()
    sm = cfg.trajectory_builder.submaps
    assert (sm.high_resolution, sm.high_resolution_extent) == (hi_res, hi_ext)
    assert (sm.low_resolution, sm.low_resolution_extent) == (lo_res, lo_ext)

    builder = map_builder_from_state(fixture, cfg, pure_localization=True)
    pg = builder.pose_graph
    frozen_tid = pg.submaps[0].trajectory_id
    assert pg.submaps[0].frozen and pg.submaps[0].finished
    assert pg.trajectory_states()[frozen_tid] == "FROZEN"
    # the fixture's grids decode into usable compressed grids
    assert int(pg.submaps[0].high.count) > 0

    # live revisit of the SAME world from a wrong local frame: the global
    # (MatchFullSubmap) search must localize it onto the fixture map
    world = fixture_world_cloud()
    live = 0  # the builder's eagerly-created live trajectory
    wrong_start = Rigid3.translation_only(jnp.asarray([3.0, -2.0, 0.0]))
    s1 = pg.add_submap(wrong_start, trajectory_id=live)
    node = _make_node(cfg, world, wrong_start)
    node.trajectory_id = live
    from tests.test_multi_trajectory import _grids

    g_hi1, g_lo1 = _grids(cfg, world)
    pg.add_node(
        node, (s1,), newly_finished_submap_id=s1,
        finished_grids=(g_hi1, g_lo1),
    )
    inter = [c for c in pg.constraints if c.tag == "INTER"]
    assert inter, "no localization constraint against the fixture map"
    assert pg.trajectories_connected(frozen_tid, live)
    pg.run_final_optimization()
    # the live node's true pose is the fixture map's origin
    err = float(np.linalg.norm(np.asarray(pg.nodes[-1].global_pose.translation)))
    assert err < 0.4, err
    np.testing.assert_allclose(
        np.asarray(pg.submaps[0].global_pose.translation), 0.0, atol=1e-6
    )


def test_map_builder_localizes_from_pbstream():
    """map_builder_from_state accepts .pbstream paths: a map produced in
    the reference schema loads FROZEN for pure localization."""
    from dliom_tpu.map_builder import map_builder_from_state

    cfg, pg, _ = _sample_graph()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "map.pbstream")
        write_pbstream(path, pg)
        builder = map_builder_from_state(path, cfg, pure_localization=True)
        bpg = builder.pose_graph
        assert len(bpg.submaps) == len(pg.submaps)
        assert all(s.frozen for s in bpg.submaps)
        # the loaded trajectory is FROZEN; the live trajectory (0) is active
        states = bpg.trajectory_states()
        assert "FROZEN" in states.values()
        assert states[0] == "ACTIVE"


@pytest.mark.skipif(not _HAVE_ORACLE, reason="reference protos/protoc absent")
def test_range_data_pbstream_schema():
    """The -save_range_data artifact parses under the reference's
    local_slam_range_data.proto schema (map viewer interop)."""
    import subprocess as sp

    from dliom_tpu.io.pbstream import write_range_data_pbstream

    cfg, pg, _ = _sample_graph()
    with tempfile.TemporaryDirectory() as d:
        ds = os.path.join(d, "schema.ds")
        sp.run(
            ["protoc", f"-I{_REF}", "--include_imports",
             f"--descriptor_set_out={ds}",
             "cartographer/mapping/proto/local_slam_range_data.proto"],
            check=True,
        )
        from google.protobuf import descriptor_pb2, descriptor_pool
        from google.protobuf import message_factory

        pool = descriptor_pool.DescriptorPool()
        fds = descriptor_pb2.FileDescriptorSet()
        with open(ds, "rb") as f:
            fds.ParseFromString(f.read())
        for fd in fds.file:
            pool.Add(fd)
        Node = message_factory.GetMessageClass(
            pool.FindMessageTypeByName(
                "cartographer.mapping.proto.NodeRangeData"
            )
        )
        path = os.path.join(d, "range.pbstream")
        write_range_data_pbstream(path, pg)
        blobs = list(PbstreamReader(path))
        assert len(blobs) == 1 + len(pg.nodes)  # header + one per node
        n1 = Node.FromString(blobs[2])
        assert n1.node_index == 1
        assert abs(from_universal_ticks(n1.timestamp) - 12.25) < 1e-6
        n_pts = int(np.asarray(pg.nodes[1].high_mask).sum())
        assert len(n1.range_data_in_local.returns) == n_pts
        np.testing.assert_allclose(
            [n1.local_pose.translation.x, n1.local_pose.translation.y],
            [2.0, 0.5], atol=1e-6,
        )
        # returns are expressed in the LOCAL frame (cloud + node pose)
        r0 = n1.range_data_in_local.returns[0]
        want = np.asarray(
            pg.nodes[1].local_pose.apply(pg.nodes[1].high_points)
        )[np.asarray(pg.nodes[1].high_mask)][0]
        np.testing.assert_allclose([r0.x, r0.y, r0.z], want, atol=1e-5)


def test_sensor_streams_roundtrip():
    """GPS / landmark / odometry streams survive the pbstream round trip
    (mapping_state_serialization.cc:206-209 SerializedData kinds 7/8/9):
    fixed-frame and landmark observations re-attach to the nearest-in-time
    node; the synthesized odometry stream encodes the same inter-node
    relatives."""
    from dliom_tpu.io.pbstream import load_pbstream_into, parse_message

    cfg, pg, points = _sample_graph()
    pg.add_fixed_frame_pose(0, [0.1, 0.2, 0.3])
    pg.add_fixed_frame_pose(1, [2.1, 0.7, 0.3])
    pg.add_landmark_observation(
        1, "lm_7", [0.5, -0.2, 1.0], weight=123.0,
        rotation_in_tracking=np.asarray([0.0, 0.0, 0.0, 1.0]),
        rotation_weight=4.5,
    )
    pg.add_landmark_observation(1, "lm_off", [1.0, 0.0, 0.0], weight=0.0)
    rel = Rigid3.translation_only(jnp.asarray([2.0, 0.5, 0.0]))
    pg.odometry_links.append((0, 1, rel))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.pbstream")
        write_pbstream(path, pg)
        # the new SerializedData kinds are present with the right fields
        kinds = [next(iter(parse_message(b))) for b in PbstreamReader(path)]
        assert kinds.count(7) == 2  # two odometry samples (node 0, node 1)
        assert kinds.count(8) == 2
        assert kinds.count(9) == 2

        pg2 = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
        load_pbstream_into(pg2, path)
        assert len(pg2.fixed_frame_observations) == 2
        nid, pos, _w = pg2.fixed_frame_observations[1]
        assert nid == 1
        np.testing.assert_allclose(pos, [2.1, 0.7, 0.3], atol=1e-9)
        assert len(pg2.landmark_observations) == 2
        (n0, n1, alpha, lid, rq, lpos, tw, rw) = pg2.landmark_observations[0]
        assert n1 == 1 and "lm_7" in pg2._landmark_ids
        np.testing.assert_allclose(lpos, [0.5, -0.2, 1.0], atol=1e-9)
        np.testing.assert_allclose(rq, [0.0, 0.0, 0.0, 1.0], atol=1e-9)
        assert tw == 123.0 and rw == 4.5
        # a deliberately weight-0 (disabled) landmark cost stays disabled
        # across the round trip (proto3 zero-skip: absent -> 0.0, not 1.0)
        assert pg2.landmark_observations[1][6] == 0.0
        # odometry links rebuild from the serialized stream
        assert len(pg2.odometry_links) == 1
        a, b, orel = pg2.odometry_links[0]
        assert (a, b) == (0, 1)
        np.testing.assert_allclose(
            np.asarray(orel.translation), [2.0, 0.5, 0.0], atol=1e-5
        )
