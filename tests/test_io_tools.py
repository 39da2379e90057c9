"""Assets writer, dataset converter, trimmer, and pure-localization tests."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from dliom_tpu.io.assets_writer import (
    aggregate_point_cloud,
    write_pcd,
    write_ply,
    write_probability_grid_npz,
    write_xray_pgm,
)
from dliom_tpu.io.datasets import (
    convert_kitti_sequence,
    load_kitti_velodyne_bin,
    write_npz_sequence,
)
from dliom_tpu.runner.offline import _load_npz_dataset


def _small_pose_graph():
    import tests.test_pose_graph as tpg
    from dliom_tpu.backend.pose_graph import PoseGraph
    from dliom_tpu.mapping import probability as pv
    from dliom_tpu.mapping.grid import cell_index, make_grid, set_cells
    from dliom_tpu.mapping.submap import grid_specs
    from dliom_tpu.transform.rigid import Rigid3

    cfg = tpg._cfg()
    pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
    hi, lo = grid_specs(cfg.trajectory_builder.submaps)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(tpg._world_cloud(rng, 300))
    vals = jnp.full((pts.shape[0],), pv.probability_to_value(jnp.float32(0.9)))
    g_hi = set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals, hi)
    g_lo = set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals, lo)
    for k in range(3):
        sid = pg.add_submap(Rigid3.translation_only(jnp.asarray([2.0 * k, 0.0, 0.0])))
        pg.add_node(
            tpg._make_node(cfg, np.asarray(pts), Rigid3.translation_only(
                jnp.asarray([2.0 * k, 0.0, 0.0]))),
            (sid,),
        )
        pg.finish_submap(sid, g_hi, g_lo)
    return pg


def test_assets_writers():
    pg = _small_pose_graph()
    cloud = aggregate_point_cloud(pg)
    assert cloud.shape[0] > 0 and cloud.shape[1] == 3
    with tempfile.TemporaryDirectory() as d:
        ply = os.path.join(d, "map.ply")
        write_ply(ply, cloud)
        head = open(ply, "rb").read(200)
        assert head.startswith(b"ply") and str(len(cloud)).encode() in head
        assert os.path.getsize(ply) > len(cloud) * 12

        pcd = os.path.join(d, "map.pcd")
        write_pcd(pcd, cloud)
        assert b"POINTS" in open(pcd, "rb").read(300)

        pgm = os.path.join(d, "xray.pgm")
        write_xray_pgm(pgm, cloud, resolution=0.5)
        assert open(pgm, "rb").read(2) == b"P5"

        grid = os.path.join(d, "grid.npz")
        write_probability_grid_npz(grid, pg)
        z = np.load(grid)
        assert z["points"].shape[0] > 0
        assert np.all(z["probabilities"] > 0.5)  # occupied cells only


def test_trimmer_drops_heavy_data():
    pg = _small_pose_graph()
    trimmed = pg.trim_to_last_submaps(1)
    assert trimmed == 2
    assert pg.submaps[0].high is None and pg.submaps[0].trimmed
    assert pg.submaps[2].high is not None
    # trimmed submaps leave loop search candidacy
    assert 0 not in pg._close_submaps(2)
    # poses remain for trajectory queries
    assert len(pg.submap_poses()) == 3


def test_kitti_converter_and_loader():
    with tempfile.TemporaryDirectory() as d:
        vdir = os.path.join(d, "velodyne")
        os.makedirs(vdir)
        rng = np.random.default_rng(0)
        for k in range(3):
            pts = rng.uniform(-10, 10, size=(100, 4)).astype(np.float32)
            pts.tofile(os.path.join(vdir, f"{k:06d}.bin"))
        out = os.path.join(d, "seq.npz")
        n = convert_kitti_sequence(vdir, out)
        assert n == 3
        scans, imu, gt = _load_npz_dataset(out)
        assert len(scans) == 3 and gt is None
        stamp, pts, times = scans[1]
        assert stamp == 0.1 and pts.shape == (100, 3)
        assert times.min() == -0.1 and times.max() == 0.0
        raw = load_kitti_velodyne_bin(os.path.join(vdir, "000000.bin"))
        assert raw.shape == (100, 4)


def test_write_npz_sequence_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "seq.npz")
        rng = np.random.default_rng(1)
        scans = [(0.1 * k, rng.normal(size=(50, 3)), None) for k in range(2)]
        write_npz_sequence(
            out, scans,
            imu_times=np.asarray([0.0, 0.05]),
            imu_acc=np.zeros((2, 3)), imu_gyr=np.zeros((2, 3)),
            gt=(np.asarray([0.0, 0.2]), np.zeros((2, 3))),
        )
        loaded, imu, gt = _load_npz_dataset(out)
        assert len(loaded) == 2 and len(imu) == 2 and gt is not None


def test_pure_localization_frozen_poses():
    import tests.test_pose_graph as tpg
    from dliom_tpu.io.serialization import load_state, save_state

    pg = _small_pose_graph()
    cfg = tpg._cfg()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "map.npz")
        save_state(path, pg)
        frozen = load_state(path, cfg, frozen=True)
        assert all(s.frozen for s in frozen.submaps)
        assert all(n.frozen for n in frozen.nodes)
        before = np.asarray(frozen.submaps[1].global_pose.translation).copy()
        frozen.run_optimization(iterations=3)
        np.testing.assert_allclose(
            np.asarray(frozen.submaps[1].global_pose.translation), before,
            atol=1e-6,
        )


def test_pointcloud_format_decoders():
    """Per-LiDAR point decoding (sensor_bridge.cc:183-236 analog)."""
    from dliom_tpu.io.pointcloud_formats import decode_points

    n = 5
    # ouster: t in ns from scan start; stamp given = message header time
    ouster = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                ("t", "u4")])
    ouster["x"] = np.arange(n); ouster["t"] = np.arange(n) * 10_000_000  # 10ms
    stamp, pts, rel = decode_points(ouster, "ouster", header_stamp=100.0)
    assert stamp == 100.0 + 0.04
    np.testing.assert_allclose(rel, [-0.04, -0.03, -0.02, -0.01, 0.0], atol=1e-7)

    # velodyne: time in s relative to header (first point), rebased to last
    velo = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                              ("time", "f4")])
    velo["time"] = np.arange(n) * 0.01
    stamp, pts, rel = decode_points(velo, "velodyne", header_stamp=50.0)
    assert abs(stamp - 50.04) < 1e-9
    assert rel.max() == 0.0 and abs(rel.min() + 0.04) < 1e-6

    # robosense: absolute per-point seconds; header stamps the last point
    rs = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                            ("timestamp", "f8")])
    rs["timestamp"] = 200.0 + np.arange(n) * 0.01
    stamp, pts, rel = decode_points(rs, "robosense", header_stamp=200.04)
    assert stamp == 200.04
    assert abs(rel.min() + 0.04) < 1e-6

    # fallback XYZI + non-finite rejection
    raw = np.asarray([[0, 0, 0], [np.nan, 1, 2], [3, 4, 5]], np.float32)
    stamp, pts, rel = decode_points(raw, "generic", header_stamp=7.0)
    assert stamp == 7.0 and pts.shape == (2, 3) and np.all(rel == 0)


def test_points_pipeline():
    """Declarative points-processor pipeline (assets_writer pipeline analog,
    R6): the tongji config's stage list — range filter, dump, pcd — plus
    sampler/voxel/xray/ply/probability-grid stages all run and write."""
    from dliom_tpu.io.points_pipeline import build_pipeline, run_pipeline

    pg = _small_pose_graph()
    pipeline = [
        {"action": "min_max_range_filter", "min_range": 0.0,
         "max_range": 100.0},
        {"action": "fixed_ratio_sampler", "sampling_ratio": 0.5},
        {"action": "voxel_filter", "voxel_size": 0.05},
        {"action": "dump_num_points"},
        {"action": "write_pcd", "filename": "points.pcd"},
        {"action": "write_ply", "filename": "points.ply"},
        {"action": "write_xray_image", "filename": "xray.pgm",
         "voxel_size": 0.2},
        {"action": "write_probability_grid", "filename": "grid.npz"},
    ]
    with tempfile.TemporaryDirectory() as d:
        stats = run_pipeline(pg, pipeline, d)
        for name in ("points.pcd", "points.ply", "xray.pgm", "grid.npz"):
            assert os.path.getsize(os.path.join(d, name)) > 0, name
        assert stats["num_points"] > 0
        # the sampler halves and the range filter keeps all -> dump count
        # is well under the raw total
        raw = sum(int(np.asarray(n.high_mask).sum()) for n in pg.nodes)
        assert stats["num_points"] <= raw // 2 + len(pg.nodes)

    # unknown action -> KeyError (PointsProcessorPipelineBuilder CHECK)
    try:
        build_pipeline([{"action": "nope"}], ".")
        assert False, "expected KeyError"
    except KeyError:
        pass
