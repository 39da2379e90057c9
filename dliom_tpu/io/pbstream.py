"""Cartographer pbstream WRITE-path interop.

Emits the reference's proto-stream container and message schema so reference
ecosystem tooling (`pbstream_3d_map_publisher_main.cc`,
`kaist/kitti_trajectory_from_pbstream.cc`, `read_constraints_from_pbsteam.cc`,
`cartographer/ground_truth` relation tools) can consume runs produced here.
The native checkpoint format stays the .npz of io/serialization.py; this is
an export surface.

Container (`cartographer/io/proto_stream.cc`): 8-byte little-endian magic
0x7b1d1f7b5bf501db, then per message an 8-byte little-endian size of the
gzip-compressed serialized proto followed by those bytes.

Message schema and order (`io/internal/mapping_state_serialization.cc:193-208`,
format version 1): SerializationHeader, SerializedData{pose_graph},
SerializedData{all_trajectory_builder_options}, then one SerializedData per
submap, node, and trajectory-data entry. Field numbers follow the reference
.proto files, cited per builder below (mapping/proto/serialization.proto,
pose_graph.proto, trajectory.proto, submap.proto, trajectory_node_data.proto,
3d/hybrid_grid.proto, sensor/proto/sensor.proto,
transform/proto/transform.proto). The encoder is a minimal hand-rolled
protobuf wire-format writer — no generated bindings, no proto runtime.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterable, List, Tuple

import numpy as np

MAGIC = 0x7B1D1F7B5BF501DB
FORMAT_VERSION = 1  # io/internal/mapping_state_serialization.h:27
# common/time.h:29 — seconds between 0001-01-01 (UTS epoch) and 1970-01-01
UTS_EPOCH_OFFSET_SECONDS = 719162 * 24 * 60 * 60
UTS_TICKS_PER_SECOND = 10_000_000  # 100 ns resolution


def to_universal_ticks(unix_seconds: float) -> int:
    """common::ToUniversal of a unix timestamp. The epoch offset is applied
    in INTEGER ticks: at UTS scale (~6.4e17 ticks) float64 only resolves
    ~100 ticks, which would corrupt sub-microsecond stamps."""
    return (
        int(round(unix_seconds * UTS_TICKS_PER_SECOND))
        + UTS_EPOCH_OFFSET_SECONDS * UTS_TICKS_PER_SECOND
    )


def from_universal_ticks(ticks: int) -> float:
    return (
        ticks - UTS_EPOCH_OFFSET_SECONDS * UTS_TICKS_PER_SECOND
    ) / UTS_TICKS_PER_SECOND


# ---------------------------------------------------------------------------
# Protobuf wire-format primitives (proto3)
# ---------------------------------------------------------------------------


def _varint(value: int) -> bytes:
    if value < 0:  # proto int32/int64 negative values use 10-byte varints
        value += 1 << 64
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(value: int) -> int:
    return (value << 1) ^ (value >> 63)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def fv(field: int, value: int) -> bytes:
    """Varint-typed field (int32/int64/uint32/bool/enum); 0 is omitted
    (proto3 default)."""
    if value == 0:
        return b""
    return _tag(field, 0) + _varint(int(value))


def fd(field: int, value: float) -> bytes:
    """double field; 0.0 omitted."""
    if value == 0.0:
        return b""
    return _tag(field, 1) + struct.pack("<d", float(value))


def ff32(field: int, value: float) -> bytes:
    """float field; 0.0 omitted."""
    if value == 0.0:
        return b""
    return _tag(field, 5) + struct.pack("<f", float(value))


def fm(field: int, payload: bytes, keep_empty: bool = False) -> bytes:
    """Length-delimited submessage/string/bytes field."""
    if not payload and not keep_empty:
        return b""
    return _tag(field, 2) + _varint(len(payload)) + payload


def fs(field: int, value: str) -> bytes:
    return fm(field, value.encode("utf-8"))


def packed_varints(field: int, values: Iterable[int], zigzag: bool = False) -> bytes:
    body = b"".join(
        _varint(_zigzag(int(v)) if zigzag else int(v)) for v in values
    )
    return fm(field, body)


def packed_floats(field: int, values: Iterable[float]) -> bytes:
    body = b"".join(struct.pack("<f", float(v)) for v in values)
    return fm(field, body)


# ---------------------------------------------------------------------------
# Reference message builders (field numbers cited per .proto)
# ---------------------------------------------------------------------------


def _vector3d(t) -> bytes:
    # transform.proto Vector3d: x=1, y=2, z=3 (double)
    return fd(1, float(t[0])) + fd(2, float(t[1])) + fd(3, float(t[2]))


def _quaterniond(q) -> bytes:
    # transform.proto Quaterniond: x=1, y=2, z=3, w=4 — note the repo's
    # quaternions are (w, x, y, z)
    w, x, y, z = (float(v) for v in q)
    return fd(1, x) + fd(2, y) + fd(3, z) + fd(4, w)


def _rigid3d(pose) -> bytes:
    # transform.proto Rigid3d: translation=1 (Vector3d), rotation=2 (Quaterniond)
    return fm(1, _vector3d(np.asarray(pose.translation))) + fm(
        2, _quaterniond(np.asarray(pose.rotation))
    )


def _submap_id(trajectory_id: int, submap_index: int) -> bytes:
    # pose_graph.proto SubmapId: trajectory_id=1, submap_index=2
    return fv(1, trajectory_id) + fv(2, submap_index)


def _node_id(trajectory_id: int, node_index: int) -> bytes:
    # pose_graph.proto NodeId: trajectory_id=1, node_index=2
    return fv(1, trajectory_id) + fv(2, node_index)


def _compressed_point_cloud(points: np.ndarray) -> bytes:
    """sensor.proto CompressedPointCloud: num_points=1, point_data=3
    (packed int32). Layout per block (compressed_point_cloud.cc:128-146):
    [count, block_x, block_y, block_z, packed_points...]."""
    from dliom_tpu.sensor import compressed_point_cloud as cpc

    c = cpc.compress(np.asarray(points, np.float32).reshape(-1, 3))
    data: List[int] = []
    pos = 0
    for b in range(c.block_origins.shape[0]):
        n = int(c.block_counts[b])
        bx, by, bz = (int(v) >> cpc.BITS for v in c.block_origins[b])
        data.extend((n, bx, by, bz))
        data.extend(int(v) for v in c.packed[pos : pos + n])
        pos += n
    return fv(1, int(c.num_points)) + packed_varints(3, data)


def _hybrid_grid(indices: np.ndarray, values: np.ndarray, resolution: float) -> bytes:
    """mapping/proto/3d/hybrid_grid.proto: resolution=1,
    x_indices=3/y=4/z=5 (packed sint32), values=6 (packed int32)."""
    idx = np.asarray(indices, np.int64).reshape(-1, 3)
    return (
        ff32(1, resolution)
        + packed_varints(3, idx[:, 0], zigzag=True)
        + packed_varints(4, idx[:, 1], zigzag=True)
        + packed_varints(5, idx[:, 2], zigzag=True)
        + packed_varints(6, np.asarray(values, np.int64))
    )


def _pose_graph_proto(pg) -> bytes:
    """mapping/proto/pose_graph.proto PoseGraph: constraint=2,
    trajectory=4, landmark_poses=5."""
    out = b""
    # constraints (Constraint: submap_id=1, node_id=2, relative_pose=3,
    # tag=5 [INTRA_SUBMAP=0, INTER_SUBMAP=1], translation_weight=6,
    # rotation_weight=7)
    sub_index = _per_trajectory_indices(pg)
    node_index = _node_indices(pg)
    for c in pg.constraints:
        body = (
            fm(1, _submap_id(*sub_index[c.submap_id]))
            + fm(2, _node_id(*node_index[c.node_id]))
            + fm(3, _rigid3d(c.relative))
            + fv(5, 1 if c.tag == "INTER" else 0)
            + fd(6, c.translation_weight)
            + fd(7, c.rotation_weight)
        )
        out += fm(2, body, keep_empty=True)
    # trajectories (trajectory.proto Trajectory: node=1, submap=2,
    # trajectory_id=3; Node: timestamp=1, pose=5, node_index=7;
    # Submap: pose=1, submap_index=2)
    tids = sorted(
        {s.trajectory_id for s in pg.submaps}
        | {n.trajectory_id for n in pg.nodes}
    )
    for tid in tids:
        body = fv(3, tid)
        for nid, n in enumerate(pg.nodes):
            if n.trajectory_id != tid:
                continue
            node_body = (
                fv(1, to_universal_ticks(n.time))
                + fm(5, _rigid3d(n.global_pose))
                + fv(7, node_index[nid][1])
            )
            body += fm(1, node_body, keep_empty=True)
        for sid, s in enumerate(pg.submaps):
            if s.trajectory_id != tid:
                continue
            body += fm(
                2,
                fm(1, _rigid3d(s.global_pose)) + fv(2, sub_index[sid][1]),
                keep_empty=True,
            )
        out += fm(4, body, keep_empty=True)
    # landmark poses (LandmarkPose: landmark_id=1, global_pose=2)
    for name, position in pg.landmark_poses().items():
        from dliom_tpu.transform.rigid import Rigid3
        import jax.numpy as jnp

        pose = Rigid3.translation_only(jnp.asarray(position))
        out += fm(5, fs(1, name) + fm(2, _rigid3d(pose)))
    return out


def _per_trajectory_indices(pg) -> List[Tuple[int, int]]:
    return [(s.trajectory_id, s.index_in_trajectory) for s in pg.submaps]


def _node_indices(pg) -> List[Tuple[int, int]]:
    counters: dict = {}
    out = []
    for n in pg.nodes:
        k = counters.get(n.trajectory_id, 0)
        counters[n.trajectory_id] = k + 1
        out.append((n.trajectory_id, k))
    return out


class PbstreamWriter:
    """ProtoStreamWriter analog (proto_stream.cc:46-67)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(struct.pack("<Q", MAGIC))

    def write(self, serialized: bytes) -> None:
        compressed = gzip.compress(serialized)
        self._f.write(struct.pack("<Q", len(compressed)))
        self._f.write(compressed)

    def close(self) -> None:
        self._f.close()


class PbstreamReader:
    """ProtoStreamReader analog — validates the magic, yields message
    blobs (used by the round-trip tests; reference tools are the real
    consumers)."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        (magic,) = struct.unpack("<Q", self._f.read(8))
        if magic != MAGIC:
            raise ValueError(f"not a pbstream: bad magic {magic:#x}")

    def __iter__(self):
        while True:
            header = self._f.read(8)
            if len(header) < 8:
                return
            (size,) = struct.unpack("<Q", header)
            yield gzip.decompress(self._f.read(size))

    def close(self) -> None:
        self._f.close()


def write_pbstream(path: str, pg, include_grids: bool = True) -> None:
    """WritePbStream (mapping_state_serialization.cc:193-208): header,
    pose graph, trajectory builder options, submaps, nodes, trajectory
    data. `pg` is a backend.pose_graph.PoseGraph."""

    def cell_coordinates(lin: np.ndarray, spec) -> np.ndarray:
        """Inverse of mapping.grid.linear_index: flat -> signed (N, 3)."""
        lin = np.asarray(lin, np.int64)
        e, h = spec.extent, spec.half
        return np.stack(
            [lin // (e * e) - h, (lin // e) % e - h, lin % e - h], axis=-1
        )

    w = PbstreamWriter(path)
    # SerializationHeader (serialization.proto): format_version=1
    w.write(fv(1, FORMAT_VERSION))
    # SerializedData oneof fields (serialization.proto): pose_graph=1,
    # all_trajectory_builder_options=2, submap=3, node=4, trajectory_data=5
    w.write(fm(1, _pose_graph_proto(pg), keep_empty=True))
    tids = sorted(
        {s.trajectory_id for s in pg.submaps}
        | {n.trajectory_id for n in pg.nodes}
    )
    # AllTrajectoryBuilderOptions: options_with_sensor_ids=1, one (empty =
    # all-defaults) entry per trajectory — LoadState indexes it by count
    opts = b"".join(fm(1, b"", keep_empty=True) for _ in tids)
    w.write(fm(2, opts, keep_empty=True))

    sub_index = _per_trajectory_indices(pg)
    node_index = _node_indices(pg)
    hi_spec, lo_spec = pg._hi_spec, pg._lo_spec
    for sid, s in enumerate(pg.submaps):
        # Submap (serialization.proto): submap_id=1, submap_3d=3;
        # Submap3D (submap.proto): local_pose=1, num_range_data=2,
        # finished=3, high_resolution_hybrid_grid=4, low_..._grid=5
        body = fm(1, _submap_id(*sub_index[sid]))
        sub3d = (
            fm(1, _rigid3d(s.local_pose))
            + fv(2, len(s.node_ids))
            + fv(3, 1 if s.finished else 0)
        )
        if include_grids and s.high is not None:
            for field, comp, spec in ((4, s.high, hi_spec), (5, s.low, lo_spec)):
                count = int(comp.count)
                idx = np.asarray(
                    cell_coordinates(comp.indices, spec)
                )[:count]
                vals = np.asarray(comp.values)[:count]
                sub3d += fm(
                    field, _hybrid_grid(idx, vals, spec.resolution),
                    keep_empty=True,
                )
        body += fm(3, sub3d, keep_empty=True)
        w.write(fm(3, body, keep_empty=True))

    for nid, n in enumerate(pg.nodes):
        # Node (serialization.proto): node_id=1, node_data=5;
        # TrajectoryNodeData (trajectory_node_data.proto): timestamp=1,
        # gravity_alignment=2, high_resolution_point_cloud=4,
        # low_resolution_point_cloud=5, rotational_scan_matcher_histogram=6,
        # local_pose=7
        hi_pts = np.asarray(n.high_points)[np.asarray(n.high_mask)]
        lo_pts = np.asarray(n.low_points)[np.asarray(n.low_mask)]
        node_data = (
            fv(1, to_universal_ticks(n.time))
            + fm(2, _quaterniond(np.asarray(n.gravity_alignment)))
            + fm(4, _compressed_point_cloud(hi_pts), keep_empty=True)
            + fm(5, _compressed_point_cloud(lo_pts), keep_empty=True)
            + packed_floats(6, np.asarray(n.histogram))
            + fm(7, _rigid3d(n.local_pose))
        )
        body = fm(1, _node_id(*node_index[nid])) + fm(5, node_data, keep_empty=True)
        w.write(fm(4, body, keep_empty=True))

    for tid in tids:
        # TrajectoryData (serialization.proto): trajectory_id=1,
        # gravity_constant=2, imu_calibration=3
        body = fv(1, tid) + fd(2, 9.80511) + fm(
            3, _quaterniond(np.asarray([1.0, 0.0, 0.0, 0.0]))
        )
        w.write(fm(5, body, keep_empty=True))
    w.close()
