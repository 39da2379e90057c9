"""Map state serialization (checkpoint / resume).

Counterpart of the reference's pbstream serialization
(`cartographer/io/internal/mapping_state_serialization.cc:193-208` writes, in
order: pose graph, options, submaps, nodes, trajectory data, sensor data;
`MapBuilder::LoadState`, map_builder.cc:209-367 restores, optionally frozen).

The container here is a compressed .npz ("pbstream-analog"): the same
information — submap poses + sparse grids, node poses + constant data,
constraints, config echo — keyed in a stable schema. Loading restores a
PoseGraph for continued mapping, pure localization, or offline viewing."""

from __future__ import annotations

import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend.compression import CompressedGrid
from dliom_tpu.sensor import compressed_point_cloud as cpc


def _load_cloud(z, prefix):
    """Decompress a stored node cloud back to (capacity, 3) + mask."""
    c = cpc.CompressedPointCloud(
        block_origins=z[f"{prefix}_origins"],
        block_counts=z[f"{prefix}_counts"],
        packed=z[f"{prefix}_packed"],
        num_points=int(z[f"{prefix}_packed"].shape[0]),
    )
    pts = cpc.decompress(c)
    cap = int(z[f"{prefix}_capacity"])
    out = np.zeros((cap, 3), np.float32)
    n = min(len(pts), cap)
    out[:n] = pts[:n]
    mask = np.arange(cap) < n
    return out, mask
from dliom_tpu.backend.pose_graph import Constraint, NodeRecord, PoseGraph, SubmapRecord
from dliom_tpu.common.config import EngineConfig, load_config
from dliom_tpu.transform.rigid import Rigid3

SCHEMA_VERSION = 1


def _pose_arr(pose: Rigid3) -> np.ndarray:
    return np.concatenate([np.asarray(pose.rotation), np.asarray(pose.translation)])


def _arr_pose(a: np.ndarray) -> Rigid3:
    return Rigid3(jnp.asarray(a[:4], jnp.float32), jnp.asarray(a[4:7], jnp.float32))


def save_state(path: str, pose_graph: PoseGraph, config_preset: str = "basic") -> None:
    """SerializeState (map_builder.cc:205)."""
    np.savez_compressed(path, **_state_arrays(pose_graph, config_preset))


def _state_arrays(pose_graph: PoseGraph, config_preset: str = "basic") -> dict:
    data = {"schema": np.int32(SCHEMA_VERSION)}
    meta = {
        "num_submaps": len(pose_graph.submaps),
        "num_nodes": len(pose_graph.nodes),
        "num_constraints": len(pose_graph.constraints),
        "preset": config_preset,
    }
    data["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)

    for i, s in enumerate(pose_graph.submaps):
        data[f"submap/{i}/local_pose"] = _pose_arr(s.local_pose)
        data[f"submap/{i}/global_pose"] = _pose_arr(s.global_pose)
        data[f"submap/{i}/finished"] = np.asarray(s.finished)
        data[f"submap/{i}/node_ids"] = np.asarray(s.node_ids, np.int32)
        data[f"submap/{i}/trajectory"] = np.asarray(
            [s.trajectory_id, s.index_in_trajectory], np.int32
        )
        if s.histogram is not None:
            data[f"submap/{i}/histogram"] = np.asarray(s.histogram)
        if s.finished and s.high is not None:
            data[f"submap/{i}/high_idx"] = np.asarray(s.high.indices)
            data[f"submap/{i}/high_val"] = np.asarray(s.high.values)
            data[f"submap/{i}/high_count"] = np.asarray(s.high.count)
            data[f"submap/{i}/low_idx"] = np.asarray(s.low.indices)
            data[f"submap/{i}/low_val"] = np.asarray(s.low.values)
            data[f"submap/{i}/low_count"] = np.asarray(s.low.count)

    for i, n in enumerate(pose_graph.nodes):
        data[f"node/{i}/time"] = np.asarray(n.time)
        data[f"node/{i}/local_pose"] = _pose_arr(n.local_pose)
        data[f"node/{i}/global_pose"] = _pose_arr(n.global_pose)
        data[f"node/{i}/gravity"] = np.asarray(n.gravity_alignment)
        # node clouds stored bit-packed (sensor::CompressedPointCloud,
        # serialization.proto TrajectoryNodeData) at ~1/3 the raw size
        for tag, pts, mask in (
            ("high", n.high_points, n.high_mask),
            ("low", n.low_points, n.low_mask),
        ):
            valid = np.asarray(pts)[np.asarray(mask)]
            c = cpc.compress(valid)
            data[f"node/{i}/{tag}_origins"] = c.block_origins
            data[f"node/{i}/{tag}_counts"] = c.block_counts
            data[f"node/{i}/{tag}_packed"] = c.packed
            data[f"node/{i}/{tag}_capacity"] = np.int32(np.asarray(pts).shape[0])
        data[f"node/{i}/histogram"] = np.asarray(n.histogram)
        data[f"node/{i}/submap_ids"] = np.asarray(n.submap_ids, np.int32)
        data[f"node/{i}/trajectory"] = np.int32(n.trajectory_id)

    c = pose_graph.constraints
    data["constraints/submap"] = np.asarray([x.submap_id for x in c], np.int32)
    data["constraints/node"] = np.asarray([x.node_id for x in c], np.int32)
    data["constraints/pose"] = (
        np.stack([_pose_arr(x.relative) for x in c])
        if c
        else np.zeros((0, 7), np.float32)
    )
    data["constraints/tw"] = np.asarray([x.translation_weight for x in c], np.float32)
    data["constraints/rw"] = np.asarray([x.rotation_weight for x in c], np.float32)
    data["constraints/inter"] = np.asarray([x.tag == "INTER" for x in c], bool)
    return data


def save_live_checkpoint(path: str, builder, config_preset: str = "basic") -> None:
    """Mid-run checkpoint of a RUNNING MapBuilder: the map state
    (save_state's pose-graph arrays) PLUS every initialized trajectory's
    full device state — LIO window, biases, active submap grid banks —
    and the host-side sensor bookkeeping, so a restored builder continues
    ingesting mid-submap with bit-identical results.

    This goes beyond the reference, whose pbstream serializes only the
    finished map (a live run cannot resume: ISAM2/GTSAM state and active
    HybridGrids are never written) — the SURVEY §5 'orbax-style checkpoint
    of device state' bullet. The device pytree is snapshotted leaf-wise in
    `jax.tree` flattening order against the config-derived template, with
    leaf count and shapes validated on restore."""
    import jax

    builder.flush()
    builder.pose_graph.wait_for_all_computations()
    data = _state_arrays(builder.pose_graph, config_preset)
    live_meta = {}
    for tid, t in builder._trajectories.items():
        live_meta[str(tid)] = {
            "initialized": bool(t._initialized),
            "last_imu_time": t._last_imu_time,
            "time_origin": t._time_origin,
            "pg_submap_ids": list(t._pg_submap_ids),
            "prev_node": list(t._prev_node) if t._prev_node else None,
            "last_queue_time": dict(t._last_queue_time),
            "finished": bool(t.finished),
        }
        if t._imu_times:
            data[f"live/t{tid}/imu_times"] = np.asarray(t._imu_times)
            data[f"live/t{tid}/imu_acc"] = np.stack(t._imu_acc)
            data[f"live/t{tid}/imu_gyr"] = np.stack(t._imu_gyr)
        if t._initialized:
            leaves = jax.device_get(jax.tree.leaves(t._lio))
            live_meta[str(tid)]["num_leaves"] = len(leaves)
            for i, leaf in enumerate(leaves):
                data[f"live/t{tid}/leaf/{i}"] = np.asarray(leaf)
    data["live_meta"] = np.frombuffer(
        json.dumps(live_meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **data)


def restore_live_trajectories(builder, path: str, tid_map: dict) -> None:
    """Restore the live per-trajectory state saved by save_live_checkpoint
    into `builder`, whose pose graph must already hold the checkpoint's
    map state loaded into an EMPTY graph (ids offset by 0); `tid_map`
    translates saved trajectory ids to the graph's registered ones."""
    import jax

    from dliom_tpu.frontend.lio import make_lio_state
    from dliom_tpu.imu import preintegration as pre
    from dliom_tpu.map_builder import _TrajectoryBuilder

    z = np.load(path, allow_pickle=False)
    live_meta = json.loads(bytes(z["live_meta"]).decode())
    cfg = builder.config.trajectory_builder
    for tid_s, m in live_meta.items():
        orig = int(tid_s)  # key in the checkpoint arrays
        tid = tid_map.get(orig, orig)  # id in the restored pose graph
        if tid not in builder._trajectories:
            builder._trajectories[tid] = _TrajectoryBuilder(
                builder, tid, builder._default_sensor_ids,
                builder._use_native_collator,
            )
        t = builder._trajectories[tid]
        t._last_imu_time = m["last_imu_time"]
        t._time_origin = m["time_origin"]
        t._pg_submap_ids = list(m["pg_submap_ids"])
        t._prev_node = tuple(m["prev_node"]) if m["prev_node"] else None
        t._last_queue_time = dict(m["last_queue_time"])
        t.finished = bool(m["finished"])
        if f"live/t{orig}/imu_times" in z:
            t._imu_times = [float(x) for x in z[f"live/t{orig}/imu_times"]]
            t._imu_acc = list(z[f"live/t{orig}/imu_acc"])
            t._imu_gyr = list(z[f"live/t{orig}/imu_gyr"])
        if not m["initialized"]:
            continue
        template = make_lio_state(
            cfg, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3)
        )
        t_leaves, treedef = jax.tree.flatten(template)
        n = int(m["num_leaves"])
        if n != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n} device-state leaves but the config "
                f"template has {len(t_leaves)} — restore with the SAME "
                "trajectory_builder configuration it was saved under"
            )
        loaded = []
        for i, tmpl in enumerate(t_leaves):
            leaf = z[f"live/t{orig}/leaf/{i}"]
            if tuple(leaf.shape) != tuple(np.shape(tmpl)):
                raise ValueError(
                    f"device-state leaf {i} shape {leaf.shape} != template "
                    f"{np.shape(tmpl)} — config mismatch"
                )
            loaded.append(jnp.asarray(leaf))
        t._lio = jax.tree.unflatten(treedef, loaded)
        t._initialized = True


def load_state(
    path: str, config: Optional[EngineConfig] = None, frozen: bool = False
) -> PoseGraph:
    """LoadState into a fresh PoseGraph (map_builder.cc:209-367). With
    frozen=True, constraints are restored but the loaded trajectories are
    excluded from re-optimization (pure localization uses this as the
    reference map)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode())
    config = config or load_config(meta.get("preset", "basic"))
    pg = PoseGraph(config.pose_graph, config.trajectory_builder)
    load_state_into(pg, path, config, frozen=frozen)
    return pg


def load_state_into(
    pg: PoseGraph,
    path: str,
    config: Optional[EngineConfig] = None,
    frozen: bool = False,
) -> dict:
    """Append a saved state to an EXISTING pose graph, remapping loaded
    trajectory ids onto freshly registered ones and offsetting node/submap
    ids past the graph's current contents (map_builder.cc:220-234's
    trajectory remapping). Returns {loaded_tid: new_tid}."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode())
    sub_off = len(pg.submaps)
    node_off = len(pg.nodes)
    tid_map: dict = {}

    def map_tid(loaded: int) -> int:
        if loaded not in tid_map:
            tid_map[loaded] = pg.add_trajectory(frozen=frozen)
        return tid_map[loaded]

    for i in range(meta["num_submaps"]):
        if f"submap/{i}/trajectory" in z:
            tid_l, idx = (int(v) for v in z[f"submap/{i}/trajectory"])
        else:  # legacy (schema 1 pre-trajectory) states: one trajectory
            tid_l, idx = 0, i
        tid = map_tid(tid_l)
        rec = SubmapRecord(
            local_pose=_arr_pose(z[f"submap/{i}/local_pose"]),
            global_pose=_arr_pose(z[f"submap/{i}/global_pose"]),
            finished=bool(z[f"submap/{i}/finished"]),
            node_ids=[int(n) + node_off for n in z[f"submap/{i}/node_ids"]],
            histogram=z[f"submap/{i}/histogram"]
            if f"submap/{i}/histogram" in z
            else None,
            trajectory_id=tid,
            index_in_trajectory=idx,
        )
        pg._traj_submap_counts[tid] = max(
            pg._traj_submap_counts.get(tid, 0), idx + 1
        )
        if f"submap/{i}/high_idx" in z:
            rec.high = CompressedGrid(
                jnp.asarray(z[f"submap/{i}/high_idx"]),
                jnp.asarray(z[f"submap/{i}/high_val"]),
                jnp.asarray(z[f"submap/{i}/high_count"]),
            )
            rec.low = CompressedGrid(
                jnp.asarray(z[f"submap/{i}/low_idx"]),
                jnp.asarray(z[f"submap/{i}/low_val"]),
                jnp.asarray(z[f"submap/{i}/low_count"]),
            )
        rec.frozen = frozen
        pg.submaps.append(rec)
    for i in range(meta["num_nodes"]):
        hi_cloud = _load_cloud(z, f"node/{i}/high")
        lo_cloud = _load_cloud(z, f"node/{i}/low")
        tid_l = (
            int(z[f"node/{i}/trajectory"]) if f"node/{i}/trajectory" in z else 0
        )
        pg.nodes.append(
            NodeRecord(
                time=float(z[f"node/{i}/time"]),
                local_pose=_arr_pose(z[f"node/{i}/local_pose"]),
                global_pose=_arr_pose(z[f"node/{i}/global_pose"]),
                gravity_alignment=z[f"node/{i}/gravity"],
                high_points=jnp.asarray(hi_cloud[0]),
                high_mask=jnp.asarray(hi_cloud[1]),
                low_points=jnp.asarray(lo_cloud[0]),
                low_mask=jnp.asarray(lo_cloud[1]),
                histogram=jnp.asarray(z[f"node/{i}/histogram"]),
                submap_ids=tuple(
                    int(s) + sub_off for s in z[f"node/{i}/submap_ids"]
                ),
                frozen=frozen,
                trajectory_id=map_tid(tid_l),
            )
        )
    n_c = meta["num_constraints"]
    for i in range(n_c):
        pg.constraints.append(
            Constraint(
                submap_id=int(z["constraints/submap"][i]) + sub_off,
                node_id=int(z["constraints/node"][i]) + node_off,
                relative=_arr_pose(z["constraints/pose"][i]),
                translation_weight=float(z["constraints/tw"][i]),
                rotation_weight=float(z["constraints/rw"][i]),
                tag="INTER" if bool(z["constraints/inter"][i]) else "INTRA",
            )
        )
    pg.reindex_constraints()
    # loaded INTER constraints re-establish trajectory connectivity
    for c in pg.constraints[-n_c:] if n_c else []:
        if c.tag == "INTER":
            t_sub = pg.submaps[c.submap_id].trajectory_id
            t_node = pg.nodes[c.node_id].trajectory_id
            if t_sub != t_node:
                pg.connect_trajectories(t_sub, t_node, pg.nodes[c.node_id].time)
    return tid_map
