"""Global SLAM: pose graph orchestration.

Counterpart of the reference's `PoseGraph3D` + `ConstraintBuilder3D`
(`cartographer/mapping/internal/3d/pose_graph_3d.cc`,
`internal/constraints/constraint_builder_3d.cc`): node/submap bookkeeping,
INTRA constraints from insertion, INTER (loop) constraints from correlative
search + GN refinement, and periodic sparse pose adjustment.

Architecture split (SURVEY.md §2.4): the reference runs constraint search on
a ThreadPool Task DAG with mutex-guarded state; here a host-side Python
orchestrator owns plain-array bookkeeping and launches three kinds of
compiled device programs — (de)compression of finished submap grids, the
correlative matcher + GN refiner, and the PCG pose-graph solve. Loop
proposals come from TWO paths, as in the reference: the
close-submap-with-initial-value search (pose_graph_options.proto
max_radius_eable_loop_detection / num_close_submaps_loop_with_initial_value)
and the submap-image proposal path for high-drift loops (`_image_proposals`,
the FFT-NCC substitute for SURF/FLANN — constraint_builder_3d.cc:436-532).
Every `every_nodes_to_find_constraint`-th node of the finishing submap is
matched against each candidate submap via MatchWith3DofInitial + refinement
(ComputeConstraint, constraint_builder_3d.cc:202-347).
"""

from __future__ import annotations

import collections
import functools
import logging
import threading
import time as _time
import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend import fast_correlative as fc
from dliom_tpu.backend import optimization as opt
from dliom_tpu.backend.compression import CompressedGrid, compress, decompress
from dliom_tpu.backend.precomputation import build_pyramid
from dliom_tpu.backend.submap_projection import (
    SubmapImage,
    project_to_image,
    propose_2d_transform,
    proposal_to_initial_guess,
)
from dliom_tpu.common.config import PoseGraphConfig, TrajectoryBuilderConfig
from dliom_tpu.mapping.submap import grid_specs
from dliom_tpu.ops.rotational_histogram import np_rotate_histogram
from dliom_tpu.ops.scan_matcher import match as gn_match
from dliom_tpu.transform.rigid import (
    Rigid3,
    np_compose,
    np_inverse,
    np_quat_conjugate,
    np_quat_multiply,
    np_quat_yaw,
    np_rigid,
    quat_conjugate,
    quat_multiply,
    quat_yaw,
)

_LOG = logging.getLogger("dliom_tpu.pose_graph")


@dataclass
class NodeRecord:
    """TrajectoryNode: constant data + local pose (trajectory_node.h).

    Ids stay GLOBAL flat ints (array-friendly for the batched SPA solve);
    `trajectory_id` carries the reference's NodeId.trajectory_id half
    (mapping/id.h) — global ids never recycle, so the pair is recoverable."""

    time: float
    local_pose: Rigid3  # in the local (frontend) frame
    gravity_alignment: np.ndarray  # (4,)
    high_points: jnp.ndarray  # (Nh, 3) in tracking frame
    high_mask: jnp.ndarray
    low_points: jnp.ndarray
    low_mask: jnp.ndarray
    histogram: jnp.ndarray  # (H,)
    submap_ids: Tuple[int, ...]  # submaps this node was inserted into
    global_pose: Rigid3 = None  # optimized
    frozen: bool = False  # frozen-trajectory node (pure localization)
    trajectory_id: int = 0


@dataclass
class SubmapRecord:
    local_pose: Rigid3  # frontend frame
    global_pose: Rigid3
    high: Optional[CompressedGrid] = None  # set when finished
    low: Optional[CompressedGrid] = None
    histogram: Optional[np.ndarray] = None  # accumulated node histograms
    node_ids: List[int] = field(default_factory=list)
    finished: bool = False
    image: Optional[SubmapImage] = None  # top-down projection (C10)
    frozen: bool = False  # frozen-trajectory submap (pure localization)
    trimmed: bool = False  # heavy data dropped by a trimmer
    trajectory_id: int = 0
    index_in_trajectory: int = 0  # SubmapId.submap_index analog




@dataclass
class Constraint:
    submap_id: int
    node_id: int
    relative: Rigid3  # node in submap frame
    translation_weight: float
    rotation_weight: float
    tag: str  # "INTRA" | "INTER"
    score: float = 1.0
    # INTER only: yaw the search+refinement moved the pose relative to its
    # initial guess (rad) — i.e. the accumulated yaw drift this loop had to
    # recover; validates the with-initial yaw fan half-width against the
    # drift regime actually encountered (VERDICT r4 #8)
    yaw_correction: float = 0.0


class PoseGraph:
    """Host orchestrator (PoseGraph3D API surface)."""

    def __init__(
        self,
        cfg: PoseGraphConfig,
        tb_cfg: TrajectoryBuilderConfig,
        pool=None,
        metrics=None,
        mesh=None,
    ):
        """`pool`: optional native TaskThreadPool — loop-constraint searches
        then run as background tasks (the reference's ThreadPool Task DAG,
        constraint_builder_3d.cc:130-159) and optimization waits for them
        (WaitForAllComputations, pose_graph_3d.cc:517-533).

        `mesh`: optional `jax.sharding.Mesh` — the batched loop-constraint
        search (all sampled nodes of a finishing submap vs one target
        submap) then shards its node batch across the mesh's devices, with
        the target submap's grids/pyramid replicated; XLA partitions the
        per-node coarse-to-fine search and GN refinement over ICI. This is
        the TPU-native analog of the reference's distributed constraint
        computation on the gRPC MapBuilderServer's thread pool (SURVEY
        §2.4: sharded constraint search over ICI)."""
        self.cfg = cfg
        self.tb_cfg = tb_cfg
        self.nodes: List[NodeRecord] = []
        self.submaps: List[SubmapRecord] = []
        self.constraints: List[Constraint] = []
        self._constraint_index: set = set()  # {(submap_id, node_id)}
        # --- multi-trajectory bookkeeping (map_builder.cc:98-169,
        # pose_graph_3d.cc:113-144, TrajectoryConnectivityState) ---
        self._trajectory_states: Dict[int, str] = {}  # ACTIVE|FINISHED|FROZEN
        self._traj_submap_counts: Dict[int, int] = {}
        self._conn_parent: Dict[int, int] = {}  # union-find over trajectories
        self._last_connection: Dict[Tuple[int, int], float] = {}
        self._nodes_since_optimization = 0
        self._opt_pending = False  # a pool-task solve is queued/running
        self._num_histogram = tb_cfg.rotational_histogram_size
        self._hi_spec, self._lo_spec = grid_specs(tb_cfg.submaps)
        self._compress_capacity = 1 << 18
        self._jit_cache: Dict[str, object] = {}
        self._pool = pool
        self._mesh = mesh
        self._mutex = threading.Lock()
        self._metrics = metrics  # dict from metrics.register_all_metrics
        # auxiliary observations (OptimizationProblem3D retains GPS/landmark
        # costs, optimization_problem_3d.cc:491-548)
        self.fixed_frame_observations: List[Tuple[int, np.ndarray, float]] = []
        # (node, node2, alpha, lid, rel_q, rel_t, tw, rw)
        self.landmark_observations: List[Tuple] = []
        self._landmark_ids: Dict[str, int] = {}
        # node-node relative odometry links (first, second, Rigid3)
        self.odometry_links: List[Tuple[int, int, Rigid3]] = []
        # per-finished-submap constraint-search wall latency (seconds), one
        # entry per _compute_constraints_for_submap call — the analog of the
        # reference's work-item queue latency on its 8 background threads
        # (constraint_builder_3d.cc WhenDone timing); benchmark surface.
        self.constraint_search_seconds: List[float] = []
        # cumulative wall seconds per backend phase (search staging /
        # match+refine wait / SPA solve ...) — the per-phase breakdown the
        # e2e benchmark reports; the reference's TicToc sum_t_cost_ analog
        # (pose_graph_3d.cc:446,504).
        self.phase_seconds: Dict[str, float] = collections.defaultdict(float)
        self._phase_lock = threading.Lock()
        # LRU of decompressed (g_hi, g_lo, pyramid) per finished submap:
        # every (from, to) search pair and every later search round reuses
        # the same target grids, and re-decompressing + re-max-pooling costs
        # device time per pair (the reference keeps each finished submap's
        # HybridGrid + PrecomputationGridStack3D alive for exactly this
        # reason — constraint_builder_3d.cc submap_scan_matchers_). Capacity
        # bounds HBM (a flagship 448^3 submap is ~400 MB decompressed).
        self._grid_cache: "collections.OrderedDict[int, tuple]" = (
            collections.OrderedDict()
        )

    def _phase(self, name: str, seconds: float) -> None:
        with self._phase_lock:
            self.phase_seconds[name] += seconds

    def _decompressed_grids(self, to_id: int):
        """(g_hi, g_lo, pyramid) for a finished submap, LRU-cached on
        device (PrecomputationGridStack3D reuse semantics)."""
        if "decompress" not in self._jit_cache:
            # standalone consumers (submap_query texture rendering) reach
            # here before any constraint search has built the jit cache
            self._matcher_fns()
        with self._phase_lock:
            hit = self._grid_cache.get(to_id)
            if hit is not None:
                self._grid_cache.move_to_end(to_id)
                return hit
        t0 = _time.perf_counter()
        sub = self.submaps[to_id]
        out = self._jit_cache["decompress"](sub.high, sub.low)
        self._phase("search_decompress", _time.perf_counter() - t0)
        with self._phase_lock:
            self._grid_cache[to_id] = out
            while len(self._grid_cache) > max(1, self.cfg.grid_cache_size):
                self._grid_cache.popitem(last=False)
        return out

    # ----- data ingestion (GlobalTrajectoryBuilder::AddSensorData ->
    # PoseGraph3D::AddNode, pose_graph_3d.cc:113-144) -----

    @property
    def low_compress_capacity(self) -> int:
        """Sparse-cell capacity for low-res submap grids (coarser cells ->
        fewer occupied voxels). The single source for frontend capture paths
        that pre-compress on device (map_builder.py)."""
        return self._compress_capacity // 4

    # ----- trajectory lifecycle (MapBuilder::AddTrajectoryBuilder /
    # FinishTrajectory / FreezeTrajectory, map_builder.cc:98-169;
    # PoseGraph3D trajectory states + connectivity) -----

    def add_trajectory(self, frozen: bool = False) -> int:
        """Register a trajectory id. Ids are dense ints; connectivity starts
        as a singleton component (TrajectoryConnectivityState::Add)."""
        tid = len(self._trajectory_states)
        self._trajectory_states[tid] = "FROZEN" if frozen else "ACTIVE"
        self._traj_submap_counts[tid] = 0
        self._conn_parent[tid] = tid
        return tid

    def _ensure_trajectory(self, tid: int) -> None:
        while tid >= len(self._trajectory_states):
            self.add_trajectory()

    def finish_trajectory(self, trajectory_id: int) -> None:
        self._ensure_trajectory(trajectory_id)
        self._trajectory_states[trajectory_id] = "FINISHED"

    def freeze_trajectory(self, trajectory_id: int) -> None:
        """FreezeTrajectory: poses of its nodes/submaps never move again."""
        self._ensure_trajectory(trajectory_id)
        self._trajectory_states[trajectory_id] = "FROZEN"
        for s in self.submaps:
            if s.trajectory_id == trajectory_id:
                s.frozen = True
        for n in self.nodes:
            if n.trajectory_id == trajectory_id:
                n.frozen = True

    def trajectory_states(self) -> Dict[int, str]:
        return dict(self._trajectory_states)

    def _find(self, tid: int) -> int:
        root = tid
        while self._conn_parent[root] != root:
            root = self._conn_parent[root]
        while self._conn_parent[tid] != root:  # path compression
            self._conn_parent[tid], tid = root, self._conn_parent[tid]
        return root

    def connect_trajectories(self, a: int, b: int, time: float) -> None:
        """TrajectoryConnectivityState::Connect: union + last-connection
        stamp (pose_graph_3d.cc ComputeConstraint result handling)."""
        self._ensure_trajectory(max(a, b))
        self._conn_parent[self._find(a)] = self._find(b)
        key = (min(a, b), max(a, b))
        self._last_connection[key] = max(
            self._last_connection.get(key, float("-inf")), time
        )

    def trajectories_connected(self, a: int, b: int) -> bool:
        if a == b:
            return True
        if a >= len(self._trajectory_states) or b >= len(self._trajectory_states):
            return False
        return self._find(a) == self._find(b)

    def last_connection_time(self, a: int, b: int) -> float:
        """Most recent INTER-constraint stamp between two trajectories
        (-inf if never directly connected)."""
        if a == b:
            return float("inf")
        return self._last_connection.get((min(a, b), max(a, b)), float("-inf"))

    def add_submap(self, local_pose: Rigid3, trajectory_id: int = 0) -> int:
        self._ensure_trajectory(trajectory_id)
        idx = self._traj_submap_counts[trajectory_id]
        self._traj_submap_counts[trajectory_id] = idx + 1
        self.submaps.append(
            SubmapRecord(
                local_pose=local_pose,
                global_pose=local_pose,
                histogram=np.zeros(self._num_histogram, np.float32),
                trajectory_id=trajectory_id,
                index_in_trajectory=idx,
            )
        )
        return len(self.submaps) - 1

    def finish_submap(self, submap_id: int, high_values, low_values) -> None:
        """Compress the finished submap's grids for loop closure
        (the reference keeps the shared_ptr; we keep sparse copies).
        `high_values` is a dense flat grid, or an already-compressed
        CompressedGrid when the frontend runs the brick grid (the capture
        path compresses on-device, mapping/brick_grid.py compress_brick)."""
        s = self.submaps[submap_id]
        if isinstance(high_values, CompressedGrid):
            s.high = jax.tree.map(jnp.asarray, high_values)
        else:
            s.high = compress(high_values, self._hi_spec, self._compress_capacity)
        if isinstance(low_values, CompressedGrid):
            s.low = jax.tree.map(jnp.asarray, low_values)
        else:
            s.low = compress(
                low_values, self._lo_spec, self.low_compress_capacity
            )
        # The top-down projection (loop-proposal image) is computed LAZILY
        # by _submap_image on the search worker, not here: finish_submap
        # runs on the ingest thread, and projecting (decompress + reduce +
        # a blocking host fetch) behind the shared device queue would stall
        # scan ingestion (the reference likewise projects at
        # feature-extraction time on its task pool,
        # constraint_builder_3d.cc:436-532).
        s.finished = True

    def add_node(
        self,
        node: NodeRecord,
        insertion_submap_ids: Tuple[int, ...],
        newly_finished_submap_id: int = -1,
        finished_grids=None,
    ) -> int:
        """AddNode + ComputeConstraintsForNode (pose_graph_3d.cc:335-399).
        The node's trajectory_id must match its insertion submaps'."""
        self._ensure_trajectory(node.trajectory_id)
        node_id = len(self.nodes)
        node.submap_ids = tuple(insertion_submap_ids)
        # Node-rate bookkeeping runs on the HOST in numpy (float64, the
        # reference's graph precision): routing these tiny compositions
        # through jnp costs a device dispatch each, which dominates
        # long-trajectory ingest (5k-node soak).
        node_local = np_rigid(node.local_pose)
        # global pose seeded through the first insertion submap
        first = self.submaps[insertion_submap_ids[0]]
        node.global_pose = np_compose(
            np_rigid(first.global_pose),
            np_compose(np_inverse(np_rigid(first.local_pose)), node_local),
        )
        self.nodes.append(node)

        # INTRA constraints vs each insertion submap (:348-365)
        node_hist = np.asarray(node.histogram)
        grav_conj = np_quat_conjugate(
            np.asarray(node.gravity_alignment, np.float64)
        )
        for sid in insertion_submap_ids:
            sub = self.submaps[sid]
            rel = np_compose(np_inverse(np_rigid(sub.local_pose)), node_local)
            self._append_constraint(
                Constraint(
                    submap_id=sid,
                    node_id=node_id,
                    relative=rel,
                    translation_weight=self.cfg.matcher_translation_weight,
                    rotation_weight=self.cfg.matcher_rotation_weight,
                    tag="INTRA",
                )
            )
            sub.node_ids.append(node_id)
            # accumulate the submap reference histogram at the node's yaw in
            # the submap frame (RotationalScanMatcher ctor semantics)
            yaw = np_quat_yaw(np_quat_multiply(rel.rotation, grav_conj))
            sub.histogram += np_rotate_histogram(node_hist, yaw)

        # submap finished -> compress + search loop constraints (:390-399)
        if newly_finished_submap_id >= 0 and finished_grids is not None:
            self.finish_submap(newly_finished_submap_id, *finished_grids)
            if self._pool is not None:
                sid = newly_finished_submap_id
                self._pool.add_task(
                    lambda: self._compute_constraints_for_submap(sid)
                )
                if self._metrics:
                    self._metrics["queue_length"].add().increment()
            else:
                self._compute_constraints_for_submap(newly_finished_submap_id)

        self._nodes_since_optimization += 1
        if (
            self.cfg.optimize_every_n_nodes > 0
            and self._nodes_since_optimization >= self.cfg.optimize_every_n_nodes
        ):
            self._nodes_since_optimization = 0
            if self._pool is not None:
                # Periodic optimization runs AS A POOL TASK (the reference's
                # DispatchOptimization → HandleWorkQueue on its thread pool,
                # pose_graph_3d.cc:403-420): local SLAM ingest never waits
                # for the SPA solve. Searches still in flight contribute
                # their constraints to the next solve. One pending solve at
                # a time — a second trigger while one is queued is folded
                # into it (HandleWorkQueue drains the whole queue).
                if not self._opt_pending:
                    self._opt_pending = True
                    self._pool.add_task(self._run_optimization_task)
            else:
                self.run_optimization(wait=False)
        return node_id

    def _run_optimization_task(self) -> None:
        try:
            self.run_optimization(wait=False)
        finally:
            self._opt_pending = False

    def add_fixed_frame_pose(
        self, node_id: int, position, weight: Optional[float] = None
    ) -> None:
        """GPS/navsat observation of a node's position in the fixed frame
        (AddFixedFramePoseData)."""
        w = weight or self.cfg.optimization_problem.fixed_frame_pose_translation_weight
        self.fixed_frame_observations.append(
            (node_id, np.asarray(position, np.float32), float(w))
        )

    def add_landmark_observation(
        self,
        node_id: int,
        landmark_id: str,
        position_in_tracking,
        weight: float = 1e2,
        *,
        rotation_in_tracking=None,
        rotation_weight: float = 0.0,
        node_id2: Optional[int] = None,
        alpha: float = 0.0,
    ) -> None:
        """Landmark observed from the pose interpolated between bracketing
        nodes `node_id`/`node_id2` at `alpha` (AddLandmarkData +
        landmark_cost_function_3d.h). The observation carries the landmark's
        full pose in the tracking frame: `rotation_in_tracking` (default
        identity) constrains the landmark's world rotation when
        `rotation_weight > 0`; with the defaults this degrades gracefully to
        the translation-only single-node model."""
        if landmark_id not in self._landmark_ids:
            self._landmark_ids[landmark_id] = len(self._landmark_ids)
        lid = self._landmark_ids[landmark_id]
        rq = (
            np.asarray([1.0, 0.0, 0.0, 0.0], np.float32)
            if rotation_in_tracking is None
            else np.asarray(rotation_in_tracking, np.float32)
        )
        self.landmark_observations.append(
            (
                node_id,
                node_id if node_id2 is None else node_id2,
                float(alpha),
                lid,
                rq,
                np.asarray(position_in_tracking, np.float32),
                float(weight),
                float(rotation_weight),
            )
        )

    def add_odometry_between(
        self,
        node_id: int,
        node_time: float,
        odometry: "TransformInterpolationBuffer",
        trajectory_id: int = 0,
        prev_node_id: Optional[int] = None,
    ) -> None:
        """Record the odometry-implied relative pose between this node and
        its predecessor on the same trajectory
        (CalculateOdometryBetweenNodes, optimization_problem_3d.cc:590-607).
        The link becomes an SPA cost when
        optimization_problem.use_consecutive_node_costs is set (upstream's
        fix_z_in_3d block — commented out in the D-LIOM reference, restored
        here behind the flag); otherwise it is retained for queries only.

        `odometry` is a TransformInterpolationBuffer; `prev_node_id` is the
        caller-tracked same-trajectory predecessor (O(1) vs scanning the
        node list backwards on every ingest)."""
        prev = prev_node_id
        if prev is None:  # fallback for callers without predecessor tracking
            for nid in range(node_id - 1, -1, -1):
                if self.nodes[nid].trajectory_id == trajectory_id:
                    prev = nid
                    break
        if prev is None:
            return
        t0, t1 = self.nodes[prev].time, node_time
        if not (odometry.has(t0) and odometry.has(t1)):
            return
        p0, p1 = odometry.lookup(t0), odometry.lookup(t1)
        # node-rate ingest path: numpy composition, no device dispatch
        self.odometry_links.append(
            (prev, node_id, np_compose(np_inverse(np_rigid(p0)), np_rigid(p1)))
        )

    def landmark_poses(self) -> Dict[str, np.ndarray]:
        out = {}
        if getattr(self, "_last_landmark_positions", None) is not None:
            for name, lid in self._landmark_ids.items():
                out[name] = self._last_landmark_positions[lid]
        return out

    # ----- loop closure -----

    def _close_submaps(self, submap_id: int) -> List[int]:
        """Older finished submaps within range (max_radius /
        num_close_submaps_loop_with_initial_value).

        DOCUMENTED DEVIATION from pose_graph_3d.cc: the effective radius is
        `max_radius_enable_loop_detection * max(1, num_close/5)` — the radius
        scales with the candidate budget so a generous candidate count (e.g.
        the viral preset's 30) widens the search to where drifted loops
        actually sit (5 m would only ever rediscover neighbors). With the
        default num_close <= 5 this is exactly the reference semantics. See
        PARITY.md C20."""
        me = self.submaps[submap_id]
        out = []
        for sid, s in enumerate(self.submaps):
            if sid == submap_id or not s.finished or s.high is None or s.trimmed:
                continue
            if (
                s.trajectory_id == me.trajectory_id
                and abs(s.index_in_trajectory - me.index_in_trajectory) <= 1
            ):
                continue  # adjacent same-trajectory submaps share nodes
            d = float(
                np.linalg.norm(
                    np.asarray(s.global_pose.translation)
                    - np.asarray(me.global_pose.translation)
                )
            )
            if d <= self.cfg.max_radius_enable_loop_detection * max(
                1.0, self.cfg.num_close_submaps_loop_with_initial_value / 5.0
            ):
                out.append((d, sid))
        out.sort()
        return [sid for _, sid in out[: self.cfg.num_close_submaps_loop_with_initial_value]]

    def _matcher_fns(self):
        """Populate the jit cache with the loop-search device programs."""
        if "search_batch" in self._jit_cache:
            return
        fc_cfg = self.cfg.constraint_builder.fast_correlative_scan_matcher
        # With-initial yaw fan (see ConstraintBuilderConfig): > 1 candidates
        # search a narrow window around the initial yaw; the fan reuses
        # fc.match's linspace branch via a narrowed angular_search_window.
        n_yaw = int(self.cfg.constraint_builder.with_initial_num_yaw_candidates)
        fc_cfg_initial = (
            dataclasses.replace(
                fc_cfg,
                angular_search_window=float(
                    self.cfg.constraint_builder.with_initial_yaw_window
                ),
            )
            if n_yaw > 1
            else fc_cfg
        )
        loop_cfg = self.cfg.constraint_builder.ceres_scan_matcher
        hi, lo = self._hi_spec, self._lo_spec
        stride = int(self.cfg.constraint_builder.coarse_scoring_stride)

        @jax.jit
        def decompress_and_pyramid(high_comp, low_comp):
            g_hi = decompress(high_comp, hi)
            g_lo = decompress(low_comp, lo)
            pyr = build_pyramid(
                g_hi, hi, depth=fc_cfg.branch_and_bound_depth,
                full_resolution_depth=fc_cfg.full_resolution_depth,
            )
            return g_hi, g_lo, pyr

        @jax.jit
        def refine_fn(initial, g_hi, g_lo, hp, hm, lp, lm):
            return gn_match(
                initial,
                clouds=[(hp, hm), (lp, lm)],
                grids=[g_hi, g_lo],
                specs=[hi, lo],
                occupied_space_weights=[
                    loop_cfg.occupied_space_weight_0,
                    loop_cfg.occupied_space_weight_1,
                ],
                translation_weight=loop_cfg.translation_weight,
                rotation_weight=loop_cfg.rotation_weight,
                only_optimize_yaw=loop_cfg.only_optimize_yaw,
                max_iterations=loop_cfg.max_num_iterations,
                function_tolerance=loop_cfg.function_tolerance,
            )

        # Batched variants: all sampled nodes of a from-submap match one
        # target submap in a single dispatch (the pyramid/grids broadcast;
        # node clouds/initials stack on a leading axis). One jit call per
        # (from, to) pair instead of one per (node, to) pair. With a mesh,
        # the node batch is sharded over its devices (grids replicated) —
        # loop search scales over ICI.
        mesh = self._mesh

        def shard_batch(tree):
            if mesh is None:
                return tree
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]

            def one(x):
                spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec)
                )

            return jax.tree.map(one, tree)

        # COMBINED search programs: BnB match + GN refinement of every node
        # in one device program, returning (found, score, refined pose,
        # refined's yaw) as a single small fetch. One dispatch and one
        # deferred host read per chunk — the per-phase D2H round trips
        # (~30 ms each through the relay) that a separate
        # match→read→refine→read chain pays then overlap program execution
        # instead of serializing after it. Refinement runs on ALL nodes
        # (found or not — the unfound rows are discarded on host); at chunk
        # size 4 that costs ~30 ms of device time against two saved round
        # trips and a second staging pass.
        @functools.partial(jax.jit, static_argnames=("min_score",))
        def search_batch_fn(
            pyr, g_hi, g_lo, hp, hm, lp, lm, initial, hist, submap_hist,
            yaw0, min_score,
        ):
            hp, hm, lp, lm, initial, hist, yaw0 = shard_batch(
                (hp, hm, lp, lm, initial, hist, yaw0)
            )
            res = jax.vmap(
                lambda a, b, c, d, e, f, g: fc.match(
                    pyr, hi, g_lo, lo, a, b, c, d, e, f,
                    submap_hist, g, fc_cfg_initial, min_score,
                    num_angles=n_yaw, use_rotational_gate=False,
                    beam_width=160, coarse_point_stride=stride,
                )
            )(hp, hm, lp, lm, initial, hist, yaw0)
            refined = jax.vmap(
                lambda i, a, b, c, d: refine_fn(i, g_hi, g_lo, a, b, c, d)
            )(res.pose, hp, hm, lp, lm)
            return res.found, res.score, refined.pose

        @functools.partial(jax.jit, static_argnames=("min_score",))
        def search_full_batch_fn(
            pyr, g_hi, g_lo, hp, hm, lp, lm, rot, hist, submap_hist,
            min_score,
        ):
            hp, hm, lp, lm, rot, hist = shard_batch(
                (hp, hm, lp, lm, rot, hist)
            )
            res = jax.vmap(
                lambda a, b, c, d, r, f: fc.match_full_submap(
                    pyr, hi, g_lo, lo, a, b, c, d, r, f,
                    submap_hist, fc_cfg, min_score, beam_width=1024,
                    coarse_point_stride=stride,
                )
            )(hp, hm, lp, lm, rot, hist)
            refined = jax.vmap(
                lambda i, a, b, c, d: refine_fn(i, g_hi, g_lo, a, b, c, d)
            )(res.pose, hp, hm, lp, lm)
            return res.found, res.score, refined.pose

        self._jit_cache["decompress"] = decompress_and_pyramid
        self._jit_cache["search_batch"] = search_batch_fn
        self._jit_cache["search_full_batch"] = search_full_batch_fn

    def _global_candidates(self, from_id: int) -> List[int]:
        """Finished submaps of OTHER trajectories that are either not yet
        connected to ours or whose last connection is older than
        `global_constraint_search_after_n_seconds` — these get the
        whole-submap global search (MaybeAddGlobalConstraint semantics,
        the reference's global_sampling_ratio path). Proximity is useless
        here: disconnected trajectories share no frame."""
        from_sub = self.submaps[from_id]
        from_t = from_sub.trajectory_id
        if from_sub.node_ids:
            now = self.nodes[from_sub.node_ids[-1]].time
        else:
            now = float("inf")
        out = []
        for sid, s in enumerate(self.submaps):
            if sid == from_id or not s.finished or s.high is None or s.trimmed:
                continue
            if s.trajectory_id == from_t:
                continue
            stale = (
                now - self.last_connection_time(from_t, s.trajectory_id)
                > self.cfg.global_constraint_search_after_n_seconds
            )
            if not self.trajectories_connected(from_t, s.trajectory_id) or stale:
                out.append(sid)
        k = self.cfg.num_close_submaps_loop_with_initial_value
        return out[-k:] if k > 0 else []

    def _compute_constraints_for_submap(self, from_id: int) -> int:
        """Timed entry: records per-finished-submap search wall latency in
        `constraint_search_seconds` (covers inline and pool-worker paths)."""
        t0 = _time.perf_counter()
        try:
            return self._compute_constraints_for_submap_impl(from_id)
        finally:
            self.constraint_search_seconds.append(_time.perf_counter() - t0)

    def _compute_constraints_for_submap_impl(self, from_id: int) -> int:
        """ComputeConstraintsBetweenSubmaps (constraint_builder_3d.cc:162):
        every `every_nodes_to_find_constraint`-th node of the finishing
        submap is matched against each close older submap; submaps of
        unconnected (or long-unconnected) trajectories get the whole-submap
        global search instead."""
        added = 0
        self._matcher_fns()  # populate the jit cache
        cb = self.cfg.constraint_builder
        every = max(1, cb.every_nodes_to_find_constraint)
        from_sub = self.submaps[from_id]
        sampled = from_sub.node_ids[::every]
        # image-based proposals for far (high-drift) submaps: the SURF path
        # substitute (ExtractFeaturesForSubmap); stored as {to_id: proposal}
        image_proposals = self._image_proposals(from_id)
        candidates = list(self._close_submaps(from_id))
        for to_id in image_proposals:
            if to_id not in candidates:
                candidates.append(to_id)
        global_candidates = self._global_candidates(from_id)
        candidates = [c for c in candidates if c not in global_candidates]
        search_batch = self._jit_cache["search_batch"]
        search_full = self._jit_cache["search_full_batch"]

        # Node batches pad to power-of-two BUCKETS: the batched matchers
        # jit per leading-axis size, and the surviving-node count varies per
        # (from, to) pair — unpadded, nearly every search paid a fresh XLA
        # compile (the big with-initial search program compiles in minutes),
        # which measured at 0.38 scans/s end-to-end on the loop-dense bench
        # course. Buckets bound the compile count at log2(chunk) shapes, all
        # reused within a run and across runs via the persistent compile
        # cache. Padding repeats row 0; results beyond the real count are
        # ignored on host.
        def bucket(n: int) -> int:
            return 1 << (n - 1).bit_length() if n > 1 else 1

        def bstack(xs, b):
            a = np.stack([np.asarray(x) for x in xs])
            if b > len(xs):
                a = np.concatenate([a, np.repeat(a[:1], b - len(xs), axis=0)])
            return jnp.asarray(a)

        def bstack_tree(trees, b):
            return jax.tree.map(lambda *xs: bstack(list(xs), b), *trees)

        # ---- DISPATCH phase: stage + launch every (pair, chunk)'s combined
        # match+refine program without reading anything back. All host reads
        # happen in the DRAIN phase below, so the per-chunk device→host
        # round trips (~30 ms each through the relay) overlap queued program
        # execution instead of serializing after each one. Chunked to
        # max_nodes_per_search_dispatch so no single program monopolizes the
        # FIFO device queue the latency-critical frontend step shares (the
        # reference's searches run on CPU worker threads and never block its
        # SLAM thread; bounded program size is the single-chip equivalent).
        chunk = max(1, cb.max_nodes_per_search_dispatch)
        t_st = _time.perf_counter()
        pending: List[Tuple] = []
        for to_id in candidates:
            to_sub = self.submaps[to_id]
            # max_constraint_distance gates each node-submap pair
            # (constraint_builder MaybeAddConstraint's distance check) —
            # but only on the proximity path: image proposals exist
            # precisely for loops whose global-pose estimates have drifted
            # beyond any distance gate (the reference's feature path,
            # ComputeConstraintsBetweenSubmaps, is likewise ungated), so
            # gating them on the drifted estimate would veto the loops the
            # path was built to close. Distances in numpy: host bookkeeping,
            # no per-pair device dispatch.
            to_t = np.asarray(to_sub.global_pose.translation)
            node_ids = [
                n
                for n in sampled
                if not self._has_constraint(to_id, n)
                and (
                    to_id in image_proposals
                    or float(
                        np.linalg.norm(
                            np.asarray(self.nodes[n].global_pose.translation)
                            - to_t
                        )
                    )
                    <= cb.max_constraint_distance
                )
            ]
            if not node_ids:
                continue
            g_hi, g_lo, pyr = self._decompressed_grids(to_id)
            submap_hist = jnp.asarray(to_sub.histogram)
            initials = []
            for node_id in node_ids:
                node = self.nodes[node_id]
                if to_id in image_proposals:
                    # initial from the 2D image proposal (ComputeConstraint's
                    # submap_to_submap_2D composition :240-259); numpy
                    # composition — node-rate host path
                    node_in_from = np_compose(
                        np_inverse(np_rigid(from_sub.local_pose)),
                        np_rigid(node.local_pose),
                    )
                    initials.append(proposal_to_initial_guess(
                        image_proposals[to_id], node_in_from,
                    ))
                else:
                    # initial from the current global estimates
                    initials.append(self._initial_guess(to_sub, node))
            if self._metrics:
                for _ in node_ids:
                    self._metrics["constraints_searched"].add().increment()
            for lo_i in range(0, len(node_ids), chunk):
                ids_c = node_ids[lo_i : lo_i + chunk]
                initials_c = initials[lo_i : lo_i + chunk]
                nodes = [self.nodes[n] for n in ids_c]
                nb = bucket(len(ids_c))
                staged = (
                    bstack([n.high_points for n in nodes], nb),
                    bstack([n.high_mask for n in nodes], nb),
                    bstack([n.low_points for n in nodes], nb),
                    bstack([n.low_mask for n in nodes], nb),
                    bstack_tree(initials_c, nb),
                    bstack([n.histogram for n in nodes], nb),
                    submap_hist,
                    bstack(
                        [np.float32(
                            np_quat_yaw(np.asarray(i.rotation, np.float64)))
                         for i in initials_c], nb
                    ),
                )
                t_dp = _time.perf_counter()
                found, score, pose = search_batch(
                    pyr, g_hi, g_lo, *staged, min_score=float(cb.min_score),
                )
                self._phase("search_dispatch", _time.perf_counter() - t_dp)
                pending.append(
                    ("loop", to_id, ids_c, initials_c, found, score, pose)
                )

        # ---- global search: whole-submap all-yaw match against submaps of
        # unconnected (or stale-connected) trajectories, sampled at
        # global_sampling_ratio and gated by global_localization_min_score
        # (MaybeAddGlobalConstraint / MatchFullSubmap) ----
        g_stride = max(
            1, int(round(1.0 / max(self.cfg.global_sampling_ratio, 1e-6)))
        )
        for to_id in global_candidates:
            to_sub = self.submaps[to_id]
            node_ids = [
                n for n in sampled[::g_stride]
                if not self._has_constraint(to_id, n)
            ]
            if not node_ids:
                continue
            g_hi, g_lo, pyr = self._decompressed_grids(to_id)
            submap_hist = jnp.asarray(to_sub.histogram)
            if self._metrics:
                for _ in node_ids:
                    self._metrics["constraints_searched"].add().increment()
            for lo_i in range(0, len(node_ids), chunk):
                ids_c = node_ids[lo_i : lo_i + chunk]
                nodes = [self.nodes[n] for n in ids_c]
                nb = bucket(len(ids_c))
                # roll/pitch-consistent rotation guess from the
                # gravity-aligned global estimates; yaw error is irrelevant
                # under the ±pi search. numpy quaternion product — host path.
                rots = bstack(
                    [
                        np_quat_multiply(
                            np_quat_conjugate(
                                np.asarray(
                                    to_sub.global_pose.rotation, np.float64
                                )
                            ),
                            np.asarray(n.global_pose.rotation, np.float64),
                        ).astype(np.float32)
                        for n in nodes
                    ],
                    nb,
                )
                found, score, pose = search_full(
                    pyr, g_hi, g_lo,
                    bstack([n.high_points for n in nodes], nb),
                    bstack([n.high_mask for n in nodes], nb),
                    bstack([n.low_points for n in nodes], nb),
                    bstack([n.low_mask for n in nodes], nb),
                    rots,
                    bstack([n.histogram for n in nodes], nb),
                    submap_hist,
                    min_score=float(cb.global_localization_min_score),
                )
                pending.append(
                    ("GLOBAL", to_id, ids_c, None, found, score, pose)
                )
        self._phase("search_stage", _time.perf_counter() - t_st)

        # ---- DRAIN phase: ONE batched device_get over every chunk's
        # (found, score, pose) — the leaves fetch concurrently, so the whole
        # drain costs one relay round trip after the last queued program
        # finishes (per-chunk np.asarray reads each paid their own ~30 ms
        # round trip: ~4 reads x chunks ~= 14 s of pure RTT on the bench
        # course).
        t_dr = _time.perf_counter()
        fetched = jax.device_get([p[4:] for p in pending])
        self._phase("search_drain", _time.perf_counter() - t_dr)
        t_ap = _time.perf_counter()
        for (kind, to_id, ids_c, initials_c, _, _, _), (
            found, score, pose
        ) in zip(pending, fetched):
            found_np = np.asarray(found)[: len(ids_c)]
            if not found_np.any():
                continue
            scores = score
            pose_np = pose
            for i in np.flatnonzero(found_np):
                dyaw = 0.0
                if initials_c is not None:
                    dyaw = float(
                        np_quat_yaw(
                            np_quat_multiply(
                                np.asarray(pose_np.rotation[i], np.float64),
                                np_quat_conjugate(
                                    np.asarray(
                                        initials_c[i].rotation, np.float64
                                    )
                                ),
                            )
                        )
                    )
                with self._mutex:
                    self._append_constraint_locked(
                        Constraint(
                            submap_id=to_id,
                            node_id=ids_c[i],
                            relative=jax.tree.map(lambda x: x[i], pose_np),
                            translation_weight=cb.loop_closure_translation_weight,
                            rotation_weight=cb.loop_closure_rotation_weight,
                            tag="INTER",
                            score=float(scores[i]),
                            yaw_correction=dyaw,
                        )
                    )
                if cb.log_matches:
                    _LOG.info(
                        "%s constraint: node %d -> submap %d score %.3f",
                        kind, ids_c[i], to_id, float(scores[i]),
                    )
                if self._metrics:
                    self._metrics["constraints_found"].add().increment()
                    self._metrics["constraint_scores"].add().observe(
                        float(scores[i])
                    )
                added += 1
        self._phase("search_append", _time.perf_counter() - t_ap)
        # the matching increment only happens on the pool-dispatch path
        if self._metrics and self._pool is not None:
            self._metrics["queue_length"].add().decrement()
        return added

    def _initial_guess(self, to_sub: SubmapRecord, node: NodeRecord) -> Rigid3:
        return np_compose(
            np_inverse(np_rigid(to_sub.global_pose)), np_rigid(node.global_pose)
        )

    def _submap_image(self, sid: int) -> Optional[SubmapImage]:
        """Lazily-computed, cached top-down projection of a finished submap
        (ProjectToCvMat, submap_3d.cc:381-463). Runs on the calling (search
        worker) thread; reuses the decompressed-grid LRU."""
        s = self.submaps[sid]
        if s.image is not None or not s.finished or s.high is None:
            return s.image
        t0 = _time.perf_counter()
        if "project" not in self._jit_cache:
            size = self.cfg.constraint_builder.image_proposal_size
            spec = self._hi_spec
            self._jit_cache["project"] = jax.jit(
                lambda g: project_to_image(g, spec, size)
            )
        g_hi, _, _ = self._decompressed_grids(sid)
        s.image = jax.device_get(self._jit_cache["project"](g_hi))
        self._phase("search_project", _time.perf_counter() - t0)
        return s.image

    def _image_proposals(self, from_id: int):
        """FFT-correlation submap-to-submap proposals vs older finished
        submaps (the SURF/FLANN/RANSAC substitute, C10). Returns
        {to_id: Proposal} for proposals above the score gate."""
        cb = self.cfg.constraint_builder
        if not cb.use_image_proposals:
            return {}
        from_sub = self.submaps[from_id]
        t0 = _time.perf_counter()
        from_image = self._submap_image(from_id)
        if from_image is None:
            return {}
        out = {}
        candidates = [
            sid
            for sid, s in enumerate(self.submaps)
            if s.finished
            and s.high is not None
            and not s.trimmed
            and sid < from_id
            and not (
                s.trajectory_id == from_sub.trajectory_id
                and abs(s.index_in_trajectory - from_sub.index_in_trajectory)
                <= 1
            )
        ]
        candidates = candidates[-cb.max_image_proposal_candidates:]
        candidates = [
            sid for sid in candidates if self._submap_image(sid) is not None
        ]
        if not candidates:
            return {}
        if "propose" not in self._jit_cache:
            self._jit_cache["propose"] = jax.jit(
                functools.partial(
                    propose_2d_transform, num_yaw=cb.image_proposal_num_yaw
                )
            )
        propose = self._jit_cache["propose"]
        from_img = SubmapImage(
            jnp.asarray(from_image.image), from_image.meters_per_pixel
        )
        # dispatch ALL candidate correlations, then ONE batched device_get —
        # per-pair float() reads each paid a blocking relay round trip
        props = jax.device_get([
            propose(
                SubmapImage(
                    jnp.asarray(self.submaps[to_id].image.image),
                    self.submaps[to_id].image.meters_per_pixel,
                ),
                from_img,
            )
            for to_id in candidates
        ])
        for to_id, prop in zip(candidates, props):
            if float(prop.score) >= cb.image_proposal_min_score:
                out[to_id] = prop
        self._phase("search_propose", _time.perf_counter() - t0)
        return out

    def _append_constraint(self, c: Constraint) -> None:
        with self._mutex:
            self._append_constraint_locked(c)

    def _append_constraint_locked(self, c: Constraint) -> None:
        self.constraints.append(c)
        self._constraint_index.add((c.submap_id, c.node_id))
        # an INTER constraint connects its trajectories (pose_graph_3d.cc
        # HandleWorkQueue -> trajectory_connectivity_state_.Connect)
        if c.tag == "INTER":
            t_sub = self.submaps[c.submap_id].trajectory_id
            node = self.nodes[c.node_id]
            if t_sub != node.trajectory_id:
                self.connect_trajectories(t_sub, node.trajectory_id, node.time)

    def reindex_constraints(self) -> None:
        """Rebuild the (submap, node) membership index after bulk constraint
        assignment (state loading)."""
        with self._mutex:
            self._constraint_index = {
                (c.submap_id, c.node_id) for c in self.constraints
            }

    def _has_constraint(self, submap_id: int, node_id: int) -> bool:
        """O(1) membership via a maintained (submap, node) index — the
        linear scan was O(C) per query inside the background search, a real
        host stall at max_constraints-scale graphs."""
        with self._mutex:
            return (submap_id, node_id) in self._constraint_index

    # ----- optimization (HandleWorkQueue -> RunOptimization,
    # pose_graph_3d.cc:444-515, 722) -----

    def _build_problem(self) -> Tuple[opt.PoseGraphData, int, int]:
        """Build the SPA problem from a CONSISTENT snapshot: counts are
        taken under the mutex, and only the first n entries of each
        append-only list are read — safe while ingest keeps appending nodes
        and background searches keep appending constraints (the pool-task
        optimization path). Returns (data, n_submaps, n_nodes) so the
        caller applies results only to snapshot members."""
        with self._mutex:
            submaps = self.submaps[: len(self.submaps)]
            nodes = self.nodes[: len(self.nodes)]
            constraints = self.constraints[: len(self.constraints)]
            ff_obs = list(self.fixed_frame_observations)
            lm_obs = list(self.landmark_observations)
            odom_links = list(self.odometry_links)
        # drop constraints referencing nodes/submaps beyond the snapshot
        # (cannot happen today — constraints append after their node — but
        # cheap insurance against reordered ingestion)
        constraints = [
            c for c in constraints
            if c.node_id < len(nodes) and c.submap_id < len(submaps)
        ]
        S = self.cfg.max_submaps
        N = self.cfg.max_nodes
        C = self.cfg.max_constraints
        if len(submaps) > S or len(nodes) > N or len(constraints) > C:
            raise RuntimeError("pose graph capacity exceeded; raise max_* config")
        data = opt.make_pose_graph_data(S, N, C)
        sq = np.zeros((S, 4), np.float32); sq[:, 0] = 1
        st = np.zeros((S, 3), np.float32)
        sv = np.zeros(S, bool)
        for i, s in enumerate(submaps):
            sq[i] = np.asarray(s.global_pose.rotation)
            st[i] = np.asarray(s.global_pose.translation)
            sv[i] = True
        nq = np.zeros((N, 4), np.float32); nq[:, 0] = 1
        nt = np.zeros((N, 3), np.float32)
        nv = np.zeros(N, bool)
        for i, node in enumerate(nodes):
            nq[i] = np.asarray(node.global_pose.rotation)
            nt[i] = np.asarray(node.global_pose.translation)
            nv[i] = True
        sfx = np.zeros(S, bool)
        for i, sub in enumerate(submaps):
            sfx[i] = sub.frozen
        # Gauge fixing per connected component: the reference holds the
        # (single) first submap constant (optimization_problem_3d.cc:293);
        # with multiple trajectories a component without any frozen/fixed
        # member leaves the GN normal equations singular, so the first
        # submap of each unanchored component is held fixed.
        parent = list(range(len(submaps)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        first_sub_of_node: Dict[int, int] = {}
        for c in constraints:
            if c.node_id in first_sub_of_node:
                parent[find(first_sub_of_node[c.node_id])] = find(c.submap_id)
            else:
                first_sub_of_node[c.node_id] = c.submap_id
        # Anchoring rules: (1) frozen submaps anchor their component;
        # (2) the FIRST GPS-observed node's component gets its lowest-id
        # submap fixed (unless frozen-anchored) — this pins the solved
        # fixed-frame origin, whose residuals otherwise make (origin, poses)
        # a joint gauge; (3) further GPS components stay free (GPS + pinned
        # origin anchors their translation; rotation gauge rides the CG
        # damping, matching pre-multi-trajectory behavior); (4) every other
        # component gets its lowest-id submap fixed (the reference fixes
        # the single first submap, optimization_problem_3d.cc:293).
        anchored = set()
        for i, sub in enumerate(submaps):
            if sub.frozen:
                anchored.add(find(i))
        gps_comps = set()
        for nid, _, _ in ff_obs:
            if nid in first_sub_of_node:
                r = find(first_sub_of_node[nid])
                if r in anchored or r in gps_comps:
                    continue
                if not gps_comps:  # first GPS component: pin the origin
                    for i in range(len(submaps)):
                        if find(i) == r:
                            sfx[i] = True
                            anchored.add(r)
                            break
                gps_comps.add(r)
        anchored |= gps_comps
        for i in range(len(submaps)):
            r = find(i)
            if r not in anchored:
                sfx[i] = True
                anchored.add(r)
        nfx = np.zeros(N, bool)
        for i, node in enumerate(nodes):
            nfx[i] = node.frozen
        cs = np.zeros(C, np.int32); cn = np.zeros(C, np.int32)
        cq = np.zeros((C, 4), np.float32); cq[:, 0] = 1
        ct = np.zeros((C, 3), np.float32)
        ctw = np.zeros(C, np.float32); crw = np.zeros(C, np.float32)
        cv = np.zeros(C, bool); ci = np.zeros(C, bool)
        for i, c in enumerate(constraints):
            cs[i] = c.submap_id; cn[i] = c.node_id
            cq[i] = np.asarray(c.relative.rotation)
            ct[i] = np.asarray(c.relative.translation)
            ctw[i] = c.translation_weight; crw[i] = c.rotation_weight
            cv[i] = True; ci[i] = c.tag == "INTER"
        F = data.ff_node.shape[0]
        ffn = np.zeros(F, np.int32); fft = np.zeros((F, 3), np.float32)
        ffw = np.zeros(F, np.float32); ffv = np.zeros(F, bool)
        # keep the MOST RECENT observations when over capacity (recent
        # anchoring matters most on long trajectories; silently dropping the
        # newest fixes would un-anchor the live end of the map)
        for i, (nid, pos, w) in enumerate(ff_obs[-F:]):
            ffn[i], fft[i], ffw[i], ffv[i] = nid, pos, w, True
        L = data.lm_node.shape[0]
        lmn = np.zeros(L, np.int32); lmn2 = np.zeros(L, np.int32)
        lma = np.zeros(L, np.float32); lmi = np.zeros(L, np.int32)
        lmq = np.zeros((L, 4), np.float32); lmq[:, 0] = 1
        lmr = np.zeros((L, 3), np.float32)
        lmtw = np.zeros(L, np.float32); lmrw = np.zeros(L, np.float32)
        lmv = np.zeros(L, bool)
        K = data.lm_positions.shape[0]
        lmp = np.zeros((K, 3), np.float32)
        lmpq = np.zeros((K, 4), np.float32); lmpq[:, 0] = 1
        lmpv = np.zeros(K, bool)
        for i, (nid, nid2, alpha, lid, rq, rel, tw, rw) in enumerate(
            lm_obs[-L:]
        ):
            # ids beyond the landmark-position capacity are dropped, NOT
            # clamped: a clamped gather would alias them onto landmark K-1
            lmn[i], lmn2[i], lma[i] = nid, nid2, alpha
            lmi[i], lmq[i], lmr[i] = min(lid, K - 1), rq, rel
            lmtw[i], lmrw[i] = tw, rw
            lmv[i] = lid < K
            if lid < K and not lmpv[lid]:
                # initialize the landmark at its first observation's estimate
                node = nodes[nid]
                lmp[lid] = np.asarray(node.global_pose.apply(jnp.asarray(rel)))
                lmpq[lid] = np.asarray(
                    quat_multiply(node.global_pose.rotation, jnp.asarray(rq))
                )
                lmpv[lid] = True
        # node-node links: odometry (+ consecutive local-SLAM relatives) when
        # use_consecutive_node_costs is enabled (upstream fix_z_in_3d block)
        Q = data.nn_first.shape[0]
        nnf = np.zeros(Q, np.int32); nns = np.zeros(Q, np.int32)
        nnq = np.zeros((Q, 4), np.float32); nnq[:, 0] = 1
        nnt = np.zeros((Q, 3), np.float32)
        nntw = np.zeros(Q, np.float32); nnrw = np.zeros(Q, np.float32)
        nnv = np.zeros(Q, bool)
        op = self.cfg.optimization_problem
        if op.use_consecutive_node_costs:
            links: List[Tuple[int, int, Rigid3, float, float]] = [
                (a, b, rel, op.odometry_translation_weight,
                 op.odometry_rotation_weight)
                for a, b, rel in odom_links
            ]
            prev_by_traj: Dict[int, int] = {}
            for nid, node in enumerate(nodes):
                p = prev_by_traj.get(node.trajectory_id)
                if p is not None and not node.frozen:
                    rel = np_compose(
                        np_inverse(np_rigid(nodes[p].local_pose)),
                        np_rigid(node.local_pose),
                    )
                    links.append(
                        (p, nid, rel, op.local_slam_pose_translation_weight,
                         op.local_slam_pose_rotation_weight)
                    )
                prev_by_traj[node.trajectory_id] = nid
            for i, (a, b, rel, tw, rw) in enumerate(links[-Q:]):
                nnf[i], nns[i] = a, b
                nnq[i] = np.asarray(rel.rotation)
                nnt[i] = np.asarray(rel.translation)
                nntw[i], nnrw[i], nnv[i] = tw, rw, True
        return (data._replace(
            submap_q=jnp.asarray(sq), submap_t=jnp.asarray(st),
            submap_valid=jnp.asarray(sv),
            node_q=jnp.asarray(nq), node_t=jnp.asarray(nt),
            node_valid=jnp.asarray(nv),
            c_submap=jnp.asarray(cs), c_node=jnp.asarray(cn),
            c_q=jnp.asarray(cq), c_t=jnp.asarray(ct),
            c_trans_weight=jnp.asarray(ctw), c_rot_weight=jnp.asarray(crw),
            c_valid=jnp.asarray(cv), c_is_inter=jnp.asarray(ci),
            submap_fixed=jnp.asarray(sfx), node_fixed=jnp.asarray(nfx),
            ff_node=jnp.asarray(ffn), ff_t=jnp.asarray(fft),
            ff_weight=jnp.asarray(ffw), ff_valid=jnp.asarray(ffv),
            lm_node=jnp.asarray(lmn), lm_node2=jnp.asarray(lmn2),
            lm_alpha=jnp.asarray(lma), lm_id=jnp.asarray(lmi),
            lm_rel_q=jnp.asarray(lmq), lm_rel_t=jnp.asarray(lmr),
            lm_trans_weight=jnp.asarray(lmtw), lm_rot_weight=jnp.asarray(lmrw),
            lm_valid=jnp.asarray(lmv),
            lm_q=jnp.asarray(lmpq), lm_positions=jnp.asarray(lmp),
            lm_pos_valid=jnp.asarray(lmpv),
            nn_first=jnp.asarray(nnf), nn_second=jnp.asarray(nns),
            nn_q=jnp.asarray(nnq), nn_t=jnp.asarray(nnt),
            nn_trans_weight=jnp.asarray(nntw), nn_rot_weight=jnp.asarray(nnrw),
            nn_valid=jnp.asarray(nnv),
        ), len(submaps), len(nodes))

    def wait_for_all_computations(self) -> None:
        """WaitForAllComputations (pose_graph_3d.cc:517-533)."""
        if self._pool is not None:
            self._pool.wait_all()

    def run_optimization(
        self, iterations: Optional[int] = None, wait: bool = True
    ) -> None:
        """Solve the SPA problem. `iterations=None` uses the configured
        max_num_iterations; `iterations <= 0` (explicit or configured) skips
        the solve — but still clears the optimize-every-n counter, so a
        non-positive configuration disables optimization instead of
        re-triggering it on every subsequent node. `wait=False` solves on
        the current constraint snapshot without draining the pool (the
        periodic pool-task path — in-flight searches feed the NEXT solve;
        the final optimization keeps wait=True)."""
        if wait:
            self.wait_for_all_computations()
        if not self.constraints or len(self.submaps) < 2:
            self._nodes_since_optimization = 0
            return
        if iterations is None:
            iterations = self.cfg.optimization_problem.max_num_iterations
        iters = iterations
        if iters <= 0:
            self._nodes_since_optimization = 0
            return
        if "solve" not in self._jit_cache:
            # gauge anchoring moved into _build_problem's submap_fixed flags
            # (component-aware); fix_first_submap would redundantly pin
            # submap 0 even when its component is anchored by a frozen map
            self._jit_cache["solve"] = jax.jit(
                functools.partial(
                    opt.solve, cg_iterations=64, mesh=self._mesh,
                    fix_first_submap=False,
                    ff_huber_scale=float(
                        self.cfg.optimization_problem.huber_scale
                    ),
                    # upstream cartographer's HuberLoss(huber_scale) on loop
                    # constraints (the original the reference commented out,
                    # optimization_problem_3d.cc:335); opt-in for parity
                    inter_huber_scale=(
                        float(self.cfg.optimization_problem.huber_scale)
                        if self.cfg.optimization_problem.use_inter_huber
                        else 0.0
                    ),
                ),
                static_argnames=("iterations",),
            )
        t0 = _time.perf_counter()
        data, n_sub, n_node = self._build_problem()
        out = self._jit_cache["solve"](data, iterations=iters)
        self._last_landmark_positions = np.asarray(out.lm_positions)
        sq = np.asarray(out.submap_q); st = np.asarray(out.submap_t)
        nq = np.asarray(out.node_q); nt = np.asarray(out.node_t)
        # Optimized poses live as HOST numpy (the graph bookkeeping frame,
        # float64-composed on node-rate paths); wrapping each in a device
        # array would re-upload S+N tiny buffers every solve. Only the
        # SNAPSHOT members take solver output; entries appended while the
        # solve ran are then EXTRAPOLATED through their trajectory's pose
        # correction (HandleWorkQueue's re-anchoring of nodes added during
        # optimization, pose_graph_3d.cc:444-515).
        last_by_traj = {
            s.trajectory_id: i for i, s in enumerate(self.submaps[:n_sub])
        }
        old_last = {
            t: np_rigid(self.submaps[i].global_pose)
            for t, i in last_by_traj.items()
        }
        for i, s in enumerate(self.submaps[:n_sub]):
            s.global_pose = np_rigid(Rigid3(sq[i], st[i]))
        for i, node in enumerate(self.nodes[:n_node]):
            node.global_pose = np_rigid(Rigid3(nq[i], nt[i]))
        corrections = {
            t: np_compose(
                np_rigid(self.submaps[i].global_pose), np_inverse(old_last[t])
            )
            for t, i in last_by_traj.items()
        }
        for s in self.submaps[n_sub:]:
            c = corrections.get(s.trajectory_id)
            if c is not None:
                s.global_pose = np_compose(c, np_rigid(s.global_pose))
        for node in self.nodes[n_node:]:
            c = corrections.get(node.trajectory_id)
            if c is not None:
                node.global_pose = np_compose(c, np_rigid(node.global_pose))
        self._nodes_since_optimization = 0
        self._phase("spa", _time.perf_counter() - t0)
        if self.cfg.optimization_problem.log_solver_summary:
            _LOG.info(
                "SPA solve: %d GN iters, %d submaps, %d nodes, %d constraints"
                " in %.3f s",
                iters, n_sub, n_node,
                len(self.constraints), _time.perf_counter() - t0,
            )
        if self.cfg.log_residual_histograms:
            self._log_residual_histogram()

    def _log_residual_histogram(self) -> None:
        """Post-solve per-constraint translation residual histogram
        (pose_graph.lua log_residual_histograms; reference logs Ceres
        residual distributions after HandleWorkQueue)."""
        errs = []
        for c in self.constraints:
            sub = self.submaps[c.submap_id]
            node = self.nodes[c.node_id]
            h = np_compose(
                np_inverse(np_rigid(sub.global_pose)), np_rigid(node.global_pose)
            )
            errs.append(
                float(
                    np.linalg.norm(
                        h.translation - np.asarray(c.relative.translation)
                    )
                )
            )
        if not errs:
            return
        hist, edges = np.histogram(np.asarray(errs), bins=10)
        _LOG.info(
            "constraint translation residuals: %s",
            ", ".join(
                f"[{edges[i]:.2f},{edges[i+1]:.2f}):{hist[i]}"
                for i in range(len(hist))
            ),
        )

    def run_final_optimization(self) -> None:
        """RunFinalOptimization (max_num_final_iterations, :722). One GN
        outer iteration here runs 64 preconditioned-CG inner steps, so it is
        NOT comparable to one Ceres LM iteration — the cap keeps the solve
        at an equivalent (converged) effort rather than literally running
        the reference's 400 LM iterations."""
        self.run_optimization(
            iterations=min(self.cfg.max_num_final_iterations, 50)
        )

    # ----- API parity (PoseGraphInterface) -----

    def node_poses(self) -> List[Rigid3]:
        return [n.global_pose for n in self.nodes]

    def submap_poses(self) -> List[Rigid3]:
        return [s.global_pose for s in self.submaps]

    def constraint_list(self) -> List[Constraint]:
        return list(self.constraints)

    def submap_query(self, submap_id: int) -> dict:
        """Single-submap texture + pose query (`MapBuilder::SubmapToProto`,
        map_builder.cc:186-204; `Submap3D::ToResponseProto`,
        submap_3d.cc:253: the reference serves each submap as a textured
        2D slice with its pose/resolution for viewers — the ROS SubmapQuery
        service, cartographer_ros/node.cc:107-114).

        Returns a plain dict (wire-friendly): version (node count), poses,
        finished flag, and — when the finished grid is still held — the
        top-down texture of the high-res grid as uint8 with its
        meters-per-pixel scale. Unfinished/trimmed submaps serve pose-only
        (their grids live on the frontend / were dropped by a trimmer).
        Raises KeyError for an id that does not exist, as the reference
        answers 'Requested submap X but it does not exist'."""
        if not (0 <= submap_id < len(self.submaps)):
            raise KeyError(f"Requested submap {submap_id} but it does not exist")
        s = self.submaps[submap_id]
        out = {
            "submap_id": submap_id,
            "trajectory_id": s.trajectory_id,
            "submap_index": s.index_in_trajectory,
            "version": len(s.node_ids),
            "finished": bool(s.finished),
            "trimmed": bool(s.trimmed),
            "local_pose_q": np.asarray(s.local_pose.rotation, np.float32),
            "local_pose_t": np.asarray(s.local_pose.translation, np.float32),
            "global_pose_q": np.asarray(s.global_pose.rotation, np.float32),
            "global_pose_t": np.asarray(s.global_pose.translation, np.float32),
        }
        if s.finished and s.high is not None:
            if self.cfg.constraint_builder.use_image_proposals:
                img = self._submap_image(submap_id)  # shared cached projection
            else:
                dense = decompress(s.high, self._hi_spec)
                img = jax.tree.map(
                    np.asarray, project_to_image(dense, self._hi_spec)
                )
            out["texture"] = np.asarray(
                np.clip(np.asarray(img.image) * 255.0, 0, 255), np.uint8
            )
            out["meters_per_pixel"] = float(img.meters_per_pixel)
        return out

    def num_inter_constraints(self) -> int:
        return sum(1 for c in self.constraints if c.tag == "INTER")

    # ----- trimming (PoseGraphTrimmer / PureLocalizationTrimmer,
    # mapping/pose_graph_trimmer.{h,cc}) -----

    def trim_to_last_submaps(self, keep: int) -> int:
        """PureLocalizationTrimmer: keep the newest `keep` unfrozen submaps'
        heavy data; older ones drop grids/images and leave loop search.
        Poses and constraints stay (the optimized trajectory is retained).
        Returns the number of submaps trimmed this call."""
        # background constraint searches hold references to submap grids;
        # nulling them mid-search would crash the worker
        self.wait_for_all_computations()
        unfrozen = [
            (sid, s) for sid, s in enumerate(self.submaps) if not s.frozen
        ]
        trimmed = 0
        if len(unfrozen) <= keep:
            return 0
        for sid, s in unfrozen[: len(unfrozen) - keep]:
            if not s.trimmed and s.finished:
                s.high = None
                s.low = None
                s.image = None
                s.trimmed = True
                with self._phase_lock:
                    self._grid_cache.pop(sid, None)
                trimmed += 1
        return trimmed
