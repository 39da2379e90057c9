"""The per-scan frontend hot loop as one compiled device step.

TPU-native counterpart of the reference's `LocalTrajectoryBuilder3D`
(`cartographer/mapping/internal/3d/local_trajectory_builder_3d.cc`): each
scan flows through

  voxel filter (half size)       AddRangeData:393
  -> per-point deskew            :408-446 (slerp of the predicted relative
                                 motion over the scan period)
  -> min/max-range clipping      :454-473 (beyond-max hits clamped to a miss)
  -> voxel filter (full size)    :477-482
  -> adaptive high/low filters   AddAccumulatedRangeData:506-534
  -> scan-to-submap GN match     :535 (vs the front submap's 2 grids)
  -> [window optimize]           :555 (IMU fusion; in `predict_only` slice
                                 mode the matched pose is taken directly)
  -> motion-filtered insertion   InsertIntoSubmap:584-622
  -> rotational histogram        :605

The whole step is a pure function (FrontendState, ScanInput) ->
(FrontendState, ScanResult): one XLA computation per scan, statically shaped,
reused for every scan. The host only feeds sensor batches and reads results.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dliom_tpu.common.config import TrajectoryBuilderConfig
from dliom_tpu.mapping import motion_filter as mf
from dliom_tpu.mapping.submap import (
    ActiveSubmaps,
    apply_pending_spawn,
    brick_spec,
    brick_spec_low,
    grid_specs,
    insert_range_data_into_submaps,
    make_active_submaps,
    mark_insertion,
    matching_slot,
    prepare_insertion,
    slot_pose,
)
from dliom_tpu.ops.scan_matcher import match
from dliom_tpu.ops.voxel_filter import (
    FilteredCloud,
    adaptive_voxel_filter,
    voxel_filter,
    voxel_filter_mask,
)
from dliom_tpu.ops.rotational_histogram import compute_histogram
from dliom_tpu.transform.rigid import Rigid3, quat_slerp


class FrontendState(NamedTuple):
    submaps: ActiveSubmaps
    pose: Rigid3  # latest optimized pose (prev_state_)
    motion_filter: mf.MotionFilterState
    scan_index: jnp.ndarray  # int32


class ScanInput(NamedTuple):
    time: jnp.ndarray  # f32 seconds (scan-end stamp)
    points: jnp.ndarray  # (N, 3) in tracking frame, scan-end convention
    times: jnp.ndarray  # (N,) per-point relative times (<= 0)
    mask: jnp.ndarray  # (N,)
    relative_prediction: Rigid3  # predicted motion since previous scan


class ScanResult(NamedTuple):
    time: jnp.ndarray
    local_pose: Rigid3  # optimized pose (MatchingResult::local_pose)
    inserted: jnp.ndarray  # bool: passed the motion filter
    finished_submap: jnp.ndarray  # submap id finished this scan, or -1
    matcher_cost: jnp.ndarray
    matcher_iterations: jnp.ndarray  # LM iterations run (Ceres summary analog)
    num_hits: jnp.ndarray  # valid accumulated returns
    histogram: jnp.ndarray  # rotational scan matcher histogram
    # TrajectoryNode::Data for the pose graph (InsertionResult)
    high_points: jnp.ndarray  # (Kh, 3) matched high-res cloud, tracking frame
    high_mask: jnp.ndarray
    low_points: jnp.ndarray  # (Kl, 3)
    low_mask: jnp.ndarray
    insertion_submap_ids: jnp.ndarray  # (2,) ids inserted into, -1 = none
    gravity_alignment: jnp.ndarray  # (4,)
    # Deferred-write mode only (parallel/batch.py): the per-slot insertion
    # tensors the flat multi-sequence writer applies outside vmap.
    insertion_batch: object = None


def make_initial_state(cfg: TrajectoryBuilderConfig) -> FrontendState:
    return FrontendState(
        submaps=make_active_submaps(cfg.submaps),
        pose=Rigid3.identity(),
        motion_filter=mf.MotionFilterState.initial(),
        scan_index=jnp.int32(0),
    )


def step(
    state: FrontendState,
    scan: ScanInput,
    cfg: TrajectoryBuilderConfig,
    fuse_fn=None,
    defer_grid_writes: bool = False,
) -> tuple[FrontendState, ScanResult]:
    """One frontend scan. Without `fuse_fn` the matched pose is the output
    (predict-only slice mode). With `fuse_fn(pose_estimate) -> (opt_pose,
    aux)` the tightly-coupled stage (WindowOptimize,
    local_trajectory_builder_3d.cc:555-557) runs between matching and
    insertion; `aux` is returned alongside the ScanResult.

    `defer_grid_writes` (static): skip all grid-bank writes (insertion AND
    spawn clears) and return the insertion tensors in the ScanResult — the
    multi-sequence driver applies them with flat kernels outside vmap, where
    scatters stay on XLA's in-place 1-D fast path (parallel/batch.py)."""
    hi_spec, lo_spec = grid_specs(cfg.submaps)
    # Execute any spawn deferred from the previous step (the finishing
    # submap's grids were kept readable through the step boundary).
    state = state._replace(
        submaps=apply_pending_spawn(
            state.submaps, cfg.submaps, defer_bank_clears=defer_grid_writes
        )
    )
    prev_pose = state.pose
    prediction = prev_pose.compose(scan.relative_prediction)

    # 1. Voxel filter at half size on the raw scan (AddRangeData:393).
    # Mask-only: downstream steps (deskew, range clip, full-size filter)
    # all operate under masking, so the compaction scatters are skipped.
    half_keep = voxel_filter_mask(
        scan.points, scan.mask, 0.5 * cfg.voxel_filter_size
    )
    half = FilteredCloud(scan.points, scan.times, half_keep)

    # 2. Deskew: per-hit pose = prev_pose * slerp(s, relative_prediction),
    #    s = (T + t_i)/T with t_i <= 0 (:430-446).
    s = jnp.clip(
        (cfg.scan_period + half.times) / cfg.scan_period, 0.0, 1.0
    )
    rel = scan.relative_prediction
    hit_rot = quat_slerp(
        jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (half.points.shape[0], 4)
        ),
        jnp.broadcast_to(rel.rotation, (half.points.shape[0], 4)),
        s,
    )
    hit_t = s[:, None] * rel.translation
    hit_poses = Rigid3(rotation=hit_rot, translation=hit_t)
    # hits in local frame
    hits_local = prev_pose.apply(hit_poses.apply(half.points))
    origins_local = prev_pose.apply(hit_poses.apply(jnp.zeros_like(half.points)))

    # 3. Range clipping (:454-473). Beyond-max returns become misses
    #    (tracked but, as in the reference 3D inserter, never rasterized).
    delta = hits_local - origins_local
    rng = jnp.linalg.norm(delta, axis=-1)
    ok_min = rng >= cfg.min_range
    in_range = half.mask & ok_min & (rng <= cfg.max_range)

    # 4. Voxel filter at full size -> filtered range data in local frame
    #    (:477-482); origin = current (scan-end) position.
    filtered = voxel_filter(
        hits_local, half.times, in_range, cfg.voxel_filter_size,
        out_capacity=cfg.max_filtered_points,
    )
    current_origin = prediction.translation

    # 5. To tracking frame; adaptive filters (AddAccumulatedRangeData:506-534).
    filtered_tracking = prediction.inverse().apply(filtered.points)
    high = adaptive_voxel_filter(
        filtered_tracking,
        filtered.times,
        filtered.mask,
        max_length=cfg.high_resolution_adaptive_voxel_filter.max_length,
        min_num_points=cfg.high_resolution_adaptive_voxel_filter.min_num_points,
        max_range=cfg.high_resolution_adaptive_voxel_filter.max_range,
        out_capacity=cfg.max_high_res_points,
    )
    low = adaptive_voxel_filter(
        filtered_tracking,
        filtered.times,
        filtered.mask,
        max_length=cfg.low_resolution_adaptive_voxel_filter.max_length,
        min_num_points=cfg.low_resolution_adaptive_voxel_filter.min_num_points,
        max_range=cfg.low_resolution_adaptive_voxel_filter.max_range,
        out_capacity=cfg.max_low_res_points,
    )

    # 6. Scan-to-submap match against the front submap (:535-556).
    mslot = matching_slot(state.submaps)
    submap_pose = slot_pose(state.submaps, mslot)
    initial_in_submap = submap_pose.inverse().compose(prediction)
    if cfg.use_online_correlative_scan_matching:
        # exhaustive local pre-search seeding the Ceres matcher (:514-520)
        from dliom_tpu.ops.real_time_correlative import match as rtc_match

        rtc_cfg = cfg.real_time_correlative_scan_matcher
        rtc = rtc_match(
            initial_in_submap,
            high.points,
            high.mask,
            state.submaps.high_brick
            if cfg.submaps.use_brick_grid
            else state.submaps.high_values,
            brick_spec(cfg.submaps) if cfg.submaps.use_brick_grid else hi_spec,
            linear_search_window=rtc_cfg.linear_search_window,
            angular_search_window=rtc_cfg.angular_search_window,
            translation_delta_cost_weight=rtc_cfg.translation_delta_cost_weight,
            rotation_delta_cost_weight=rtc_cfg.rotation_delta_cost_weight,
            max_scan_range=cfg.max_range,
            max_angular_steps=rtc_cfg.max_angular_steps,
            base=(2 * state.submaps.lane + mslot)
            if cfg.submaps.use_brick_grid
            else (2 * state.submaps.lane + mslot) * hi_spec.num_cells,
        )
        initial_in_submap = rtc.pose
    result = match(
        initial_in_submap,
        clouds=[(high.points, high.mask), (low.points, low.mask)],
        grids=[
            state.submaps.high_brick
            if cfg.submaps.use_brick_grid
            else state.submaps.high_values,
            state.submaps.low_brick
            if cfg.submaps.use_brick_grid_low
            else state.submaps.low_values,
        ],
        grid_bases=[
            # lane-adjusted: sequence `lane` owns bank slots 2*lane + {0, 1}
            (2 * state.submaps.lane + mslot)
            if cfg.submaps.use_brick_grid
            else (2 * state.submaps.lane + mslot) * hi_spec.num_cells,
            (2 * state.submaps.lane + mslot)
            if cfg.submaps.use_brick_grid_low
            else (2 * state.submaps.lane + mslot) * lo_spec.num_cells,
        ],
        specs=[
            brick_spec(cfg.submaps) if cfg.submaps.use_brick_grid else hi_spec,
            brick_spec_low(cfg.submaps)
            if cfg.submaps.use_brick_grid_low
            else lo_spec,
        ],
        occupied_space_weights=[
            cfg.ceres_scan_matcher.occupied_space_weight_0,
            cfg.ceres_scan_matcher.occupied_space_weight_1,
        ],
        translation_weight=cfg.ceres_scan_matcher.translation_weight,
        rotation_weight=cfg.ceres_scan_matcher.rotation_weight,
        only_optimize_yaw=cfg.ceres_scan_matcher.only_optimize_yaw,
        max_iterations=cfg.ceres_scan_matcher.max_num_iterations,
        function_tolerance=cfg.ceres_scan_matcher.function_tolerance,
    )
    pose_estimate = submap_pose.compose(result.pose)

    # 7. Fusion stage: either pass the matched pose through (slice mode) or
    #    run the tightly-coupled window optimizer via fuse_fn.
    if fuse_fn is None:
        opt_pose, fuse_aux = pose_estimate, None
    else:
        opt_pose, fuse_aux = fuse_fn(pose_estimate)
    gravity_alignment = opt_pose.rotation

    # Re-express the filtered cloud under the optimized pose (the reference
    # transforms filtered_range_data_in_tracking by opt_pose, :559-561).
    filtered_in_opt = opt_pose.apply(prediction.inverse().apply(filtered.points))
    origin_in_opt = opt_pose.translation

    # 8. Motion filter gate + insertion (InsertIntoSubmap:593-609). An
    # empty (fully masked-out) scan must not touch the filter state — the
    # reference drops empty range data before the filter
    # (AddAccumulatedRangeData:497-500); advancing last_pose/last_time on a
    # phantom scan would wrongly motion-filter the NEXT real scan.
    has_points = jnp.sum(filtered.mask) > 0
    similar, mf_candidate = mf.is_similar(
        state.motion_filter,
        scan.time,
        opt_pose,
        max_time_seconds=cfg.motion_filter.max_time_seconds,
        max_distance_meters=cfg.motion_filter.max_distance_meters,
        max_angle_radians=cfg.motion_filter.max_angle_radians,
    )
    new_mf = jax.tree.map(
        lambda a, b: jnp.where(has_points, a, b),
        mf_candidate,
        state.motion_filter,
    )
    insert = (~similar) & has_points
    if defer_grid_writes:
        insertion_batch = prepare_insertion(
            state.submaps, origin_in_opt, filtered_in_opt, filtered.mask,
            cfg.submaps, insert,
        )
        new_submaps, finished = mark_insertion(
            state.submaps, gravity_alignment, origin_in_opt, cfg.submaps, insert
        )
    else:
        insertion_batch = None
        new_submaps, finished = insert_range_data_into_submaps(
            state.submaps,
            origin_in_opt,
            filtered_in_opt,
            filtered.mask,
            gravity_alignment,
            cfg.submaps,
            insert,
        )

    # 9. Rotational histogram of the gravity-aligned scan (:604-608).
    hist = compute_histogram(
        Rigid3.rotation_only(gravity_alignment).apply(
            prediction.inverse().apply(filtered.points)
        ),
        filtered.mask,
        num_buckets=cfg.rotational_histogram_size,
    )

    new_state = FrontendState(
        submaps=new_submaps,
        pose=opt_pose,
        motion_filter=new_mf,
        scan_index=state.scan_index + 1,
    )
    nc = new_submaps.num_created
    insertion_ids = jnp.stack(
        [jnp.where(nc >= 2, nc - 2, -1), nc - 1]
    ).astype(jnp.int32)
    result_out = ScanResult(
        time=scan.time,
        local_pose=opt_pose,
        inserted=insert,
        finished_submap=finished,
        matcher_cost=result.cost,
        matcher_iterations=result.iterations,
        num_hits=jnp.sum(filtered.mask.astype(jnp.int32)),
        histogram=hist,
        high_points=high.points,
        high_mask=high.mask,
        low_points=low.points,
        low_mask=low.mask,
        insertion_submap_ids=insertion_ids,
        gravity_alignment=gravity_alignment,
        insertion_batch=insertion_batch,
    )
    if fuse_fn is None:
        return new_state, result_out
    return new_state, (result_out, fuse_aux)


def run_sequence(
    initial_state: FrontendState,
    scans: ScanInput,  # leading axis = scan index
    cfg: TrajectoryBuilderConfig,
):
    """lax.scan over a whole sequence (the bench/batch path)."""

    def body(state, scan):
        return step(state, scan, cfg)

    return jax.lax.scan(body, initial_state, scans)
