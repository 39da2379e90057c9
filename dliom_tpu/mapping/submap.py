"""Submap3D / ActiveSubmaps3D as a fixed-two-slot device pytree.

Counterpart of the reference's `cartographer/mapping/3d/submap_3d.{h,cc}`:

  * each submap owns a high- and a low-resolution probability grid in its own
    frame (`local_pose().inverse()` applied at insertion, submap_3d.cc:270);
  * the high-res grid only receives returns within `high_resolution_max_range`
    of the (submap-frame) origin (:272-276);
  * every scan is inserted into both active submaps (:303-309);
  * when the back submap reaches `num_range_data` scans, a new submap spawns
    at the current origin with a gravity-aligned rotation, and the front
    submap is finished and dropped (:310-326);
  * the *front* (older) submap is the matching target.

TPU-native twist: the two active submaps live in two fixed grid slots.
Submap k occupies slot k % 2, so spawning submap k+1 overwrites the slot of
the just-finished submap k-1 — no slot-to-slot copying, and the matching slot
is always (newest_id - 1) % 2 once two submaps exist. Spawn (a full grid
reset) runs under `lax.cond` so non-spawn scans skip the write.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from typing import Optional

from dliom_tpu.common.config import SubmapsConfig
from dliom_tpu.mapping.brick_grid import (
    BrickBank,
    BrickGridSpec,
    _insert_brick_slots,
    make_brick_bank,
    reset_slot,
)
from dliom_tpu.mapping.grid import GRID_DTYPE, GridSpec
from dliom_tpu.ops.grid_update import _insert_slots
from dliom_tpu.transform.rigid import Rigid3


class ActiveSubmaps(NamedTuple):
    """Two grid slots + per-slot metadata. Slot layout: submap id k -> slot
    k % 2. `num_created` counts submaps ever spawned; slots hold submaps
    num_created-2 (front/matching, finished on next spawn) and num_created-1
    (back) once num_created >= 2."""

    high_values: jnp.ndarray  # (2 * high_extent^3,) int16 flat bank
    low_values: jnp.ndarray  # (2 * low_extent^3,) int16 flat bank
    pose_rotation: jnp.ndarray  # (2, 4) local_pose quaternion per slot
    pose_translation: jnp.ndarray  # (2, 3)
    num_range_data: jnp.ndarray  # (2,) int32
    num_created: jnp.ndarray  # () int32
    # Spawn is deferred to the start of the NEXT step so the finishing
    # submap's grids stay readable for backend capture (identical lifecycle
    # timing: the new submap's first inserted scan is unchanged).
    pending_spawn: jnp.ndarray  # () bool
    pending_rotation: jnp.ndarray  # (4,)
    pending_translation: jnp.ndarray  # (3,)
    # Brick-grid high-res path (cfg.use_brick_grid): replaces high_values,
    # honoring high_resolution_max_range at fine resolutions (HybridGrid
    # analog, see mapping/brick_grid.py). None on the dense path.
    high_brick: Optional[BrickBank] = None
    # Lane index into a shared multi-sequence bank (parallel/batch.py):
    # sequence b owns bank slots (2*lane, 2*lane + 1). 0 for single-sequence
    # states, whose banks hold exactly 2 slots.
    lane: jnp.ndarray = None
    # Brick-grid low-res path (cfg.use_brick_grid_low): replaces low_values
    # for full max-range low-resolution coverage. None on the dense path.
    low_brick: Optional[BrickBank] = None
    # Dense grouped-apply drop counter, (1,) int32: touched groups lost to
    # an undersized dense_apply_groups capacity accumulate here (the dense
    # analog of BrickBank.dropped — no silent truncation on either path).
    # Shared bank-level state: lanes of a batched state aggregate into it.
    dense_dropped: jnp.ndarray = None


def grid_specs(cfg: SubmapsConfig) -> Tuple[GridSpec, GridSpec]:
    return (
        GridSpec(
            cfg.high_resolution,
            cfg.high_resolution_extent,
            # the brick path handles high-res insertion; its dense spec is
            # only the backend capture crop (no insert -> no padding)
            0 if cfg.use_brick_grid else cfg.dense_apply_groups,
        ),
        GridSpec(cfg.low_resolution, cfg.low_resolution_extent,
                 # brick path: the dense spec is only the capture crop
                 0 if cfg.use_brick_grid_low else cfg.dense_apply_groups),
    )


def brick_spec(cfg: SubmapsConfig) -> BrickGridSpec:
    return BrickGridSpec(
        resolution=cfg.high_resolution,
        dir_extent=cfg.brick_dir_extent,
        max_bricks=cfg.brick_max_bricks,
        apply_groups=cfg.brick_apply_groups,
        apply_group_bricks=cfg.brick_apply_group_bricks,
    )


def brick_spec_low(cfg: SubmapsConfig) -> BrickGridSpec:
    return BrickGridSpec(
        resolution=cfg.low_resolution,
        dir_extent=cfg.low_brick_dir_extent,
        max_bricks=cfg.low_brick_max_bricks,
        apply_groups=cfg.low_brick_apply_groups,
        apply_group_bricks=cfg.low_brick_apply_group_bricks,
    )


def make_active_submaps(cfg: SubmapsConfig) -> ActiveSubmaps:
    """Initial state: one submap at identity (ActiveSubmaps3D ctor,
    submap_3d.cc:286-295)."""
    from dliom_tpu.ops.pallas_apply import dense_bank_size

    hi, lo = grid_specs(cfg)
    q = jnp.zeros((2, 4), jnp.float32).at[:, 0].set(1.0)
    return ActiveSubmaps(
        high_values=(
            jnp.zeros(0, GRID_DTYPE)
            if cfg.use_brick_grid
            else jnp.zeros(
                dense_bank_size(hi.num_cells, 2, hi.apply_groups), GRID_DTYPE
            )
        ),
        high_brick=make_brick_bank(brick_spec(cfg)) if cfg.use_brick_grid else None,
        low_brick=(
            make_brick_bank(brick_spec_low(cfg))
            if cfg.use_brick_grid_low
            else None
        ),
        low_values=(
            jnp.zeros(0, GRID_DTYPE)
            if cfg.use_brick_grid_low
            else jnp.zeros(
                dense_bank_size(lo.num_cells, 2, lo.apply_groups), GRID_DTYPE
            )
        ),
        pose_rotation=q,
        pose_translation=jnp.zeros((2, 3), jnp.float32),
        num_range_data=jnp.zeros(2, jnp.int32),
        num_created=jnp.int32(1),
        pending_spawn=jnp.bool_(False),
        pending_rotation=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        pending_translation=jnp.zeros(3, jnp.float32),
        lane=jnp.int32(0),
        dense_dropped=jnp.zeros(1, jnp.int32),
    )


def matching_slot(state: ActiveSubmaps) -> jnp.ndarray:
    """Slot index of the front (older, matching) submap."""
    front_id = jnp.maximum(state.num_created - 2, 0)
    return jnp.where(state.num_created >= 2, front_id % 2, (state.num_created - 1) % 2)


def back_slot(state: ActiveSubmaps) -> jnp.ndarray:
    return (state.num_created - 1) % 2


def slot_pose(state: ActiveSubmaps, slot) -> Rigid3:
    return Rigid3(state.pose_rotation[slot], state.pose_translation[slot])


class InsertionBatch(NamedTuple):
    """Per-slot transformed insertion tensors — consumed either immediately
    (single-sequence path) or by the flat multi-sequence writer
    (parallel/batch.py), where bank writes must happen OUTSIDE vmap."""

    origins: jnp.ndarray  # (2, 3)
    points: jnp.ndarray  # (2, N, 3)
    masks: jnp.ndarray  # (2, N) low-res / full-range validity
    hi_masks: jnp.ndarray  # (2, N) + high_resolution_max_range crop


def prepare_insertion(
    state: ActiveSubmaps,
    origin_in_local: jnp.ndarray,
    returns_in_local: jnp.ndarray,
    returns_mask: jnp.ndarray,
    cfg: SubmapsConfig,
    enabled: jnp.ndarray,
) -> InsertionBatch:
    """Transform the scan into both slot frames + build the per-slot gates
    (the read-only half of ActiveSubmaps3D::InsertRangeData)."""
    poses = Rigid3(state.pose_rotation, state.pose_translation)
    inv = poses.inverse()
    pts2 = jax.vmap(lambda r, t, p: Rigid3(r, t).apply(p), in_axes=(0, 0, None))(
        inv.rotation, inv.translation, returns_in_local
    )  # (2, N, 3)
    org2 = jax.vmap(lambda r, t: Rigid3(r, t).apply(origin_in_local))(
        inv.rotation, inv.translation
    )  # (2, 3)
    slot_ids = jnp.arange(2)
    slot_active = jnp.where(
        state.num_created >= 2,
        jnp.ones(2, bool),
        slot_ids == (state.num_created - 1) % 2,
    )
    use = slot_active & enabled  # (2,)
    masks2 = returns_mask[None, :] & use[:, None]
    hi_masks = masks2 & (
        jnp.linalg.norm(pts2 - org2[:, None, :], axis=-1)
        <= cfg.high_resolution_max_range
    )
    return InsertionBatch(origins=org2, points=pts2, masks=masks2, hi_masks=hi_masks)


def mark_insertion(
    state: ActiveSubmaps,
    gravity_alignment: jnp.ndarray,
    origin_in_local: jnp.ndarray,
    cfg: SubmapsConfig,
    enabled: jnp.ndarray,
) -> Tuple[ActiveSubmaps, jnp.ndarray]:
    """Post-insert bookkeeping: count the scan per active slot and mark a
    pending spawn when the back submap fills (submap_3d.cc:310-315)."""
    slot_ids = jnp.arange(2)
    slot_active = jnp.where(
        state.num_created >= 2,
        jnp.ones(2, bool),
        slot_ids == (state.num_created - 1) % 2,
    )
    use = slot_active & enabled
    state = state._replace(
        num_range_data=state.num_range_data + use.astype(jnp.int32)
    )
    bslot = back_slot(state)
    spawn = enabled & (state.num_range_data[bslot] >= cfg.num_range_data) & (
        ~state.pending_spawn
    )
    finished = jnp.where(
        spawn & (state.num_created >= 2), state.num_created - 2, -1
    )
    state = state._replace(
        pending_spawn=state.pending_spawn | spawn,
        pending_rotation=jnp.where(
            spawn, gravity_alignment, state.pending_rotation
        ),
        pending_translation=jnp.where(
            spawn, origin_in_local, state.pending_translation
        ),
    )
    return state, finished


def insert_range_data_into_submaps(
    state: ActiveSubmaps,
    origin_in_local: jnp.ndarray,
    returns_in_local: jnp.ndarray,
    returns_mask: jnp.ndarray,
    gravity_alignment: jnp.ndarray,
    cfg: SubmapsConfig,
    enabled: jnp.ndarray,
) -> Tuple[ActiveSubmaps, jnp.ndarray]:
    """One ActiveSubmaps3D::InsertRangeData step (submap_3d.cc:303-315).

    `enabled` gates the whole operation (motion-filtered scans still flow
    through the compiled graph with no-op updates). Returns (state, finished):
    `finished` is the submap id finished by a spawn this step, or -1.
    """
    batch = prepare_insertion(
        state, origin_in_local, returns_in_local, returns_mask, cfg, enabled
    )
    state = state._replace(
        **write_insertion_batch(
            state.high_values, state.low_values, state.high_brick, batch, cfg,
            low_brick=state.low_brick, dense_dropped=state.dense_dropped,
        )
    )
    # Spawn marking happens afterwards (the spawn itself executes at the
    # start of the NEXT step in apply_pending_spawn, so the finishing
    # submap's grids remain readable until then).
    return mark_insertion(state, gravity_alignment, origin_in_local, cfg, enabled)


def write_insertion_batch(
    high_values: jnp.ndarray,
    low_values: jnp.ndarray,
    high_brick: Optional[BrickBank],
    batch: InsertionBatch,
    cfg: SubmapsConfig,
    low_brick: Optional[BrickBank] = None,
    dense_dropped: Optional[jnp.ndarray] = None,
) -> dict:
    """Apply an InsertionBatch to the grid banks. `batch` may hold 2 slots
    (single sequence) or 2*B slots flattened from B sequences — the flat
    kernels handle any slot count with one sort/gather/scatter.
    `dense_dropped`: the running (1,) drop counter; dense grouped-apply
    overflow drops accumulate into it (brick drops live in the banks)."""
    hi, lo = grid_specs(cfg)
    ins = cfg.range_data_inserter
    drop_inc = jnp.int32(0)
    if cfg.use_brick_grid:
        new_brick = _insert_brick_slots(
            high_brick, batch.origins, batch.points, batch.hi_masks,
            spec=brick_spec(cfg),
            hit_probability=ins.hit_probability,
            miss_probability=ins.miss_probability,
            num_free_space_voxels=ins.num_free_space_voxels,
        )
        new_high = high_values
    else:
        new_brick = high_brick
        new_high, d = _insert_slots(
            high_values, batch.origins, batch.points, batch.hi_masks, spec=hi,
            hit_probability=ins.hit_probability,
            miss_probability=ins.miss_probability,
            num_free_space_voxels=ins.num_free_space_voxels,
        )
        drop_inc = drop_inc + d
    if cfg.use_brick_grid_low:
        new_low_brick = _insert_brick_slots(
            low_brick, batch.origins, batch.points, batch.masks,
            spec=brick_spec_low(cfg),
            hit_probability=ins.hit_probability,
            miss_probability=ins.miss_probability,
            num_free_space_voxels=ins.num_free_space_voxels,
        )
        new_low = low_values
    else:
        new_low_brick = low_brick
        new_low, d = _insert_slots(
            low_values, batch.origins, batch.points, batch.masks, spec=lo,
            hit_probability=ins.hit_probability,
            miss_probability=ins.miss_probability,
            num_free_space_voxels=ins.num_free_space_voxels,
        )
        drop_inc = drop_inc + d
    out = dict(
        high_values=new_high, high_brick=new_brick,
        low_values=new_low, low_brick=new_low_brick,
    )
    if dense_dropped is not None:
        # aggregate in element 0 (the (batch,) shape exists only to keep the
        # counter mesh-shardable; see parallel/batch.py)
        out["dense_dropped"] = dense_dropped.at[0].add(drop_inc)
    return out


def apply_pending_spawn(
    state: ActiveSubmaps, cfg: SubmapsConfig, defer_bank_clears: bool = False
) -> ActiveSubmaps:
    """Execute a deferred AddSubmap (submap_3d.cc:318-326): reset the
    finished submap's slot for the new submap. Call at the start of a step,
    before matching. With `defer_bank_clears` only the small per-slot state
    updates run — the multi-sequence driver clears the shared banks outside
    vmap (parallel/batch.py clear_spawned_slots).

    Everything is MASKED arithmetic on `pending`, never a lax.cond: a
    conditional whose branches return modified vs pass-through bank buffers
    makes XLA copy the banks on the untaken path — ~400 us/scan measured
    for a spawn that fires once per num_range_data scans."""
    hi, lo = grid_specs(cfg)
    s = state
    pending = s.pending_spawn
    new_slot = s.num_created % 2

    high_values = s.high_values
    if not (cfg.use_brick_grid or defer_bank_clears):
        high_values = jnp.where(
            ((jnp.arange(s.high_values.shape[0]) // hi.num_cells) == new_slot)
            & pending,
            jnp.zeros((), GRID_DTYPE),
            s.high_values,
        )
    high_brick = s.high_brick
    if cfg.use_brick_grid and not defer_bank_clears:
        high_brick = reset_slot(s.high_brick, brick_spec(cfg), new_slot, pending)
    low_values = s.low_values
    if not (cfg.use_brick_grid_low or defer_bank_clears):
        low_values = jnp.where(
            ((jnp.arange(s.low_values.shape[0]) // lo.num_cells) == new_slot)
            & pending,
            jnp.zeros((), GRID_DTYPE),
            s.low_values,
        )
    low_brick = s.low_brick
    if cfg.use_brick_grid_low and not defer_bank_clears:
        low_brick = reset_slot(s.low_brick, brick_spec_low(cfg), new_slot, pending)
    return s._replace(
        high_values=high_values,
        high_brick=high_brick,
        low_values=low_values,
        low_brick=low_brick,
        pose_rotation=s.pose_rotation.at[new_slot].set(
            jnp.where(pending, s.pending_rotation, s.pose_rotation[new_slot])
        ),
        pose_translation=s.pose_translation.at[new_slot].set(
            jnp.where(
                pending, s.pending_translation, s.pose_translation[new_slot]
            )
        ),
        num_range_data=s.num_range_data.at[new_slot].set(
            jnp.where(pending, 0, s.num_range_data[new_slot])
        ),
        num_created=s.num_created + pending.astype(jnp.int32),
        # pending IS s.pending_spawn, so the flag always clears
        pending_spawn=jnp.bool_(False),
    )
