"""Two-level brick probability grid (HybridGrid analog).

The reference's `HybridGrid` (mapping/3d/hybrid_grid.h:69-530) is a
DynamicGrid<NestedGrid<FlatGrid>> — a pointer tree of 8^3 voxel leaves that
grows to ±8192 cells, so a 0.1 m submap covers the full
`high_resolution_max_range` (60 m in dlio's basic_config_3d.lua:65). A dense
TPU grid at that range would need gigabytes; pointer chasing is hostile to
vector hardware.

TPU formulation: two flat levels.
  * directory: dense (dir_extent^3,) int32 per slot — brick coordinate ->
    pool slot (or -1). Covers ±dir_extent*brick/2 cells.
  * pool: (max_bricks * brick^3,) int16 per slot — allocated bricks' cells.
Cell address = directory[brick_lin] * brick^3 + offset. Allocation happens
INSIDE the insertion kernel: records sort by (brick, offset), brick group
heads needing a slot get consecutive ids via a cumsum off the running
counter — one pass, no host round-trip, compile-time fixed shapes. A full
pool drops further new bricks (records fall out via index clamping) — the
analog of HybridGrid's unbounded growth is a sized pool, chosen so a submap
never fills it in practice.

Spawn resets only the slot's directory + counter (the pool's stale cells
become unreachable), so recycling a slot writes ~MBs, not the pool.

Banks are FLAT 1D per array with slot offsets — scatters into reshaped or
sliced views of donated buffers copy the whole bank (see mapping/grid.py).
"""

from __future__ import annotations

import functools as _ft
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GRID_DTYPE

BRICK = 8  # cells per brick edge (FlatGrid 2^3=8, hybrid_grid.h:69)
BRICK_CELLS = BRICK * BRICK * BRICK


class BrickGridSpec(NamedTuple):
    """Static geometry. Hashable: usable as a static jit argument."""

    resolution: float
    dir_extent: int  # bricks per axis in the directory
    max_bricks: int  # pool capacity per slot
    # > 0 routes insertion through the grouped Pallas apply kernel
    # (ops/pallas_apply.py): per-insert capacity of touched pool groups.
    # 0 keeps the XLA sort+gather+scatter path.
    apply_groups: int = 0
    # bricks per kernel group (power of two; 32 -> 16 KiB blocks measured
    # fastest on v5e). max_bricks must be divisible by it.
    apply_group_bricks: int = 32

    @property
    def extent(self) -> int:
        """Covered cells per axis (signed range ±extent/2)."""
        return self.dir_extent * BRICK

    @property
    def half(self) -> int:
        return self.extent // 2

    @property
    def num_dir_cells(self) -> int:
        return self.dir_extent**3

    @property
    def num_pool_cells(self) -> int:
        return self.max_bricks * BRICK_CELLS

    @property
    def max_coverage(self) -> float:
        return self.half * self.resolution


class BrickBank(NamedTuple):
    """Two-slot active-submap bank (all arrays flat, slot-offset indexed)."""

    directory: jnp.ndarray  # (2 * num_dir_cells,) int32, -1 = unallocated
    pool: jnp.ndarray  # (2 * num_pool_cells,) int16
    counts: jnp.ndarray  # (2,) int32 allocated bricks per slot
    brick_of_slot: jnp.ndarray  # (2 * max_bricks,) int32 reverse map -> dir_lin


def make_brick_bank(spec: BrickGridSpec) -> BrickBank:
    return BrickBank(
        directory=jnp.full(2 * spec.num_dir_cells, -1, jnp.int32),
        pool=jnp.zeros(2 * spec.num_pool_cells, GRID_DTYPE),
        counts=jnp.zeros(2, jnp.int32),
        brick_of_slot=jnp.zeros(2 * spec.max_bricks, jnp.int32),
    )


def _split_cells(cells: jnp.ndarray, spec: BrickGridSpec):
    """Signed cell coords (..., 3) -> (dir_lin, offset_lin, in_bounds)."""
    shifted = cells + spec.half
    ok = jnp.all((shifted >= 0) & (shifted < spec.extent), axis=-1)
    shifted = jnp.clip(shifted, 0, spec.extent - 1)
    brick = shifted // BRICK
    off = shifted - brick * BRICK
    dir_lin = (brick[..., 0] * spec.dir_extent + brick[..., 1]) * spec.dir_extent + brick[..., 2]
    off_lin = (off[..., 0] * BRICK + off[..., 1]) * BRICK + off[..., 2]
    return dir_lin, off_lin, ok


def lookup_value_brick(
    bank: BrickBank, cells: jnp.ndarray, spec: BrickGridSpec, slot
) -> jnp.ndarray:
    """Cell value at signed cell indices; 0 (unknown) when out of range or in
    an unallocated brick. Two chained gathers (directory then pool)."""
    dir_lin, off_lin, ok = _split_cells(cells, spec)
    dir_base = slot * spec.num_dir_cells
    brick_slot = bank.directory[dir_base + dir_lin]
    has = ok & (brick_slot >= 0)
    pool_base = slot * spec.num_pool_cells
    addr = pool_base + jnp.clip(brick_slot, 0, spec.max_bricks - 1) * BRICK_CELLS + off_lin
    v = bank.pool[addr].astype(jnp.int32)
    return jnp.where(has, v, 0)


def interpolated_probability_brick(
    bank: BrickBank, points: jnp.ndarray, spec: BrickGridSpec, slot
) -> jnp.ndarray:
    """Smoothstep-trilinear probability, identical math to
    grid.interpolated_probability (InterpolatedGrid::GetProbability)."""
    from dliom_tpu.mapping.grid import _CORNERS, _corner_weights

    pr = points / spec.resolution
    lower = jnp.floor(pr)
    t = pr - lower
    s = t * t * (3.0 - 2.0 * t)
    lower = lower.astype(jnp.int32)
    # one batched (..., 8)-corner lookup: a single directory gather + a
    # single pool gather instead of 8 chained pairs
    corners = lower[..., None, :] + _CORNERS
    v = lookup_value_brick(bank, corners, spec, slot)
    q = pv.value_to_probability(v)
    return jnp.sum(q * _corner_weights(s), axis=-1)


def reset_slot(bank: BrickBank, spec: BrickGridSpec, slot) -> BrickBank:
    """Recycle a slot for a new submap: clear its directory, counter and pool
    region (re-allocated bricks must start unknown, not with a previous
    submap's cells) — the analog of dropping a HybridGrid. A sequential
    ~tens-of-MB HBM write, ~0.1 ms."""
    # elementwise masked clears, not dynamic_update_slice: under vmap the
    # latter lowers to a scatter on a (B, ·) operand (whole-bank copy)
    in_dir = (jnp.arange(bank.directory.shape[0]) // spec.num_dir_cells) == slot
    directory = jnp.where(in_dir, jnp.int32(-1), bank.directory)
    in_pool = (jnp.arange(bank.pool.shape[0]) // spec.num_pool_cells) == slot
    pool = jnp.where(in_pool, jnp.zeros((), GRID_DTYPE), bank.pool)
    return BrickBank(
        directory=directory,
        pool=pool,
        counts=bank.counts.at[slot].set(0),
        brick_of_slot=bank.brick_of_slot,  # stale entries map zeroed cells
    )


def _trunc_div(a, b):
    q = a // b
    r = a - q * b
    return q + jnp.where((r != 0) & (a < 0), 1, 0)


def _insert_brick_slots(
    bank: BrickBank,
    origins: jnp.ndarray,  # (S, 3) per-slot origins in the slot frame
    hits: jnp.ndarray,  # (S, N, 3)
    masks: jnp.ndarray,  # (S, N)
    *,
    spec: BrickGridSpec,
    hit_probability: float,
    miss_probability: float,
    num_free_space_voxels: int,
) -> BrickBank:
    """One RangeDataInserter3D step into S slots with in-kernel brick
    allocation. Semantics match ops/grid_update: every touched cell updates
    at most once, hits beating misses (range_data_inserter_3d.cc:78-92).
    S = 2 is the two active submaps; S = 2B a vmapped batch (flattened by
    the custom_vmap rule below — scatters on >1-D operands copy the bank)."""
    hit_odds = hit_probability / (1.0 - hit_probability)
    miss_odds = miss_probability / (1.0 - miss_probability)
    k = int(num_free_space_voxels)
    res = spec.resolution

    hit_cells = jnp.round(hits / res).astype(jnp.int32)
    origin_cell = jnp.round(origins / res).astype(jnp.int32)[:, None, :]
    delta = hit_cells - origin_cell
    num_samples = jnp.max(jnp.abs(delta), axis=-1)  # (2, N)

    def records(cells, valid):
        dir_lin, off_lin, ok = _split_cells(cells, spec)
        return dir_lin, off_lin, valid & ok

    d_all, o_all, v_all, m_all = [], [], [], []
    dl, ol, vv = records(hit_cells, masks)
    d_all.append(dl); o_all.append(ol); v_all.append(vv)
    m_all.append(jnp.zeros_like(dl))
    n = num_samples[..., None]
    safe_n = jnp.maximum(n, 1)
    for j in range(1, k + 1):
        pos = n - j
        cells = origin_cell + _trunc_div(delta * pos, safe_n)
        dl, ol, vv = records(cells, masks & (num_samples >= j))
        d_all.append(dl); o_all.append(ol); v_all.append(vv)
        m_all.append(jnp.ones_like(dl))

    s_count = hits.shape[0]
    slot_of = jnp.broadcast_to(
        jnp.arange(s_count, dtype=jnp.int32)[:, None], hits.shape[:2]
    )
    dir_lin = jnp.concatenate([x.reshape(-1) for x in d_all])
    off_lin = jnp.concatenate([x.reshape(-1) for x in o_all])
    valid = jnp.concatenate([x.reshape(-1) for x in v_all])
    is_miss = jnp.concatenate([x.reshape(-1) for x in m_all])
    slot = jnp.concatenate([slot_of.reshape(-1)] * (k + 1))
    num_dir_flat = s_count * spec.num_dir_cells
    num_pool_flat = s_count * spec.num_pool_cells

    # Sort records by (slot-qualified brick, offset, kind). Offsets and kind
    # pack into one 32-bit secondary key (offset < 512, kind 1 bit); the
    # primary key is the directory address, so brick groups are contiguous
    # and slot-ordered.
    dir_addr = jnp.where(valid, slot * spec.num_dir_cells + dir_lin, num_dir_flat)
    sec = off_lin * 2 + is_miss
    s_dir, s_sec = jax.lax.sort([dir_addr, sec], num_keys=2)
    s_off = s_sec >> 1
    s_miss = s_sec & 1
    m = s_dir.shape[0]
    s_valid = s_dir < num_dir_flat
    s_slot = jnp.clip(s_dir // spec.num_dir_cells, 0, s_count - 1)

    # Brick allocation: group heads of unallocated bricks claim consecutive
    # pool slots per submap-slot off the running counters. Records are
    # slot-ordered, so rank-within-slot = global exclusive prefix of `needs`
    # minus the prefix value at the slot's first record (propagated by
    # cummax — the prefix is nondecreasing).
    #
    # Every record of a group shares the same s_dir, so the gathered
    # directory value (cur_slot) is identical group-wide — only NEW slots
    # need propagation from the head, and those follow per record from the
    # `needs` cumsum: for any record of an unallocated group, the group
    # head's exclusive prefix is cumsum(needs)-1 (the head is the group's
    # first record, so it is already counted at every record of the group).
    # This replaces the head_slot[cummax(head positions)] forward-fill — an
    # M-element random gather that serialized at ~7 ns/element.
    brick_head = jnp.concatenate([jnp.ones(1, bool), s_dir[1:] != s_dir[:-1]]) & s_valid
    cur_slot = bank.directory[jnp.clip(s_dir, 0, num_dir_flat - 1)]
    needs = brick_head & (cur_slot < 0)
    needs_i = needs.astype(jnp.int32)
    incl = jnp.cumsum(needs_i)
    slot_first = jnp.concatenate([jnp.ones(1, bool), s_slot[1:] != s_slot[:-1]])
    slot_base = jax.lax.cummax(jnp.where(slot_first, incl - needs_i, 0))
    rank_in_slot = (incl - 1) - slot_base
    # counts[s_slot] as a small-table select (S is 2, or 2B batched)
    counts_sel = jnp.sum(
        jnp.where(
            s_slot[:, None] == jnp.arange(s_count, dtype=jnp.int32)[None, :],
            bank.counts[None, :],
            0,
        ),
        axis=1,
    )
    new_slot = counts_sel + rank_in_slot
    # the grouped-apply path reserves the pool's last group as the parking
    # row for unused kernel steps, so it must never be allocated
    brick_cap = spec.max_bricks - (
        spec.apply_group_bricks if spec.apply_groups > 0 else 0
    )
    unalloc = s_valid & (cur_slot < 0)
    fits = new_slot < brick_cap
    brick_slot = jnp.where(
        s_valid & (cur_slot >= 0),
        cur_slot,
        jnp.where(unalloc & fits, new_slot, -1),
    )
    alloc_ok = needs & fits

    # write new directory entries (sorted, unique heads) + the reverse map
    dir_write = jnp.where(alloc_ok, s_dir, num_dir_flat)
    directory = bank.directory.at[dir_write].set(
        jnp.where(alloc_ok, new_slot, 0), mode="drop", indices_are_sorted=True
    )
    bos_idx = jnp.where(
        alloc_ok, s_slot * spec.max_bricks + new_slot, s_count * spec.max_bricks
    )
    brick_of_slot = bank.brick_of_slot.at[bos_idx].set(
        jnp.where(alloc_ok, s_dir - s_slot * spec.num_dir_cells, 0), mode="drop"
    )
    # per-slot allocation counts: a (M, S) one-hot column reduce — TPU
    # scatter-add serializes per element, a masked reduce is one vector pass
    alloc_flag = needs & alloc_ok
    counts = bank.counts + jnp.sum(
        (
            (s_slot[:, None] == jnp.arange(s_count, dtype=jnp.int32)[None, :])
            & alloc_flag[:, None]
        ).astype(jnp.int32),
        axis=0,
    )

    writable = s_valid & (brick_slot >= 0)
    if spec.apply_groups > 0:
        # Grouped Pallas apply (ops/pallas_apply.py): re-key records by pool
        # row group; "update once, hits first" emerges from the kernel's
        # count encoding, so no per-cell dedup pass is needed here.
        from dliom_tpu.ops.pallas_apply import apply_grouped_updates, pack_keys

        gb = int(spec.apply_group_bricks)
        assert gb & (gb - 1) == 0 and spec.max_bricks % gb == 0
        cpg = gb * BRICK_CELLS
        global_slot = s_slot * spec.max_bricks + jnp.clip(
            brick_slot, 0, spec.max_bricks - 1
        )
        group = global_slot // gb
        cell = ((global_slot % gb) << 9) | s_off
        keys = pack_keys(group, cell, 1 - s_miss, writable, cpg)
        keys = jax.lax.sort(keys)
        pool = apply_grouped_updates(
            bank.pool,
            keys,
            num_groups=int(spec.apply_groups),
            cells_per_group=cpg,
            hit_odds=hit_odds,
            miss_odds=miss_odds,
            dummy_group=(s_count * spec.max_bricks) // gb - 1,
        )
        return BrickBank(
            directory=directory, pool=pool, counts=counts,
            brick_of_slot=brick_of_slot,
        )

    # update-once with hit priority: within a brick group, records sorted by
    # (offset, kind) — the first record per (brick, offset) decides.
    cell_head = jnp.concatenate(
        [jnp.ones(1, bool), (s_off[1:] != s_off[:-1]) | brick_head[1:]]
    )
    cpos = jax.lax.cummax(jnp.where(cell_head, jnp.arange(m, dtype=jnp.int32), 0))
    head_is_miss = s_miss[cpos]

    addr = (
        s_slot * spec.num_pool_cells
        + jnp.clip(brick_slot, 0, spec.max_bricks - 1) * BRICK_CELLS
        + s_off
    )
    gather_addr = jnp.where(writable, addr, 0)
    current = bank.pool[gather_addr].astype(jnp.int32)
    updated = jnp.where(
        head_is_miss == 1,
        pv.apply_odds(current, miss_odds),
        pv.apply_odds(current, hit_odds),
    )
    scatter_addr = jnp.where(writable, addr, num_pool_flat)
    pool = bank.pool.at[scatter_addr].set(updated.astype(GRID_DTYPE), mode="drop")
    return BrickBank(
        directory=directory, pool=pool, counts=counts, brick_of_slot=brick_of_slot
    )


@_ft.lru_cache(maxsize=None)
def _brick_with_batch_rule(spec: BrickGridSpec, hp: float, mp: float, k: int):
    """custom_vmap: vmapped brick inserts flatten (B, 2*...) banks into one
    (2B)-slot kernel call (scatters on >1-D operands copy the whole bank).
    Integer-valued op, no AD required."""

    @jax.custom_batching.custom_vmap
    def f(directory, pool, counts, brick_of_slot, origins, hits, masks):
        bank = BrickBank(directory, pool, counts, brick_of_slot)
        out = _insert_brick_slots(
            bank, origins, hits, masks, spec=spec,
            hit_probability=hp, miss_probability=mp, num_free_space_voxels=k,
        )
        return tuple(out)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        directory, pool, counts, brick_of_slot, origins, hits, masks = (
            bc(x, b) for x, b in zip(args, in_batched)
        )
        s = hits.shape[1]
        bank = BrickBank(
            directory.reshape(-1), pool.reshape(-1), counts.reshape(-1),
            brick_of_slot.reshape(-1),
        )
        out = _insert_brick_slots(
            bank,
            origins.reshape(axis_size * s, 3),
            hits.reshape(axis_size * s, *hits.shape[2:]),
            masks.reshape(axis_size * s, -1),
            spec=spec, hit_probability=hp, miss_probability=mp,
            num_free_space_voxels=k,
        )
        return (
            tuple(x.reshape(axis_size, -1) for x in out),
            (True, True, True, True),
        )

    return f


def insert_range_data_brick_dual(
    bank: BrickBank,
    origins: jnp.ndarray,  # (2, 3) per-slot origins in the slot frame
    hits: jnp.ndarray,  # (2, N, 3)
    masks: jnp.ndarray,  # (2, N)
    *,
    spec: BrickGridSpec,
    hit_probability: float = 0.55,
    miss_probability: float = 0.49,
    num_free_space_voxels: int = 2,
) -> BrickBank:
    """Two-active-submap brick insert (see _insert_brick_slots). vmap-safe."""
    out = _brick_with_batch_rule(
        spec, float(hit_probability), float(miss_probability),
        int(num_free_space_voxels),
    )(bank.directory, bank.pool, bank.counts, bank.brick_of_slot,
      origins, hits, masks)
    return BrickBank(*out)


def compress_brick(bank: BrickBank, spec: BrickGridSpec, slot, dense_spec, capacity: int):
    """Compress a slot's occupied cells into the backend's CompressedGrid
    representation, with indices in `dense_spec`'s (cropped, dense) linear
    space — cells beyond the crop window drop (loop-closure candidates are
    proximity-gated, so only far-field cells are lost; deviation from the
    reference's fully sparse HybridGrid::ToProto is documented here).

    One top_k over the slot's pool region + coordinate reconstruction via
    the brick_of_slot reverse map."""
    from dliom_tpu.backend.compression import CompressedGrid
    from dliom_tpu.mapping.grid import linear_index

    pool = jax.lax.dynamic_slice(
        bank.pool, (slot * spec.num_pool_cells,), (spec.num_pool_cells,)
    ).astype(jnp.int32)
    top_vals, top_addr = jax.lax.top_k(pool, capacity)
    brick_slot = top_addr // BRICK_CELLS
    off = top_addr % BRICK_CELLS
    dir_lin = bank.brick_of_slot[slot * spec.max_bricks + brick_slot]
    de = spec.dir_extent
    brick = jnp.stack(
        [dir_lin // (de * de), (dir_lin // de) % de, dir_lin % de], axis=-1
    )
    offs = jnp.stack(
        [off // (BRICK * BRICK), (off // BRICK) % BRICK, off % BRICK], axis=-1
    )
    cells = brick * BRICK + offs - spec.half  # signed cell coords
    lin, ok = linear_index(cells, dense_spec)
    valid = (top_vals > 0) & ok & (brick_slot < bank.counts[slot])
    count = jnp.sum(valid.astype(jnp.int32))
    key = jnp.where(valid, lin, dense_spec.num_cells)
    order = jnp.argsort(key)
    return CompressedGrid(
        indices=key[order],
        values=jnp.where(valid, top_vals, 0)[order].astype(GRID_DTYPE),
        count=count,
    )


def dense_crop(
    bank: BrickBank, spec: BrickGridSpec, slot: int, dense_extent: int
) -> jnp.ndarray:
    """Materialize the central ±dense_extent/2 cells as a flat dense grid —
    the backend capture window (loop-closure candidates are proximity-gated,
    so the crop loses only far-field cells; documented deviation from the
    reference's fully sparse serialization)."""
    half = dense_extent // 2
    axis = jnp.arange(dense_extent, dtype=jnp.int32) - half
    cells = jnp.stack(
        jnp.meshgrid(axis, axis, axis, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return lookup_value_brick(bank, cells, spec, slot).astype(GRID_DTYPE)
