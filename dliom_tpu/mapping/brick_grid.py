"""Two-level brick probability grid (HybridGrid analog).

The reference's `HybridGrid` (mapping/3d/hybrid_grid.h:69-530) is a
DynamicGrid<NestedGrid<FlatGrid>> — a pointer tree of 8^3 voxel leaves that
grows to ±8192 cells, so a 0.1 m submap covers the full
`high_resolution_max_range` (60 m in dlio's basic_config_3d.lua:65). A dense
TPU grid at that range would need gigabytes; pointer chasing is hostile to
vector hardware.

TPU formulation: two flat levels with GROUP-granular allocation.
  * directory: dense (2^(3*morton_bits) / alloc_bricks,) int32 per slot —
    Morton-coded brick *group* (a 4x4x2-brick spatial chunk for the default
    32-brick groups) -> pool group (or -1). Covers ±dir_extent*brick/2
    cells.
  * pool: (max_bricks * brick^3,) int16 per slot — allocated groups' cells.
Cell address = directory[morton(brick)/G] * (G*brick^3) + in-group offset.

Allocating whole spatially-compact groups (instead of single 8^3 bricks)
means the per-record work of an insert never touches the directory: records
sort by (group, cell), the kernel's per-step group tables (ops/
pallas_apply.py) are built by one-hot matmuls, and the directory
gather/alloc/scatter runs at GRID-STEP granularity (~1k elements) instead
of per record (~49k serialized gather+2 scatters — measured ~850 us/scan).
The cost is memory slack: a touched group allocates all 32 bricks
(~4.5x waste measured on scan data) — pool capacity is sized accordingly.
A full pool drops new groups whole. Spawn resets only the slot's directory
+ counter (the pool's stale cells become unreachable).

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
    max_bricks: int  # pool capacity per slot (in bricks)
    # > 0 routes insertion through the grouped Pallas apply kernel
    # (ops/pallas_apply.py): per-insert capacity of touched pool groups.
    # 0 keeps the XLA sort+gather+scatter path.
    apply_groups: int = 0
    # bricks per allocation/kernel group (power of two; 32 -> 16 KiB blocks
    # measured fastest on v5e). max_bricks must be divisible by it.
    apply_group_bricks: int = 32

    @property
    def extent(self) -> int:
        """Covered cells per axis (signed range ±extent/2)."""
        return self.dir_extent * BRICK

    @property
    def half(self) -> int:
        return self.extent // 2

    @property
    def morton_bits(self) -> int:
        """Bits per axis of the brick Morton code (dir_extent padded up)."""
        # part1by2 spreads 10 bits/axis; beyond that, bricks would silently
        # alias onto the same Morton code
        assert self.dir_extent <= 1024, "dir_extent > 1024 exceeds Morton range"
        return max(1, int(self.dir_extent - 1).bit_length())

    @property
    def alloc_bricks(self) -> int:
        """Bricks per allocation group (= kernel group when Pallas is on)."""
        g = min(self.apply_group_bricks, self.max_bricks)
        assert g & (g - 1) == 0 and self.max_bricks % g == 0
        assert self.apply_groups == 0 or g == self.apply_group_bricks
        return g

    @property
    def cells_per_group(self) -> int:
        return self.alloc_bricks * BRICK_CELLS

    @property
    def num_dir_groups(self) -> int:
        """Directory entries per slot (dense over padded Morton space)."""
        return (1 << (3 * self.morton_bits)) // self.alloc_bricks

    @property
    def num_pool_groups(self) -> int:
        return self.max_bricks // self.alloc_bricks

    @property
    def pg_bits(self) -> int:
        """Bits of a directory entry holding the pool-group id; the
        remaining high bits carry the slot's spawn EPOCH (see reset_slot)."""
        return max(1, int(self.num_pool_groups - 1).bit_length())

    @property
    def epoch_mask(self) -> int:
        """Largest storable slot epoch. Directory entries pack
        `(epoch << pg_bits) | pool_group` into a NON-NEGATIVE int32, so
        epochs live in [0, 2^(31-pg_bits)); reset_slot wraps the epoch
        through this mask (an unmasked bump would eventually set the sign
        bit, making every entry decode as unallocated forever) and
        incrementally sweeps stale entries so the wrap can never
        false-validate an old never-rewritten entry either."""
        return (1 << (31 - self.pg_bits)) - 1

    @property
    def sweep_per_reset(self) -> int:
        """Directory entries of the recycled slot cleared per reset_slot.
        Clearing K consecutive entries at a rotating offset `epoch*K mod
        num_dir_groups` rewrites every entry of the slot at least once per
        epoch-wrap period of `epoch_mask+1` resets (the cleared integer
        range over one period is contiguous of length K*(epoch_mask+1) >=
        num_dir_groups, hence surjective mod num_dir_groups) — so an entry
        tagged with epoch e is always cleared before the masked epoch
        returns to e. Usually 1."""
        return -(-self.num_dir_groups // (self.epoch_mask + 1))  # ceil

    @property
    def num_pool_cells(self) -> int:
        return self.max_bricks * BRICK_CELLS

    @property
    def max_coverage(self) -> float:
        return self.half * self.resolution


class BrickBank(NamedTuple):
    """Two-slot active-submap bank (all arrays flat, slot-offset indexed).

    Directory entries are EPOCH-TAGGED: a non-negative entry is
    `(epoch << spec.pg_bits) | pool_group`, valid only while `epoch` equals
    the slot's current `epochs[slot]`. Spawning a submap then recycles a
    slot by bumping its epoch — O(1) — instead of scattering -1 over every
    allocated entry (a per-index-serialized ~num_pool_groups scatter that
    ran EVERY step under the masked-reset discipline; measured ~6% of the
    batched step). Entries from earlier epochs read as unallocated.
    -1 = never allocated."""

    directory: jnp.ndarray  # (2 * num_dir_groups,) int32 epoch-tagged entry
    pool: jnp.ndarray  # (2 * num_pool_cells,) int16
    counts: jnp.ndarray  # (2,) int32 allocated groups per slot
    group_of_slot: jnp.ndarray  # (2 * num_pool_groups,) int32 pool group -> dir group
    # running count of groups whose updates were DROPPED (touched groups
    # beyond apply_groups per insert, or pool-full allocation failures).
    # Nonzero means the capacity model is undersized for the data — no
    # silent truncation (exposed as the `brick_groups_dropped` gauge).
    dropped: jnp.ndarray
    # (2,) int32 per-slot spawn epoch, wrapped through spec.epoch_mask
    # (31 - pg_bits bits; 2^20 at 2048 pool groups). The wrap is HARMLESS:
    # reset_slot clears spec.sweep_per_reset rotating directory entries per
    # reset, rewriting every entry of the slot at least once per wrap
    # period, so a stale entry can never false-validate against a wrapped
    # epoch and encoding never overflows into the int32 sign bit.
    epochs: jnp.ndarray


def make_brick_bank(spec: BrickGridSpec) -> BrickBank:
    return BrickBank(
        directory=jnp.full(2 * spec.num_dir_groups, -1, jnp.int32),
        pool=jnp.zeros(2 * spec.num_pool_cells, GRID_DTYPE),
        counts=jnp.zeros(2, jnp.int32),
        group_of_slot=jnp.zeros(2 * spec.num_pool_groups, jnp.int32),
        dropped=jnp.zeros(1, jnp.int32),
        epochs=jnp.zeros(2, jnp.int32),
    )


def _decode_dir(raw: jnp.ndarray, epoch: jnp.ndarray, spec: BrickGridSpec):
    """Epoch-tagged entry -> (pool group, currently-allocated?)."""
    ok = (raw >= 0) & ((raw >> spec.pg_bits) == epoch)
    return raw & ((1 << spec.pg_bits) - 1), ok


def _encode_dir(pg: jnp.ndarray, epoch: jnp.ndarray, spec: BrickGridSpec):
    return (epoch << spec.pg_bits) | pg


def _morton_brick(brick: jnp.ndarray) -> jnp.ndarray:
    """Unsigned brick coords (..., 3) -> Morton code (bit spreading from
    ops/morton.py). Low bits interleave x,y,z, so code//32 chunks are
    compact 4x4x2-brick spatial blocks."""
    from dliom_tpu.ops.morton import part1by2

    return (
        part1by2(brick[..., 0])
        | (part1by2(brick[..., 1]) << 1)
        | (part1by2(brick[..., 2]) << 2)
    )


def _demorton_brick(code: jnp.ndarray) -> jnp.ndarray:
    from dliom_tpu.ops.morton import compact1by2

    return jnp.stack(
        [compact1by2(code), compact1by2(code >> 1), compact1by2(code >> 2)],
        axis=-1,
    )


def _split_cells(cells: jnp.ndarray, spec: BrickGridSpec):
    """Signed cell coords (..., 3) -> (dir_group, cell_in_group, in_bounds)."""
    shifted = cells + spec.half
    ok = jnp.all((shifted >= 0) & (shifted < spec.extent), axis=-1)
    shifted = jnp.clip(shifted, 0, spec.extent - 1)
    brick = shifted // BRICK
    off = shifted - brick * BRICK
    mcode = _morton_brick(brick)
    off_lin = (off[..., 0] * BRICK + off[..., 1]) * BRICK + off[..., 2]
    ab = spec.alloc_bricks
    group = mcode // ab
    cig = (mcode % ab) * BRICK_CELLS + off_lin
    return group, cig, ok


def lookup_value_brick(
    bank: BrickBank, cells: jnp.ndarray, spec: BrickGridSpec, slot
) -> jnp.ndarray:
    """Cell value at signed cell indices; 0 (unknown) when out of range or in
    an unallocated group. Two chained gathers (directory then pool)."""
    group, cig, ok = _split_cells(cells, spec)
    dir_base = slot * spec.num_dir_groups
    raw = bank.directory[dir_base + group]
    pg, cur = _decode_dir(raw, bank.epochs[slot], spec)
    has = ok & cur
    pool_base = slot * spec.num_pool_cells
    addr = (
        pool_base
        + jnp.clip(pg, 0, spec.num_pool_groups - 1) * spec.cells_per_group
        + cig
    )
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


def reset_slot(
    bank: BrickBank, spec: BrickGridSpec, slot, pending=True
) -> BrickBank:
    """Recycle a slot for a new submap — the analog of dropping a HybridGrid.
    `pending` (traced bool) gates the reset arithmetically: conditional
    branches over the big banks make XLA copy them every step, masked ops
    don't.

    Grouped-apply configs reset in O(1): bump the slot's epoch, which
    invalidates every directory entry tagged with the old epoch (see
    BrickBank). The pool's stale cells become unreachable, and the insert
    kernel zero-fills a group's whole block when it is (re-)allocated
    (`fresh`, ops/pallas_apply.py). The XLA fallback path writes only
    record cells, so there the pool region is cleared for real."""
    pending = jnp.asarray(pending)
    counts = bank.counts.at[slot].set(
        jnp.where(pending, 0, bank.counts[slot])
    )
    if spec.apply_groups > 0:
        old_epoch = bank.epochs[slot]
        # wrap through the mask: an unmasked bump overflows into the int32
        # sign bit after 2^(31-pg_bits) resets, after which every encoded
        # entry would decode as unallocated forever (silent lookup misses)
        epochs = bank.epochs.at[slot].set(
            jnp.where(
                pending,
                (old_epoch + 1) & jnp.int32(spec.epoch_mask),
                old_epoch,
            )
        )
        # Incremental stale-entry sweep: at reset time EVERY entry of this
        # slot is invalid (the epoch bump just invalidated them), so
        # clearing any of them is safe. Clearing sweep_per_reset rotating
        # entries guarantees each one is rewritten at least once per
        # epoch-wrap period, so a wrapped epoch can never false-validate a
        # stale entry. Cost: a K-element gather+scatter per reset (K = 1 at
        # the shipped specs), not a directory-wide pass.
        k = spec.sweep_per_reset
        base = jnp.int32(slot) * jnp.int32(spec.num_dir_groups)
        # epoch*k never overflows int32: epoch <= epoch_mask, and either
        # k == 1 (epoch_mask < 2^30) or k = ceil(D/P) so P*k < D + P <= 2D
        start = old_epoch * jnp.int32(k)
        idx = base + (start + jnp.arange(k, dtype=jnp.int32)) % jnp.int32(
            spec.num_dir_groups
        )
        directory = bank.directory.at[idx].set(
            jnp.where(pending, jnp.full(k, -1, jnp.int32), bank.directory[idx])
        )
        return BrickBank(
            directory=directory,  # old-epoch entries now unallocated
            pool=bank.pool,  # stale; unreachable until re-allocated (fresh)
            counts=counts,
            group_of_slot=bank.group_of_slot,
            dropped=bank.dropped,
            epochs=epochs,
        )
    # elementwise masked clears, not dynamic_update_slice: under vmap the
    # latter lowers to a scatter on a (B, ·) operand (whole-bank copy)
    in_dir = ((jnp.arange(bank.directory.shape[0]) // spec.num_dir_groups) == slot) & pending
    directory = jnp.where(in_dir, jnp.int32(-1), bank.directory)
    in_pool = ((jnp.arange(bank.pool.shape[0]) // spec.num_pool_cells) == slot) & pending
    pool = jnp.where(in_pool, jnp.zeros((), GRID_DTYPE), bank.pool)
    return BrickBank(
        directory=directory,
        pool=pool,
        counts=counts,
        group_of_slot=bank.group_of_slot,  # stale entries map zeroed cells
        dropped=bank.dropped,
        epochs=bank.epochs,
    )


from dliom_tpu.ops.grid_update import _trunc_div  # shared C-truncation div


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
        group, cig, ok = _split_cells(cells, spec)
        return group, cig, valid & ok

    g_all, c_all, v_all, m_all = [], [], [], []
    gl, cl, vv = records(hit_cells, masks)
    g_all.append(gl); c_all.append(cl); v_all.append(vv)
    m_all.append(jnp.zeros_like(gl))
    n = num_samples[..., None]
    safe_n = jnp.maximum(n, 1)
    for j in range(1, k + 1):
        pos = n - j
        cells = origin_cell + _trunc_div(delta * pos, safe_n)
        gl, cl, vv = records(cells, masks & (num_samples >= j))
        g_all.append(gl); c_all.append(cl); v_all.append(vv)
        m_all.append(jnp.ones_like(gl))

    s_count = hits.shape[0]
    slot_of = jnp.broadcast_to(
        jnp.arange(s_count, dtype=jnp.int32)[:, None], hits.shape[:2]
    )
    g_lin = jnp.concatenate([x.reshape(-1) for x in g_all])
    cig = jnp.concatenate([x.reshape(-1) for x in c_all])
    valid = jnp.concatenate([x.reshape(-1) for x in v_all])
    is_miss = jnp.concatenate([x.reshape(-1) for x in m_all])
    slot = jnp.concatenate([slot_of.reshape(-1)] * (k + 1))
    ndg = spec.num_dir_groups
    npg = spec.num_pool_groups
    cpg = spec.cells_per_group
    ndg_flat = s_count * ndg
    num_pool_flat = s_count * spec.num_pool_cells
    s_ar = jnp.arange(s_count, dtype=jnp.int32)

    # ONE sort by (slot-qualified group, cell-in-group, kind). Cell and kind
    # pack into the secondary key (cig < 16384, kind 1 bit); the primary key
    # is the directory-group address, so groups are contiguous, slot-ordered
    # — and the sorted secondary IS the kernel's record key.
    gaddr = jnp.where(valid, slot * ndg + g_lin, ndg_flat)
    sec = cig * 2 + is_miss
    # unstable: duplicate (group, cell, kind) records are interchangeable
    # (update-once collapses them), and a stable TPU sort carries an extra
    # iota tiebreaker operand (+50% sorted bytes, measured +50% time)
    s_g, s_sec = jax.lax.sort([gaddr, sec], num_keys=2, is_stable=False)
    s_cig = s_sec >> 1
    s_miss = s_sec & 1
    m = s_g.shape[0]
    s_valid = s_g < ndg_flat
    # the grouped-apply path reserves the pool's last group per slot as the
    # parking row for unused kernel steps, so it must never be allocated
    group_cap = npg - (1 if spec.apply_groups > 0 else 0)

    if spec.apply_groups > 0:
        # Fast path: allocation + directory maintenance at GRID-STEP
        # granularity. build_group_tables (binary search over the head
        # cumsum, no scatters) yields the per-step dir-group ids;
        # gather/alloc/scatter then touch
        # `apply_groups` elements instead of M. "Update once, hits first"
        # emerges from the kernel's count encoding (ops/pallas_apply.py).
        from dliom_tpu.ops.pallas_apply import (
            apply_grouped_rows,
            build_group_tables,
        )

        rows_dir, starts, ends = build_group_tables(
            s_g, s_valid, int(spec.apply_groups)
        )
        present = rows_dir >= 0  # absent steps trail (ranks are gapless)
        row_slot = jnp.clip(jnp.where(present, rows_dir, 0) // ndg, 0, s_count - 1)
        row_epoch = bank.epochs[row_slot]
        cur_raw = bank.directory[jnp.clip(rows_dir, 0, ndg_flat - 1)]
        cur_pg, cur_ok = _decode_dir(cur_raw, row_epoch, spec)
        cur = jnp.where(present & cur_ok, cur_pg, -1)
        needs = present & (cur < 0)
        needs_i = needs.astype(jnp.int32)
        incl = jnp.cumsum(needs_i)
        row_first = jnp.concatenate(
            [jnp.ones(1, bool), row_slot[1:] != row_slot[:-1]]
        )
        slot_base = jax.lax.cummax(jnp.where(row_first, incl - needs_i, 0))
        rank = (incl - needs_i) - slot_base
        counts_sel = jnp.sum(
            jnp.where(row_slot[:, None] == s_ar[None, :], bank.counts[None, :], 0),
            axis=1,
        )
        new_pg = counts_sel + rank
        alloc = needs & (new_pg < group_cap)
        pool_row = jnp.where(cur >= 0, cur, jnp.where(alloc, new_pg, -1))

        directory = bank.directory.at[jnp.where(alloc, rows_dir, ndg_flat)].set(
            jnp.where(alloc, _encode_dir(new_pg, row_epoch, spec), 0),
            mode="drop",
        )
        gos_idx = jnp.where(alloc, row_slot * npg + new_pg, s_count * npg)
        group_of_slot = bank.group_of_slot.at[gos_idx].set(
            jnp.where(alloc, rows_dir - row_slot * ndg, 0), mode="drop"
        )
        counts = bank.counts + jnp.sum(
            ((row_slot[:, None] == s_ar[None, :]) & alloc[:, None]).astype(
                jnp.int32
            ),
            axis=0,
        )
        dummy = s_count * npg - 1
        rows_pool = jnp.where(pool_row >= 0, row_slot * npg + pool_row, dummy)
        # Dropped (pool-full) and absent steps: empty record ranges so their
        # records never reach the parking row. Pool-full drops can interleave
        # parking steps BETWEEN real steps (pool_row = -1 mid-sequence);
        # that is benign BY CONSTRUCTION: an empty-range step's kernel pass
        # is a value-idempotent read-modify-write (zero modifications, the
        # block is written back bit-identically), so non-adjacent revisits of
        # the parking block cannot race with themselves (ops/pallas_apply.py
        # module docstring documents the same invariant). `fresh` is also
        # forced 0 for dropped steps (alloc requires pool_row >= 0).
        ends = jnp.where(pool_row >= 0, ends, starts)
        # no silent truncation: count every touched group whose updates were
        # lost (apply-capacity overflow or pool-full), aggregated in lane 0
        heads_total = jnp.sum(
            (
                jnp.concatenate([jnp.ones(1, bool), s_g[1:] != s_g[:-1]])
                & s_valid
            ).astype(jnp.int32)
        )
        kept = jnp.sum((pool_row >= 0).astype(jnp.int32))
        dropped = bank.dropped.at[0].add(heads_total - kept)
        keys = s_sec ^ 1  # kind bit flips to the kernel's is_hit convention
        # freshly allocated groups carry stale pool content (spawn clears
        # only the directory) — the kernel zero-fills them (writes the whole
        # block), so one insert fully initializes a new group
        pool = apply_grouped_rows(
            bank.pool, rows_pool, starts, ends, keys,
            cells_per_group=cpg, hit_odds=hit_odds, miss_odds=miss_odds,
            fresh=alloc.astype(jnp.int32),
        )
        return BrickBank(
            directory=directory, pool=pool, counts=counts,
            group_of_slot=group_of_slot, dropped=dropped,
            epochs=bank.epochs,
        )

    # ---- XLA fallback (tests / CPU) — per-record translation ----
    # Group allocation: heads of unallocated groups claim consecutive pool
    # groups per submap-slot off the running counters. Every record of a
    # group shares s_g, so the gathered directory value is identical
    # group-wide; newly claimed pool groups follow per record from the
    # `needs` cumsum (the group head is its first record, so cumsum(needs)-1
    # is the head's exclusive prefix at every record of the group).
    s_slot = jnp.clip(s_g // ndg, 0, s_count - 1)
    group_head = jnp.concatenate([jnp.ones(1, bool), s_g[1:] != s_g[:-1]]) & s_valid
    s_epoch = bank.epochs[s_slot]
    raw_pg = bank.directory[jnp.clip(s_g, 0, ndg_flat - 1)]
    dec_pg, dec_ok = _decode_dir(raw_pg, s_epoch, spec)
    cur_pg = jnp.where(dec_ok, dec_pg, -1)
    needs = group_head & (cur_pg < 0)
    needs_i = needs.astype(jnp.int32)
    incl = jnp.cumsum(needs_i)
    slot_first = jnp.concatenate([jnp.ones(1, bool), s_slot[1:] != s_slot[:-1]])
    slot_base = jax.lax.cummax(jnp.where(slot_first, incl - needs_i, 0))
    rank_rec = (incl - 1) - slot_base
    counts_sel = jnp.sum(
        jnp.where(s_slot[:, None] == s_ar[None, :], bank.counts[None, :], 0),
        axis=1,
    )
    new_pg = counts_sel + rank_rec
    fits = new_pg < group_cap
    pg = jnp.where(
        s_valid & (cur_pg >= 0),
        cur_pg,
        jnp.where(s_valid & (cur_pg < 0) & fits, new_pg, -1),
    )
    alloc_ok = needs & fits

    directory = bank.directory.at[jnp.where(alloc_ok, s_g, ndg_flat)].set(
        jnp.where(alloc_ok, _encode_dir(new_pg, s_epoch, spec), 0), mode="drop"
    )
    gos_idx = jnp.where(alloc_ok, s_slot * npg + new_pg, s_count * npg)
    group_of_slot = bank.group_of_slot.at[gos_idx].set(
        jnp.where(alloc_ok, s_g - s_slot * ndg, 0), mode="drop"
    )
    counts = bank.counts + jnp.sum(
        ((s_slot[:, None] == s_ar[None, :]) & alloc_ok[:, None]).astype(jnp.int32),
        axis=0,
    )

    # update-once with hit priority: records sorted by (group, cell, kind) —
    # the first record per (group, cell) decides.
    writable = s_valid & (pg >= 0)
    cell_head = jnp.concatenate(
        [jnp.ones(1, bool), (s_cig[1:] != s_cig[:-1]) | group_head[1:]]
    )
    cpos = jax.lax.cummax(jnp.where(cell_head, jnp.arange(m, dtype=jnp.int32), 0))
    head_is_miss = s_miss[cpos]

    addr = (
        s_slot * spec.num_pool_cells
        + jnp.clip(pg, 0, npg - 1) * cpg
        + s_cig
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
    dropped = bank.dropped.at[0].add(
        jnp.sum((needs & ~fits).astype(jnp.int32))
    )
    return BrickBank(
        directory=directory, pool=pool, counts=counts,
        group_of_slot=group_of_slot, dropped=dropped, epochs=bank.epochs,
    )


@_ft.lru_cache(maxsize=None)
def _brick_with_batch_rule(spec: BrickGridSpec, hp: float, mp: float, k: int):
    """custom_vmap: vmapped brick inserts flatten (B, 2*...) banks into one
    (2B)-slot kernel call (scatters on >1-D operands copy the whole bank).
    Integer-valued op, no AD required."""

    @jax.custom_batching.custom_vmap
    def f(directory, pool, counts, group_of_slot, dropped, epochs,
          origins, hits, masks):
        bank = BrickBank(directory, pool, counts, group_of_slot, dropped,
                         epochs)
        out = _insert_brick_slots(
            bank, origins, hits, masks, spec=spec,
            hit_probability=hp, miss_probability=mp, num_free_space_voxels=k,
        )
        return tuple(out)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        (directory, pool, counts, group_of_slot, dropped, epochs,
         origins, hits, masks) = (
            bc(x, b) for x, b in zip(args, in_batched)
        )
        s = hits.shape[1]
        bank = BrickBank(
            directory.reshape(-1), pool.reshape(-1), counts.reshape(-1),
            group_of_slot.reshape(-1), dropped.reshape(-1),
            epochs.reshape(-1),
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
            (True, True, True, True, True, True),
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
    )(bank.directory, bank.pool, bank.counts, bank.group_of_slot,
      bank.dropped, bank.epochs, origins, hits, masks)
    return BrickBank(*out)


def compress_brick(bank: BrickBank, spec: BrickGridSpec, slot, dense_spec, capacity: int):
    """Compress a slot's occupied cells into the backend's CompressedGrid
    representation, with indices in `dense_spec`'s (cropped, dense) linear
    space — cells beyond the crop window drop (loop-closure candidates are
    proximity-gated, so only far-field cells are lost; deviation from the
    reference's fully sparse HybridGrid::ToProto is documented here).

    One top_k over the slot's pool region + coordinate reconstruction via
    the group_of_slot reverse map + Morton decode."""
    from dliom_tpu.backend.compression import CompressedGrid
    from dliom_tpu.mapping.grid import linear_index

    pool = jax.lax.dynamic_slice(
        bank.pool, (slot * spec.num_pool_cells,), (spec.num_pool_cells,)
    ).astype(jnp.int32)
    cpg = spec.cells_per_group
    # STALE cells must be masked BEFORE top_k: grouped configs never clear
    # the pool on slot recycling (reset_slot clears only the directory), so
    # a recycled slot's unre-allocated groups still hold the previous
    # submap's values — filtering only after top_k lets them crowd every
    # real cell out of `capacity` (recycled submaps then compress empty).
    cell_pg = jnp.arange(spec.num_pool_cells, dtype=jnp.int32) // cpg
    pool = jnp.where(cell_pg < bank.counts[slot], pool, 0)
    top_vals, top_addr = jax.lax.top_k(pool, capacity)
    pg = top_addr // cpg
    within = top_addr % cpg
    dgroup = bank.group_of_slot[slot * spec.num_pool_groups + pg]
    mcode = dgroup * spec.alloc_bricks + within // BRICK_CELLS
    off = within % BRICK_CELLS
    brick = _demorton_brick(mcode)
    offs = jnp.stack(
        [off // (BRICK * BRICK), (off // BRICK) % BRICK, off % BRICK], axis=-1
    )
    cells = brick * BRICK + offs - spec.half  # signed cell coords
    lin, ok = linear_index(cells, dense_spec)
    valid = (top_vals > 0) & ok & (pg < bank.counts[slot])
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
