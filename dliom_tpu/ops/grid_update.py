"""Vectorized range-data insertion into dense submap grids.

TPU-native counterpart of the reference's `RangeDataInserter3D`
(`cartographer/mapping/3d/range_data_inserter_3d.cc`):

  * every hit cell gets one hit-odds update;
  * along each ray from the sensor origin to a hit, the last
    `num_free_space_voxels` equidistant samples (reference
    InsertMissesIntoGrid:27-52) get one miss-odds update;
  * within one insert, each cell is updated *at most once*, hits taking
    priority over misses (the reference's kUpdateMarker bit +
    "hits before misses" ordering, range_data_inserter_3d.cc:86-91).

Instead of a marker bit and sequential table walks, all candidate updates
(hit and miss) are materialized as one fixed-size batch of (cell, kind)
records, sorted by cell id with hits ordered first, and only the first record
per cell is applied — a single sort + segmented-first + gather + scatter,
which is how "update-once" maps onto a vector machine (SURVEY.md §7 "Scatter
with update-once semantics").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GRID_DTYPE, GridSpec, cell_index, linear_index


def _trunc_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C++-style integer division truncating toward zero (b > 0)."""
    q = a // b
    r = a - q * b
    return q + jnp.where((r != 0) & (a < 0), 1, 0)


def insert_range_data(
    values: jnp.ndarray,
    origin: jnp.ndarray,
    hits: jnp.ndarray,
    hits_mask: jnp.ndarray,
    *,
    spec: GridSpec,
    hit_probability: float = 0.55,
    miss_probability: float = 0.49,
    num_free_space_voxels: int = 2,
    slot: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Insert one range-data batch; returns the updated grid.

    Args:
      values: FLAT (num_slots * extent^3,) int16 grid bank — `slot` selects
        the offset slot * extent^3. Banks must stay 1D: XLA scatters into a
        reshaped/dynamically-sliced view of a donated buffer leave the
        in-place fast path and copy the whole bank (~7x slower, measured).
        The update is a pure scatter: disabled/invalid records drop out via
        out-of-bounds indices, so a no-op insert costs no grid traffic.
      origin: (3,) sensor origin in the grid frame.
      hits: (N, 3) hit points in the grid frame (padded).
      hits_mask: (N,) validity of each hit (AND this with any enable gate).
    """
    flat = values
    base = jnp.asarray(slot, jnp.int32) * spec.num_cells
    num_flat = values.shape[0]
    hit_odds = hit_probability / (1.0 - hit_probability)
    miss_odds = miss_probability / (1.0 - miss_probability)
    k = int(num_free_space_voxels)

    res = spec.resolution
    hit_cells = cell_index(hits, res)  # (N, 3)
    origin_cell = cell_index(origin, res)  # (3,)
    delta = hit_cells - origin_cell  # (N, 3)
    num_samples = jnp.max(jnp.abs(delta), axis=-1)  # (N,)

    hit_lin, hit_ok = linear_index(hit_cells, spec)
    hit_valid = hits_mask & hit_ok

    # Miss sample j (1-based from the hit end): cell at ray position
    # (num_samples - j) / num_samples, valid while the position stays within
    # [max(0, n-k), n) — i.e. j <= n (reference loop bounds :45-46).
    miss_lins = []
    miss_valids = []
    n = num_samples[:, None]  # (N, 1)
    for j in range(1, k + 1):
        pos = n - j
        safe_n = jnp.maximum(n, 1)
        cells = origin_cell + _trunc_div(delta * pos, safe_n)
        lin, ok = linear_index(cells, spec)
        miss_lins.append(lin)
        miss_valids.append(hits_mask & ok & (num_samples >= j))
    if k > 0:
        miss_lin = jnp.concatenate(miss_lins)
        miss_valid = jnp.concatenate(miss_valids)
        all_lin = jnp.concatenate([hit_lin, miss_lin])
        all_valid = jnp.concatenate([hit_valid, miss_valid])
        is_miss = jnp.concatenate(
            [jnp.zeros_like(hit_valid), jnp.ones_like(miss_valid)]
        )
    else:
        all_lin, all_valid = hit_lin, hit_valid
        is_miss = jnp.zeros_like(hit_valid)

    # Sort by (cell, kind): hits sort before misses within a cell; invalid
    # entries sort to the end. The first record of each cell group decides
    # the update kind (hit priority); every group member then writes the
    # *identical* updated value, so the scatter stays fully sorted (the
    # fast path for the TPU scatter engine) without a compaction pass.
    sentinel = spec.num_cells
    lin_key = jnp.where(all_valid, all_lin, sentinel)
    key = lin_key * 2 + is_miss.astype(jnp.int32)
    s_key, s_lin = jax.lax.sort([key, lin_key], num_keys=1, is_stable=False)
    s_miss = s_key & 1
    m = s_lin.shape[0]
    first = jnp.concatenate([jnp.ones(1, bool), s_lin[1:] != s_lin[:-1]])
    head_pos = jax.lax.cummax(
        jnp.where(first, jnp.arange(m, dtype=jnp.int32), 0)
    )
    head_is_miss = s_miss[head_pos]

    gather_idx = base + jnp.clip(s_lin, 0, sentinel - 1)
    current = flat.at[gather_idx].get(
        mode="clip", indices_are_sorted=True
    ).astype(jnp.int32)
    updated = jnp.where(
        head_is_miss == 1,
        pv.apply_odds(current, miss_odds),
        pv.apply_odds(current, hit_odds),
    )
    scatter_idx = jnp.where(s_lin < sentinel, base + s_lin, num_flat)
    return flat.at[scatter_idx].set(
        updated.astype(GRID_DTYPE), mode="drop", indices_are_sorted=True
    )


def _insert_slots(
    values: jnp.ndarray,  # (S * num_cells,) FLAT bank (slot k at k*num_cells)
    origins: jnp.ndarray,  # (S, 3) per-slot origin in the slot's frame
    hits: jnp.ndarray,  # (S, N, 3) per-slot hit points in the slot's frame
    masks: jnp.ndarray,  # (S, N)
    *,
    spec: GridSpec,
    hit_probability: float,
    miss_probability: float,
    num_free_space_voxels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Insert one scan batch into S slots with a single sort + gather +
    scatter over the combined record set. S = 2 covers the two active
    submaps (ActiveSubmaps3D inserts every scan into both, submap_3d.cc:
    303-309); S = 2*B covers B vmapped sequences — the batching rule
    flattens into this same kernel because scatters on >1-D operands leave
    XLA's in-place path (see insert_range_data).

    Returns (values, dropped): `dropped` is the scalar int32 count of
    touched groups lost to the grouped-apply capacity this insert (always 0
    on the plain scatter path, which has no capacity)."""
    hit_odds = hit_probability / (1.0 - hit_probability)
    miss_odds = miss_probability / (1.0 - miss_probability)
    k = int(num_free_space_voxels)
    res = spec.resolution
    s_count = hits.shape[0]
    num_flat = s_count * spec.num_cells
    use_pallas = spec.apply_groups > 0
    if use_pallas:
        from dliom_tpu.ops.pallas_apply import DENSE_CELLS_PER_GROUP

        assert num_flat % DENSE_CELLS_PER_GROUP == 0, (
            "extent^3 not group-divisible; disable apply_groups")
        assert values.shape[0] == num_flat + DENSE_CELLS_PER_GROUP, (
            "grouped-apply banks carry one padding group (make_grid_bank)")
    else:
        assert values.shape[0] == num_flat, (values.shape, s_count, spec.num_cells)
    # two-key sort below keeps keys in int32: slot-qualified index < 2^31
    assert num_flat < 2**31 - 1, "flat bank exceeds int32 indexing"

    hit_cells = cell_index(hits, res)  # (S, N, 3)
    origin_cell = cell_index(origins, res)[:, None, :]  # (S, 1, 3)
    delta = hit_cells - origin_cell
    num_samples = jnp.max(jnp.abs(delta), axis=-1)  # (S, N)

    base = (jnp.arange(s_count, dtype=jnp.int32) * spec.num_cells)[:, None]

    hit_lin, hit_ok = linear_index(hit_cells, spec)
    hit_valid = masks & hit_ok
    lins = [jnp.where(hit_valid, base + hit_lin, num_flat).reshape(-1)]
    misses = [jnp.zeros(hits.shape[0] * hits.shape[1], jnp.int32)]
    n = num_samples[..., None]
    safe_n = jnp.maximum(n, 1)
    for j in range(1, k + 1):
        pos = n - j
        cells = origin_cell + _trunc_div(delta * pos, safe_n)
        lin, ok = linear_index(cells, spec)
        valid = masks & ok & (num_samples >= j)
        lins.append(jnp.where(valid, base + lin, num_flat).reshape(-1))
        misses.append(jnp.ones(hits.shape[0] * hits.shape[1], jnp.int32))
    all_lin = jnp.concatenate(lins)
    is_miss = jnp.concatenate(misses)

    if use_pallas:
        # Grouped Pallas apply: update-once-with-hit-priority emerges from
        # the kernel's count encoding — one sort, no dedup pass, no
        # per-element gather/scatter (see ops/pallas_apply.py).
        from dliom_tpu.ops.pallas_apply import (
            DENSE_CELLS_PER_GROUP,
            apply_grouped_updates,
            pack_keys,
        )

        valid = all_lin < num_flat
        group = all_lin // DENSE_CELLS_PER_GROUP
        cell = all_lin % DENSE_CELLS_PER_GROUP
        # unstable: duplicate packed records are interchangeable, and a
        # stable TPU sort carries an extra iota tiebreaker operand
        keys = jax.lax.sort(
            pack_keys(group, cell, 1 - is_miss, valid, DENSE_CELLS_PER_GROUP),
            is_stable=False,
        )
        return apply_grouped_updates(
            values,
            keys,
            num_groups=int(spec.apply_groups),
            cells_per_group=DENSE_CELLS_PER_GROUP,
            hit_odds=hit_odds,
            miss_odds=miss_odds,
            dummy_group=values.shape[0] // DENSE_CELLS_PER_GROUP - 1,
        )  # (values, dropped)

    # lexicographic (cell, kind) sort: hits first within a cell group.
    # Pack into ONE int32 key when the range fits (sorting one operand
    # moves half the bytes of a two-key sort).
    if 2 * (num_flat + 1) < 2**31:
        key = all_lin * 2 + is_miss
        s_key = jax.lax.sort(key, is_stable=False)
        s_lin = s_key >> 1
        s_miss = s_key & 1
    else:
        s_lin, s_miss = jax.lax.sort([all_lin, is_miss], num_keys=2, is_stable=False)
    m = s_lin.shape[0]
    first = jnp.concatenate([jnp.ones(1, bool), s_lin[1:] != s_lin[:-1]])
    head_pos = jax.lax.cummax(jnp.where(first, jnp.arange(m, dtype=jnp.int32), 0))
    head_is_miss = s_miss[head_pos]

    gather_idx = jnp.clip(s_lin, 0, num_flat - 1)
    current = values.at[gather_idx].get(mode="clip", indices_are_sorted=True).astype(
        jnp.int32
    )
    updated = jnp.where(
        head_is_miss == 1,
        pv.apply_odds(current, miss_odds),
        pv.apply_odds(current, hit_odds),
    )
    return (
        values.at[s_lin].set(
            updated.astype(GRID_DTYPE), mode="drop", indices_are_sorted=True
        ),
        jnp.int32(0),
    )


@functools.lru_cache(maxsize=None)
def _dual_with_batch_rule(spec: GridSpec, hp: float, mp: float, k: int):
    """custom_vmap wrapper: vmapping the dual insert flattens (B, 2*C) banks
    into one (2B*C,) flat kernel call — a plain vmap would scatter into a 2-D
    operand, which copies the whole bank per step (measured ~5x slower).
    Inserts are integer-valued (no AD), so custom_vmap is safe here."""

    @jax.custom_batching.custom_vmap
    def f(values, origins, hits, masks):
        return _insert_slots(
            values, origins, hits, masks, spec=spec,
            hit_probability=hp, miss_probability=mp, num_free_space_voxels=k,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, values, origins, hits, masks):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        values = bc(values, in_batched[0])
        origins = bc(origins, in_batched[1])
        hits = bc(hits, in_batched[2])
        masks = bc(masks, in_batched[3])
        s = hits.shape[1]
        out, dropped = _insert_slots(
            values.reshape(-1),
            origins.reshape(axis_size * s, 3),
            hits.reshape(axis_size * s, *hits.shape[2:]),
            masks.reshape(axis_size * s, -1),
            spec=spec, hit_probability=hp, miss_probability=mp,
            num_free_space_voxels=k,
        )
        # the flat kernel aggregates drops across lanes; report the total on
        # every lane (unbatched scalar) rather than losing it
        return (out.reshape(axis_size, -1), dropped), (True, False)

    return f


def insert_range_data_dual(
    values: jnp.ndarray,  # (2 * num_cells,) FLAT bank (slot k at k*num_cells)
    origins: jnp.ndarray,  # (2, 3) per-slot origin in the slot's frame
    hits: jnp.ndarray,  # (2, N, 3) per-slot hit points in the slot's frame
    masks: jnp.ndarray,  # (2, N)
    *,
    spec: GridSpec,
    hit_probability: float = 0.55,
    miss_probability: float = 0.49,
    num_free_space_voxels: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Insert one scan into BOTH submap slots (see _insert_slots). vmap-safe:
    batching flattens into the same single-sort flat kernel. Returns
    (values, dropped) — see _insert_slots."""
    return _dual_with_batch_rule(
        spec, float(hit_probability), float(miss_probability),
        int(num_free_space_voxels),
    )(values, origins, hits, masks)
