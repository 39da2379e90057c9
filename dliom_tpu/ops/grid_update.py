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
) -> jnp.ndarray:
    """Insert one range-data batch; returns the updated flat grid.

    Args:
      values: flat (extent^3,) int16 grid.
      origin: (3,) sensor origin in the grid frame.
      hits: (N, 3) hit points in the grid frame (padded).
      hits_mask: (N,) validity of each hit.
    """
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
    # entries sort to the end. First record per cell wins.
    sentinel = spec.num_cells
    lin_key = jnp.where(all_valid, all_lin, sentinel)
    key = lin_key * 2 + is_miss.astype(jnp.int32)
    order = jnp.argsort(key)
    s_lin = lin_key[order]
    s_miss = is_miss[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), s_lin[1:] != s_lin[:-1]]
    ) & (s_lin < sentinel)

    current = values[jnp.clip(s_lin, 0, sentinel - 1)].astype(jnp.int32)
    updated = jnp.where(
        s_miss,
        pv.apply_odds(current, miss_odds),
        pv.apply_odds(current, hit_odds),
    )
    scatter_idx = jnp.where(first, s_lin, sentinel)
    return values.at[scatter_idx].set(updated.astype(GRID_DTYPE), mode="drop")
