"""Fixed-capacity voxel downsampling filters (single-sort implementations).

TPU-native counterpart of the reference's hash-set `VoxelFilter` /
`AdaptiveVoxelFilter` (`cartographer/sensor/internal/voxel_filter.cc`):

  * voxel index = round(point / edge_length) per component (:126-131);
  * keep the *first* point (in input order) of each voxel (:79-87);
  * the adaptive variant searches for the largest edge length <= max_length
    that still yields >= min_num_points points after filtering points beyond
    max_range (:37-74).

Vectorization strategy (scatter/sort ops on TPU are latency-bound per
element, so each filter does exactly ONE sort):

  * plain filter: one sort of clamped linear voxel keys + segmented-first;
  * adaptive filter: voxels at the *finest* ladder length are Morton-encoded
    (ops/morton.py), so every coarser dyadic level is a prefix of the same
    sorted array — counts for all levels and the survivor set of the chosen
    level come from one sort. This replaces the reference's sequential
    halving + 10%-tolerance binary refinement (whose data-dependent trip
    count cannot compile) with a dyadic ladder; both satisfy the same
    ">= min_num_points at the largest admissible length" contract. Levels
    above the finest are floor-nested rather than independently rounded —
    voxel sizes match the reference ladder, boundaries shift by half a cell.

Coordinate range: keys clamp at +-512 voxels (Morton) / +-640 (linear) from
the origin; beyond that, voxels alias onto the boundary shell (the octave
count is capped so the finest level still covers max_range).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.ops import morton

_LINEAR_R = 1280  # linear keys: 1280^3 < 2^31


class FilteredCloud(NamedTuple):
    """Survivors compacted to the front; same capacity as input."""

    points: jnp.ndarray  # (N, 3)
    times: jnp.ndarray  # (N,)
    mask: jnp.ndarray  # (N,)


def _first_of_sorted_group(codes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    new = jnp.concatenate([jnp.ones(1, bool), codes[1:] != codes[:-1]])
    return new & valid


def _unsort(s_idx: jnp.ndarray, s_vals: jnp.ndarray) -> jnp.ndarray:
    """Restore `s_vals` (int32) to input order given the permutation `s_idx`.
    A key-sort is ~4x faster than the equivalent random scatter on TPU."""
    _, vals = jax.lax.sort([s_idx, s_vals], num_keys=1)
    return vals


def _compact(points, times, mask, keep) -> FilteredCloud:
    """Compact survivors to the front (input order preserved). One payload
    sort by (dropped, index) — TPU sorts are ~4x faster than the two random
    scatters of the cumsum-destination formulation."""
    n = points.shape[0]
    keep = keep & mask
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(keep, idx, jnp.int32(n) + idx)
    _, out_x, out_y, out_z, out_t = jax.lax.sort(
        [key, points[:, 0], points[:, 1], points[:, 2], times], num_keys=1
    )
    count = jnp.sum(keep.astype(jnp.int32))
    out_m = idx < count
    out_p = jnp.where(
        out_m[:, None], jnp.stack([out_x, out_y, out_z], axis=1), 0.0
    )
    return FilteredCloud(out_p, jnp.where(out_m, out_t, 0.0), out_m)


def voxel_filter_mask(
    points: jnp.ndarray, mask: jnp.ndarray, edge_length: float
) -> jnp.ndarray:
    """Keep-mask (in input order) of the plain voxel filter.

    For consumers that work under masking and don't need the survivors
    compacted to the front: one sort + one bool scatter, instead of the
    full filter's additional cumsum + point/time scatters.
    """
    n = points.shape[0]
    cells = jnp.round(points / edge_length).astype(jnp.int32)
    c = jnp.clip(cells + _LINEAR_R // 2, 0, _LINEAR_R - 1)
    code = (c[:, 0] * _LINEAR_R + c[:, 1]) * _LINEAR_R + c[:, 2]
    code = jnp.where(mask, code, jnp.int32(2**31 - 1))
    idx = jnp.arange(n, dtype=jnp.int32)
    s_code, s_idx = jax.lax.sort([code, idx], num_keys=2)
    keep_sorted = _first_of_sorted_group(s_code, s_code < 2**31 - 1)
    return _unsort(s_idx, keep_sorted.astype(jnp.int32)).astype(bool)


def voxel_filter(
    points: jnp.ndarray,
    times: jnp.ndarray,
    mask: jnp.ndarray,
    edge_length: float,
) -> FilteredCloud:
    """Plain voxel filter at a fixed edge length. One sort."""
    keep = voxel_filter_mask(points, mask, edge_length)
    return _compact(points, times, mask, keep)


def adaptive_voxel_filter(
    points: jnp.ndarray,
    times: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    max_length: float,
    min_num_points: int,
    max_range: float,
    num_octaves: int = 7,
    out_capacity: int | None = None,
) -> FilteredCloud:
    """Adaptive voxel filter (AdaptivelyVoxelFiltered, voxel_filter.cc:37-74).

    One Morton sort at the finest dyadic level; the chosen level is the
    coarsest with >= min_num_points survivors (finest if none reaches it).
    """
    n = points.shape[0]
    # Cap octaves so the finest level's +-512-cell Morton window covers
    # max_range.
    max_levels = int(
        math.floor(math.log2(max(morton.RANGE // 2 * max_length / max_range, 1.0)))
    ) + 1
    levels = max(1, min(num_octaves, max_levels))
    finest = max_length / (2.0 ** (levels - 1))

    in_range = mask & (jnp.linalg.norm(points, axis=-1) <= max_range)
    n_valid = jnp.sum(in_range.astype(jnp.int32))

    cells = jnp.round(points / finest).astype(jnp.int32)
    code = morton.encode(cells)
    code = jnp.where(in_range, code, jnp.int32(2**30))
    idx = jnp.arange(n, dtype=jnp.int32)
    s_code, s_idx = jax.lax.sort([code, idx], num_keys=2)
    s_valid = s_code < 2**30

    # First-of-group masks for every level, finest (i=0) to coarsest.
    firsts = []
    for i in range(levels):
        sh = s_code >> (3 * i)
        firsts.append(_first_of_sorted_group(sh, s_valid))
    firsts = jnp.stack(firsts)  # (levels, N)
    counts = jnp.sum(firsts, axis=1)

    admissible = counts >= min_num_points
    # Coarsest admissible level = highest index with admissible True.
    rev = admissible[::-1]
    pick = jnp.where(jnp.any(admissible), levels - 1 - jnp.argmax(rev), 0)
    keep_sorted = firsts[pick]
    # Sparse-enough input bypasses filtering (voxel_filter.cc:39-42).
    keep_sorted = jnp.where(n_valid <= min_num_points, s_valid, keep_sorted)

    keep = _unsort(s_idx, keep_sorted.astype(jnp.int32)).astype(bool)
    out = _compact(points, times, in_range, keep)
    if out_capacity is not None and out_capacity != n:
        out = truncate_cloud(out, out_capacity)
    return out


def truncate_cloud(cloud: FilteredCloud, capacity: int) -> FilteredCloud:
    """Uniform-stride downsample of a compacted cloud to a smaller capacity."""
    n = cloud.points.shape[0]
    if capacity >= n:
        pad = capacity - n
        return FilteredCloud(
            jnp.pad(cloud.points, ((0, pad), (0, 0))),
            jnp.pad(cloud.times, (0, pad)),
            jnp.pad(cloud.mask, (0, pad)),
        )
    count = jnp.sum(cloud.mask.astype(jnp.int32))
    i = jnp.arange(capacity)
    take = jnp.where(
        count > capacity, (i * count) // capacity, jnp.minimum(i, n - 1)
    )
    new_mask = i < jnp.minimum(count, capacity)
    return FilteredCloud(cloud.points[take], cloud.times[take], new_mask)
