"""Fixed-capacity voxel downsampling filters.

TPU-native counterpart of the reference's hash-set `VoxelFilter` /
`AdaptiveVoxelFilter` (`cartographer/sensor/internal/voxel_filter.cc`):

  * voxel index = round(point / edge_length) per component (:126-131);
  * keep the *first* point (in input order) of each voxel (:79-87);
  * the adaptive variant searches for the largest edge length <= max_length
    that still yields >= min_num_points points after filtering points beyond
    max_range (:37-74).

The hash set becomes a stable lexicographic sort over (voxel index, input
order) + segmented-first compaction, with static shapes throughout. The
adaptive variant evaluates a fixed dyadic ladder of candidate lengths
(max_length / 2^i) in one batched pass and picks the largest admissible one —
replacing the reference's sequential 10%-tolerance binary refinement, whose
data-dependent trip count cannot be compiled; the selected cloud differs only
in being at a dyadic rather than 10%-refined edge length (both satisfy the
same >= min_num_points contract).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FilteredCloud(NamedTuple):
    """Survivors compacted to the front; same capacity as input."""

    points: jnp.ndarray  # (N, 3)
    times: jnp.ndarray  # (N,)
    mask: jnp.ndarray  # (N,)


def _voxel_keys(points: jnp.ndarray, edge_length) -> Tuple[jnp.ndarray, ...]:
    idx = jnp.round(points / edge_length).astype(jnp.int32)
    return idx[..., 0], idx[..., 1], idx[..., 2]


def _first_per_voxel_mask(
    points: jnp.ndarray, mask: jnp.ndarray, edge_length
) -> jnp.ndarray:
    """Boolean keep-mask (in input order): first valid point of each voxel."""
    n = points.shape[0]
    kx, ky, kz = _voxel_keys(points, edge_length)
    big = jnp.int32(2**30)
    kx = jnp.where(mask, kx, big)  # invalid points sort last
    # lexsort is stable; final key listed last → sort by kx, then ky, kz.
    order = jnp.lexsort((kz, ky, kx))
    sx, sy, sz = kx[order], ky[order], kz[order]
    new_voxel = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
        ]
    )
    keep_sorted = new_voxel & (sx < big)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def _compact(points, times, mask, keep) -> FilteredCloud:
    n = points.shape[0]
    keep = keep & mask
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, n)  # dropped -> out of bounds
    out_p = jnp.zeros_like(points).at[dest].set(points, mode="drop")
    out_t = jnp.zeros_like(times).at[dest].set(times, mode="drop")
    count = jnp.sum(keep.astype(jnp.int32))
    out_m = jnp.arange(n) < count
    return FilteredCloud(out_p, out_t, out_m)


def voxel_filter(
    points: jnp.ndarray,
    times: jnp.ndarray,
    mask: jnp.ndarray,
    edge_length: float,
) -> FilteredCloud:
    """Plain voxel filter at a fixed edge length."""
    keep = _first_per_voxel_mask(points, mask, edge_length)
    return _compact(points, times, mask, keep)


def _count_distinct_voxels(points, mask, edge_length) -> jnp.ndarray:
    return jnp.sum(_first_per_voxel_mask(points, mask, edge_length))


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

    1. drop points with norm > max_range;
    2. if few enough points remain, keep them all;
    3. else pick the largest ladder length max_length/2^i whose filtered
       count reaches min_num_points (i = num_octaves-1 if none does) and
       return the filter at that length.

    If out_capacity is given, the result is truncated to it (by uniform
    stride over survivors) and padded to that capacity.
    """
    in_range = mask & (jnp.linalg.norm(points, axis=-1) <= max_range)
    n_valid = jnp.sum(in_range.astype(jnp.int32))

    lengths = [max_length / (2.0**i) for i in range(num_octaves)]
    keeps = jnp.stack(
        [_first_per_voxel_mask(points, in_range, l) for l in lengths]
    )  # (L, N)
    counts = jnp.sum(keeps, axis=1)
    admissible = counts >= min_num_points
    # index of the first (largest-length) admissible ladder entry
    pick = jnp.argmax(admissible)
    pick = jnp.where(jnp.any(admissible), pick, num_octaves - 1)
    keep = keeps[pick]
    # Sparse-enough input bypasses filtering entirely (voxel_filter.cc:39-42).
    keep = jnp.where(n_valid <= min_num_points, in_range, keep)

    out = _compact(points, times, in_range, keep)
    if out_capacity is not None and out_capacity != points.shape[0]:
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
    # stride over survivors: index i -> floor(i * count / capacity), strictly
    # increasing while i < min(count, capacity)
    i = jnp.arange(capacity)
    take = jnp.where(
        count > capacity, (i * count) // capacity, jnp.minimum(i, n - 1)
    )
    new_mask = i < jnp.minimum(count, capacity)
    return FilteredCloud(
        cloud.points[take], cloud.times[take], new_mask
    )
