"""Morton (z-order) encoding for voxel keys.

Bit-interleaving 10 bits per axis into one int32 makes octree levels prefix-
contiguous after a single sort: the level-i voxel of a point is its Morton
code shifted right by 3i. This collapses the adaptive voxel filter's ladder
of per-length sorts into one sort (see ops/voxel_filter.py).
"""

from __future__ import annotations

import jax.numpy as jnp

BITS = 10  # per axis; codes fit 30 bits
RANGE = 1 << BITS  # 1024 cells per axis


def part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of x so there are two zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of part1by2: gather every third bit back into 10 bits."""
    x = x & 0x9249249
    x = (x | (x >> 2)) & 0x30C30C3
    x = (x | (x >> 4)) & 0x300F00F
    x = (x | (x >> 8)) & 0x30000FF
    x = (x | (x >> 16)) & 0x3FF
    return x


def encode(cells: jnp.ndarray) -> jnp.ndarray:
    """Signed voxel indices (..., 3) in [-512, 512) -> Morton codes (...,).

    Out-of-range indices are clamped (far voxels alias onto the boundary
    shell; callers bound coordinates via max_range / resolution first).
    """
    c = jnp.clip(cells + RANGE // 2, 0, RANGE - 1)
    return (
        part1by2(c[..., 0])
        | (part1by2(c[..., 1]) << 1)
        | (part1by2(c[..., 2]) << 2)
    )
