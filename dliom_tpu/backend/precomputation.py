"""Multi-resolution max-pool pyramid for correlative loop-closure search.

TPU-native counterpart of the reference's `PrecomputationGrid3D` stack
(`cartographer/mapping/internal/3d/scan_matching/precomputation_grid_3d.cc`
+ PrecomputationGridStack3D, fast_correlative_scan_matcher_3d.cc:60-77):

  * depth 0: probabilities mapped to uint8 (0..255 over [0.1, 0.9],
    ConvertToPrecomputationGrid :49-61);
  * each deeper level stores, per cell, the max over a 2^depth-wide window
    (built by octant-shifted max, PrecomputeGrid :63-81);
  * beyond `full_resolution_depth`, levels also halve resolution.

On dense grids the octant-shift scatter-max becomes three axis-wise
shifted-max passes per level (separable, VPU-friendly), and half-resolution
is a 2x2x2 max downsample — the whole stack is a handful of elementwise max
ops per submap."""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec


def to_precomputation_values(values: jnp.ndarray) -> jnp.ndarray:
    """int16 cell values -> uint8 probability bytes (0 for unknown maps to
    the byte of kMinProbability = 0, like the reference's unknown cells)."""
    p = pv.value_to_probability(values.astype(jnp.int32))
    b = jnp.round(
        (p - pv.MIN_PROBABILITY) * (255.0 / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY))
    )
    return jnp.clip(b, 0, 255).astype(jnp.uint8)


def probability_from_byte(b: jnp.ndarray) -> jnp.ndarray:
    """PrecomputationGrid3D::ToProbability."""
    return pv.MIN_PROBABILITY + b.astype(jnp.float32) * (
        (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY) / 255.0
    )


def _shift_max_axis(g: jnp.ndarray, axis: int, shift: int) -> jnp.ndarray:
    """max(g[i], g[i + shift]) along `axis` (zero beyond the boundary)."""
    n = g.shape[axis]
    sl = [slice(None)] * 3
    sl[axis] = slice(shift, n)
    shifted = g[tuple(sl)]
    pad = [(0, 0)] * 3
    pad[axis] = (0, shift)
    shifted = jnp.pad(shifted, pad)
    return jnp.maximum(g, shifted)


def _halve(g: jnp.ndarray) -> jnp.ndarray:
    """2x2x2 max downsample."""
    e = g.shape[0]
    r = g.reshape(e // 2, 2, e // 2, 2, e // 2, 2)
    return r.max(axis=(1, 3, 5))


class Pyramid(NamedTuple):
    """Stack of uint8 grids, one per depth. levels[d] has extent
    extents[d] and covers windows of 2^d full-resolution cells; levels
    beyond full_resolution_depth are at halved resolution (the cell->index
    mapping per depth mirrors DiscretizeScan, see fast_correlative.py)."""

    levels: Tuple[jnp.ndarray, ...]  # each (e_d, e_d, e_d) uint8


def build_pyramid(
    values: jnp.ndarray,
    spec: GridSpec,
    depth: int = 8,
    full_resolution_depth: int = 3,
) -> Pyramid:
    """Build the stack (PrecomputationGridStack3D ctor)."""
    e = spec.extent
    g = to_precomputation_values(values).reshape(e, e, e)
    levels: List[jnp.ndarray] = [g]
    cur = g
    for d in range(1, depth):
        shift = 1  # after each level, window doubles via cumulative shifts
        # window at level d covers 2^d cells: combine two 2^(d-1) windows
        s = 1 << (d - 1)
        if d < full_resolution_depth:
            for axis in range(3):
                cur = _shift_max_axis(cur, axis, min(s, cur.shape[axis] - 1))
            levels.append(cur)
        else:
            # shift at current (possibly halved) resolution
            scale = 1 << max(0, d - full_resolution_depth)
            s_eff = max(1, s // scale)
            for axis in range(3):
                cur = _shift_max_axis(cur, axis, min(s_eff, cur.shape[axis] - 1))
            cur = _halve(cur)
            levels.append(cur)
    return Pyramid(levels=tuple(levels))


def lookup(
    pyramid_level: jnp.ndarray, cells: jnp.ndarray, half: int
) -> jnp.ndarray:
    """Gather uint8 values at signed cell indices (centered at `half` per
    axis of this level); out of bounds -> 0."""
    e = pyramid_level.shape[0]
    shifted = cells + half
    ok = jnp.all((shifted >= 0) & (shifted < e), axis=-1)
    c = jnp.clip(shifted, 0, e - 1)
    flat = (c[..., 0] * e + c[..., 1]) * e + c[..., 2]
    vals = pyramid_level.reshape(-1)[flat]
    return jnp.where(ok, vals, 0).astype(jnp.int32)
