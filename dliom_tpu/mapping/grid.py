"""Dense HBM-resident submap probability grids.

TPU-native counterpart of the reference's sparse pointer-tree `HybridGrid`
(`cartographer/mapping/3d/hybrid_grid.h`): a fixed-extent dense array of int16
cell values per submap, flat in HBM, so every lookup is a single gather and
every update a single scatter — no pointer chasing, fully static shapes.

Conventions (identical to the reference):
  * cell index `i` (a signed 3-vector) has its center at `i * resolution`
    in the submap frame (`GetCenterOfCell`, hybrid_grid.h:446);
  * a point maps to the cell `round(point / resolution)` per component
    (`GetCellIndex`, hybrid_grid.h:430);
  * value 0 is *unknown*; values [1, 32767] map linearly onto probabilities
    [0.1, 0.9] (mapping/probability.py). 32767 fits int16 exactly.

The dense grid spans indices [-extent/2, extent/2) per axis; points outside
are masked out of updates and read as unknown. This trades the reference's
unbounded growth for static shapes (SURVEY.md §7 "Dynamic sparse grid →
static shapes"); extents are config capacity knobs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping import probability as pv

GRID_DTYPE = jnp.int16


@dataclass(frozen=True)
class GridSpec:
    """Static description of one dense grid (hashable → jit-static)."""

    resolution: float
    extent: int  # cells per axis; grid covers [-extent/2, extent/2)
    # > 0 routes insertion through the grouped Pallas apply kernel
    # (ops/pallas_apply.py) with this touched-group capacity; the bank then
    # carries one extra 16384-cell padding group at its end (the kernel's
    # parking row). 0 keeps the XLA sort+gather+scatter path.
    apply_groups: int = 0

    @property
    def num_cells(self) -> int:
        return self.extent ** 3

    @property
    def half(self) -> int:
        return self.extent // 2


def make_grid(spec: GridSpec) -> jnp.ndarray:
    """A fresh all-unknown grid, flat (extent^3,) int16."""
    return jnp.zeros(spec.num_cells, GRID_DTYPE)


def cell_index(points: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """Point(s) (..., 3) -> signed cell index (..., 3) int32 (reference
    GetCellIndex: round per component)."""
    return jnp.round(points / resolution).astype(jnp.int32)


def center_of_cell(cells: jnp.ndarray, resolution: float) -> jnp.ndarray:
    return cells.astype(jnp.float32) * resolution


def linear_index(cells: jnp.ndarray, spec: GridSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Signed cell index (..., 3) -> (flat index (...,), in-bounds mask (...,)).

    Out-of-bounds indices are clamped into range; callers must use the mask.
    """
    shifted = cells + spec.half
    in_bounds = jnp.all((shifted >= 0) & (shifted < spec.extent), axis=-1)
    clamped = jnp.clip(shifted, 0, spec.extent - 1)
    lin = (clamped[..., 0] * spec.extent + clamped[..., 1]) * spec.extent + clamped[
        ..., 2
    ]
    return lin, in_bounds


# Host-side constant (np, not jnp): module import must not create device
# arrays — that would initialize the default backend (possibly a broken TPU
# plugin) before callers can pin a platform. XLA folds it at trace time.
_CORNERS = np.asarray(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)], np.int32
)


def _corner_weights(s: jnp.ndarray) -> jnp.ndarray:
    """Trilinear corner weights (..., 8) from per-axis upper weights (..., 3).
    Unrolled elementwise products — fancy-indexing alternatives lower to
    gathers on TPU."""
    return jnp.stack(
        [
            (s[..., 0] if dx else 1.0 - s[..., 0])
            * (s[..., 1] if dy else 1.0 - s[..., 1])
            * (s[..., 2] if dz else 1.0 - s[..., 2])
            for dx in (0, 1)
            for dy in (0, 1)
            for dz in (0, 1)
        ],
        axis=-1,
    )


def lookup_value(
    values: jnp.ndarray, cells: jnp.ndarray, spec: GridSpec, base=0
) -> jnp.ndarray:
    """Cell value(s) at signed cell indices; unknown (0) out of bounds.

    `base` offsets into a flat multi-submap bank (slot * num_cells) — banks
    stay 1D because XLA scatters/gathers into reshaped or dynamically sliced
    views of a donated buffer fall off the in-place fast path (a full-bank
    copy per op, measured ~7x slower on TPU)."""
    lin, ok = linear_index(cells, spec)
    v = values[base + lin].astype(jnp.int32)
    return jnp.where(ok, v, 0)


def lookup_probability(
    values: jnp.ndarray, cells: jnp.ndarray, spec: GridSpec, base=0
) -> jnp.ndarray:
    return pv.value_to_probability(lookup_value(values, cells, spec, base))


def set_cells(
    values: jnp.ndarray, cells: jnp.ndarray, new_values: jnp.ndarray, spec: GridSpec
) -> jnp.ndarray:
    """Direct cell assignment (test/deserialization helper)."""
    lin, ok = linear_index(cells, spec)
    lin = jnp.where(ok, lin, spec.num_cells)  # out-of-bounds -> dropped
    return values.at[lin].set(new_values.astype(GRID_DTYPE), mode="drop")


def interpolated_probability(
    values: jnp.ndarray, points: jnp.ndarray, spec: GridSpec, base=0
) -> jnp.ndarray:
    """Smoothed trilinear probability at point(s) (..., 3) in the grid frame.

    Counterpart of the reference's InterpolatedGrid::GetProbability
    (interpolated_grid.h:50-103): per axis the interpolant is
    lerp(q_lo, q_hi, smoothstep(t)) with smoothstep(t) = 3t^2 - 2t^3, which
    interpolates cell-center values with vanishing derivative at centers —
    continuously differentiable, so `jax.grad` through this function gives
    the analytic Jacobians the reference gets from Ceres autodiff.

    The lower corner is the largest cell whose center is <= the point per
    axis (CenterOfLowerVoxel, interpolated_grid.h:122-139) == floor(p/res).
    """
    pr = points / spec.resolution
    lower = jnp.floor(pr)
    t = pr - lower  # in [0, 1)
    s = t * t * (3.0 - 2.0 * t)  # smoothstep weight toward the upper corner
    lower = lower.astype(jnp.int32)

    # all 8 corners in ONE gather (one batched lookup beats 8 chained small
    # gathers on TPU, where gather cost is launch-latency dominated)
    corners = lower[..., None, :] + _CORNERS  # (..., 8, 3)
    q = lookup_probability(values, corners, spec, base)  # (..., 8)
    w = _corner_weights(s)
    return jnp.sum(q * w, axis=-1)


def occupied_cells(values: jnp.ndarray, spec: GridSpec, threshold: float = 0.501):
    """Boolean occupancy over the dense grid (viz/serialization helper)."""
    thr = int(pv.probability_to_value(jnp.float32(threshold)))
    return values >= thr
