"""Fixed-capacity sparse compression of finished submap grids.

The reference keeps every finished submap's pointer-tree HybridGrid alive for
loop closure (Submap3D shared_ptrs in PoseGraph3D). Dense grids are too large
to keep per submap (a 448^3 int16 grid is 179 MB), so on finish each grid is
compressed to its occupied cells — (linear index, value) pairs, fixed
capacity — and decompressed to a dense work buffer on demand when a submap
is the target of constraint search. This mirrors the sparsity of the
reference's serialization format (HybridGrid::ToProto writes index/value
lists, hybrid_grid.h:530-545)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping.grid import GRID_DTYPE, GridSpec


class CompressedGrid(NamedTuple):
    indices: jnp.ndarray  # (K,) int32 linear cell indices (sorted; pad = num_cells)
    values: jnp.ndarray  # (K,) int16
    count: jnp.ndarray  # () int32 number of valid entries


def compress(values: jnp.ndarray, spec: GridSpec, capacity: int) -> CompressedGrid:
    """Keep up to `capacity` non-zero cells (the highest-probability cells
    win if over capacity, so a too-small capacity degrades toward keeping
    the confident map structure)."""
    flat = values.reshape(-1).astype(jnp.int32)
    # sort by (occupied desc by value, index) — take top `capacity` values
    neg = jnp.where(flat > 0, -flat, 1)  # empty cells sort last
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    _, top_idx = jax.lax.top_k(-neg, capacity)  # highest values first
    top_vals = flat[top_idx]
    valid = top_vals > 0
    count = jnp.sum(valid.astype(jnp.int32))
    # re-sort kept entries by index for locality
    key = jnp.where(valid, top_idx, spec.num_cells)
    order = jnp.argsort(key)
    return CompressedGrid(
        indices=key[order],
        values=jnp.where(valid, top_vals, 0)[order].astype(GRID_DTYPE),
        count=count,
    )


def decompress(comp: CompressedGrid, spec: GridSpec) -> jnp.ndarray:
    """Scatter back to a dense flat grid."""
    dense = jnp.zeros(spec.num_cells, GRID_DTYPE)
    return dense.at[comp.indices].set(
        comp.values, mode="drop", indices_are_sorted=True, unique_indices=True
    )
