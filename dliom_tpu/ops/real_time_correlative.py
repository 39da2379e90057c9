"""Real-time correlative scan matcher (3D exhaustive local search).

Counterpart of the reference's `RealTimeCorrelativeScanMatcher3D`
(real_time_correlative_scan_matcher_3d.cc:34-117): enumerate every pose in a
(x, y, z, rx, ry, rz) lattice around the initial estimate, score each by the
mean cell probability of the transformed cloud, damp by
exp(-(|t|*w_t + angle*w_r)^2), return the best. The dlio configs keep it
disabled (basic_config_3d.lua `use_online_correlative_scan_matching = false`);
it exists for parity and as a robust recovery matcher.

TPU formulation: the reference's six nested loops become one static candidate
lattice; all candidates score in a single batched gather of shape
(num_candidates, N) — no data-dependent control flow.

One deviation: the reference derives the angular step from the measured max
scan range (:64-72), which is data-dependent; here the step uses the static
`max_scan_range` argument (callers pass the sensor's configured max range),
keeping the lattice shape compile-time constant.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping.grid import GridSpec, cell_index, linear_index
from dliom_tpu.mapping import probability as pv
from dliom_tpu.transform.rigid import Rigid3, quat_from_axis_angle, quat_multiply, quat_normalize, quat_rotate


class RealTimeMatchResult(NamedTuple):
    pose: Rigid3
    score: jnp.ndarray


def _lattice(
    resolution: float,
    linear_search_window: float,
    angular_search_window: float,
    max_scan_range: float,
    max_angular_steps: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Static candidate offsets: translations (C, 3) and angle-axis (C, 3)
    (GenerateExhaustiveSearchTransforms :56-97)."""
    lin = int(round(linear_search_window / resolution))
    safety = 1.0 - 1e-3
    rng = max(max_scan_range, 3.0 * resolution)
    step = safety * math.acos(
        max(-1.0, 1.0 - resolution**2 / (2.0 * rng**2))
    )
    ang = int(round(angular_search_window / step)) if step > 0 else 0
    # Bound the rotational lattice: the acos-derived step at long max ranges
    # makes the full product combinatorial (tens of millions of candidates);
    # the recovery matcher needs a coarse local sweep, not an exhaustive one
    # (documented deviation from :64-72). The cap is a config knob
    # (real_time_correlative_scan_matcher.max_angular_steps) and truncation
    # is surfaced, never silent.
    if ang > max_angular_steps:
        import warnings

        warnings.warn(
            f"real-time correlative: angular_search_window requests {ang} "
            f"steps/axis; truncating the lattice to max_angular_steps="
            f"{max_angular_steps} (raise the config knob for a wider sweep)",
            stacklevel=2,
        )
        ang = max_angular_steps
    ts, aas = [], []
    for z in range(-lin, lin + 1):
        for y in range(-lin, lin + 1):
            for x in range(-lin, lin + 1):
                for rz in range(-ang, ang + 1):
                    for ry in range(-ang, ang + 1):
                        for rx in range(-ang, ang + 1):
                            ts.append((x * resolution, y * resolution, z * resolution))
                            aas.append((rx * step, ry * step, rz * step))
    return (
        np.asarray(ts, np.float32),
        np.asarray(aas, np.float32),
    )


def match(
    initial_pose: Rigid3,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    values: jnp.ndarray,
    spec: GridSpec,
    *,
    linear_search_window: float = 0.15,
    angular_search_window: float = 0.035,
    translation_delta_cost_weight: float = 1e-1,
    rotation_delta_cost_weight: float = 1e-1,
    max_scan_range: float = 60.0,
    max_angular_steps: int = 4,
    base=0,
) -> RealTimeMatchResult:
    """Exhaustive local search (Match :34-53 + ScoreCandidate :99-117).

    `values`/`base`: flat grid (bank) + slot offset, as in the Ceres matcher.
    """
    off_t, off_aa = _lattice(
        spec.resolution, linear_search_window, angular_search_window,
        max_scan_range, max_angular_steps,
    )
    off_t = jnp.asarray(off_t)  # (C, 3)
    off_q = jax.vmap(quat_from_axis_angle)(jnp.asarray(off_aa))  # (C, 4)
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

    from dliom_tpu.mapping.brick_grid import BrickBank, lookup_value_brick

    def score_one(dt, dq):
        # candidate = initial * offset (:43-45)
        cand_q = quat_normalize(quat_multiply(initial_pose.rotation, dq))
        cand_t = initial_pose.translation + quat_rotate(initial_pose.rotation, dt)
        world = jax.vmap(lambda p: quat_rotate(cand_q, p))(points) + cand_t
        cells = cell_index(world, spec.resolution)
        if isinstance(values, BrickBank):
            v = lookup_value_brick(values, cells, spec, base)  # base = slot
            prob = pv.value_to_probability(jnp.where(mask, v, 0))
        else:
            lin, ok = linear_index(cells, spec)
            v = values[base + lin].astype(jnp.int32)
            prob = pv.value_to_probability(jnp.where(ok & mask, v, 0))
        s = jnp.sum(jnp.where(mask, prob, 0.0)) / n_valid
        angle = jnp.linalg.norm(jnp.asarray(dq)[1:4])  # ~angle/2 for small dq
        angle = 2.0 * jnp.arcsin(jnp.clip(angle, 0.0, 1.0))
        damp = jnp.exp(
            -(
                jnp.linalg.norm(dt) * translation_delta_cost_weight
                + angle * rotation_delta_cost_weight
            )
            ** 2
        )
        return s * damp, cand_q, cand_t

    # Chunked evaluation: a single vmap over all candidates materializes
    # (C, N, 3) world points — tens of GB at large windows. lax.map over
    # fixed-size blocks keeps peak memory at (chunk, N, 3).
    c = off_t.shape[0]
    chunk = min(256, c)
    pad = (-c) % chunk
    # zero angle-axis / zero translation padding scores like the identity
    # candidate; padded entries are masked out of the argmax below
    off_t_b = jnp.pad(off_t, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    off_q_b = jnp.pad(
        off_q, ((0, pad), (0, 0)), constant_values=0.0
    ).at[c:, 0].set(1.0).reshape(-1, chunk, 4)

    def score_chunk(args):
        t, q = args
        return jax.vmap(lambda a, b: score_one(a, b)[0])(t, q)

    scores = jax.lax.map(score_chunk, (off_t_b, off_q_b)).reshape(-1)
    scores = jnp.where(jnp.arange(scores.shape[0]) < c, scores, -jnp.inf)
    best = jnp.argmax(scores)
    _, best_q, best_t = score_one(off_t[best], off_q[best])
    return RealTimeMatchResult(
        pose=Rigid3(best_q, best_t), score=scores[best]
    )
