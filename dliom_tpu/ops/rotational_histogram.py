"""Rotational scan-matcher histograms, vectorized.

Counterpart of the reference's `RotationalScanMatcher`
(`cartographer/mapping/internal/3d/scan_matching/rotational_scan_matcher.cc`):

  * points are cut into 0.2 m z-slices;
  * within a slice, points are sorted by angle around the slice centroid;
  * each consecutive pair contributes the angle of its xy-delta to a [0, pi)
    histogram, weighted by how orthogonal the delta is to the centroid ray
    (rejecting floor/ceiling returns), for deltas in [0.2 m, 0.9 m];
  * match score = cosine similarity against a candidate histogram rotated by
    a yaw angle (fractional buckets linearly interpolated).

The per-slice stateful walk (a `last_point` that only advances on kept
pairs, :71-86) is vectorized as consecutive-sorted-pair differences: pairs
closer than kMinDistance are dropped instead of merged — after the 0.3+ m
voxel filter that precedes every histogram in the pipeline the two walks
almost always visit identical pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_DISTANCE = 0.2
MAX_DISTANCE = 0.9
SLICE_HEIGHT = 0.2
_NUM_SLICES = 1024  # z in [-102.4, 102.4) m


def _segment_sum_mm(ids: jnp.ndarray, num_segments: int,
                    values: jnp.ndarray) -> jnp.ndarray:
    """Segment sum as a one-hot matmul: TPU scatter-add serializes per
    element (~30-60 ns each), while an (N, S) one-hot contraction rides the
    MXU in one pass. ids out of [0, num_segments) contribute nothing."""
    oh = (
        ids[:, None] == jnp.arange(num_segments, dtype=ids.dtype)[None, :]
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        oh, values.astype(jnp.float32), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def compute_histogram(
    points: jnp.ndarray, mask: jnp.ndarray, num_buckets: int = 120
) -> jnp.ndarray:
    """Histogram of a (gravity-aligned) cloud; (num_buckets,) float32."""
    z_slice = jnp.round(points[:, 2] / SLICE_HEIGHT).astype(jnp.int32)
    slice_id = jnp.clip(z_slice + _NUM_SLICES // 2, 0, _NUM_SLICES - 1)
    seg = jnp.where(mask, slice_id, _NUM_SLICES)

    # Per-slice xy centroid (sum and count in one matmul pass), then the
    # per-point centroid via a SECOND contraction of the same one-hot —
    # `centroids[seg]` is a per-row-serialized gather (profiled at 57% of
    # the whole batched frontend step); `oh @ centroids` rides the MXU and
    # XLA fuses the one-hot build into both matmuls (never materialized).
    # Only xy is consumed downstream, so z never enters either contraction.
    # Invalid points (sentinel seg) have an all-zero one-hot row: their
    # centroid is 0, harmless — they are masked out of `valid` below.
    ones = mask.astype(jnp.float32)
    oh = (
        seg[:, None] == jnp.arange(_NUM_SLICES, dtype=seg.dtype)[None, :]
    ).astype(jnp.float32)
    sums3 = jax.lax.dot_general(
        oh,
        jnp.concatenate([points[:, :2] * ones[:, None], ones[:, None]], axis=1),
        (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    centroids = sums3[:, :2] / jnp.maximum(sums3[:, 2], 1.0)[:, None]
    centroid = jax.lax.dot_general(
        oh, centroids, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )

    offs = points[:, :2] - centroid[:, :2]
    far_enough = jnp.linalg.norm(offs, axis=-1) >= MIN_DISTANCE
    angle_about_centroid = jnp.arctan2(offs[:, 1], offs[:, 0])

    # Sort by (slice, angle); invalid/too-close points go last. One payload
    # sort carrying the xy columns directly (the only coordinates the pair
    # math needs) — gathering rows by the sorted order serializes per
    # element on TPU, the payload sort does not. Slice and angle pack into
    # ONE int32 key (slice < 2^11 in the high bits, angle quantized to 20
    # bits over [-pi, pi] — ~6 urad buckets, far below sensor angular
    # noise), and validity needs no payload: invalid entries carry the
    # sentinel slice, so `sorted key >= _NUM_SLICES << 20` recovers it.
    valid = mask & far_enough
    aq = jnp.clip(
        ((angle_about_centroid + jnp.pi) * ((1 << 20) / (2.0 * jnp.pi)))
        .astype(jnp.int32),
        0,
        (1 << 20) - 1,
    )
    key = jnp.where(
        valid, (seg << 20) | aq, jnp.int32((_NUM_SLICES + 1) << 20)
    )
    # unstable: ties share a ~6 urad angle bucket, so pair order within a
    # tie is physically indistinguishable; stability would drag an extra
    # iota tiebreaker operand through the 5-array sort
    skey, spx, spy, scx, scy = jax.lax.sort(
        [
            key,
            points[:, 0],
            points[:, 1],
            centroid[:, 0],
            centroid[:, 1],
        ],
        num_keys=1,
        is_stable=False,
    )
    sseg = skey >> 20
    svalid = sseg < _NUM_SLICES
    sp = jnp.stack([spx, spy], axis=-1)
    sc = jnp.stack([scx, scy], axis=-1)

    # Consecutive pairs within a slice.
    delta = sp[1:] - sp[:-1]
    direction = sp[1:] - sc[1:]
    dist = jnp.linalg.norm(delta, axis=-1)
    dirn = jnp.linalg.norm(direction, axis=-1)
    same_slice = (sseg[1:] == sseg[:-1]) & svalid[1:] & svalid[:-1]
    # (no dirn gate here: every sorted-valid point already passed the
    # identical per-point far_enough check above)
    keep = same_slice & (dist >= MIN_DISTANCE) & (dist <= MAX_DISTANCE)
    angle = jnp.arctan2(delta[:, 1], delta[:, 0])
    ortho = 1.0 - jnp.abs(
        jnp.sum(delta * direction, axis=-1) / jnp.maximum(dist * dirn, 1e-12)
    )
    value = jnp.maximum(0.0, ortho)

    # Map angle to [0, pi) buckets (AddValueToHistogram).
    a = jnp.mod(angle, jnp.pi)
    bucket = jnp.clip(
        jnp.round(num_buckets * (a / jnp.pi) - 0.5).astype(jnp.int32),
        0,
        num_buckets - 1,
    )
    bucket = jnp.where(keep, bucket, num_buckets)
    return _segment_sum_mm(
        bucket, num_buckets, jnp.where(keep, value, 0.0)[:, None]
    )[:, 0]


def rotate_histogram(histogram: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate by `angle` with linear interpolation of fractional buckets
    (RotateHistogram, rotational_scan_matcher.cc:118-140)."""
    n = histogram.shape[0]
    rotate_by = -angle * n / jnp.pi
    full = jnp.round(rotate_by - 0.5).astype(jnp.int32)
    frac = rotate_by - full
    idx = jnp.arange(n)
    src0 = jnp.mod(idx + full, n)
    src1 = jnp.mod(idx + full + 1, n)
    return (1.0 - frac) * histogram[src0] + frac * histogram[src1]


def match_histograms(
    histogram: jnp.ndarray, reference: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Cosine similarity of `histogram` rotated by each angle vs `reference`
    (RotationalScanMatcher::Match). Returns (len(angles),) scores in [0, 1]."""

    def score(angle):
        rotated = rotate_histogram(histogram, angle)
        denom = jnp.linalg.norm(rotated) * jnp.linalg.norm(reference)
        s = jnp.dot(rotated, reference) / jnp.maximum(denom, 1e-12)
        # An empty histogram matches everything (reference MatchHistograms
        # returns 1 for zero norm).
        return jnp.where(denom < 1e-12, 1.0, s)

    return jax.vmap(score)(jnp.asarray(angles))


def np_rotate_histogram(histogram, angle: float):
    """Host numpy mirror of rotate_histogram for node-rate pose-graph
    bookkeeping (one call per node; keeps the ingest path dispatch-free)."""
    import numpy as np

    histogram = np.asarray(histogram)
    n = histogram.shape[0]
    rotate_by = -float(angle) * n / np.pi
    full = int(np.round(rotate_by - 0.5))
    frac = rotate_by - full
    idx = np.arange(n)
    src0 = np.mod(idx + full, n)
    src1 = np.mod(idx + full + 1, n)
    return (1.0 - frac) * histogram[src0] + frac * histogram[src1]
