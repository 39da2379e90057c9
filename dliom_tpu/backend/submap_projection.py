"""Submap-image loop-closure proposals.

Counterpart of D-LIOM's submap-image constraint proposal (C10,
SURVEY.md): the reference projects each finished 3D submap to a 2D grayscale
image (`Submap3D::ProjectToCvMat`, mapping/3d/submap_3d.cc:381-463:
gravity-aligned, yaw-removed, probability -> 0..255 pixels), extracts SURF
keypoints, FLANN-matches every pair of non-adjacent submaps, and RANSACs a
2D similarity transform (scale ~ 1 gate) that seeds `MatchWith3DofInitial`
(`ExtractFeaturesForSubmap`, constraint_builder_3d.cc:436-532).

TPU-native substitute with the same contract (O(submaps) proposal of
submap-to-submap 2D transforms robust to large drift): dense normalized
FFT cross-correlation over a small set of candidate yaws —

  * projection: max-probability over z of the high-res grid, downsampled to
    a fixed image (top-down structure signature);
  * for each candidate yaw, rotate one image (bilinear gather) and compute
    the translation via the FFT cross-correlation peak;
  * score = normalized correlation; the acceptance threshold plays the role
    of the reference's minimum_good_match_num / RANSAC inlier gates, and the
    verification stage (correlative matcher + GN refine) is identical.

Dense correlation trades SURF's sparse keypoints for work that maps onto
the TPU's FFT/VPU; recall characteristics differ but the downstream
verifier gates false proposals the same way."""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import GridSpec
from dliom_tpu.transform.rigid import Rigid3, quat_from_yaw


class SubmapImage(NamedTuple):
    image: jnp.ndarray  # (S, S) float32 in [0, 1], zero-mean-normalized later
    meters_per_pixel: float


def project_to_image(
    values: jnp.ndarray, spec: GridSpec, out_size: int = 128
) -> SubmapImage:
    """Top-down projection: max probability over z, downsampled
    (ProjectToCvMat's probability->pixel mapping; erosion/thresholding is
    unnecessary for dense correlation)."""
    e = spec.extent
    g = pv.value_to_probability(values.reshape(e, e, e).astype(jnp.int32))
    img = jnp.max(g, axis=2)  # (E, E) over z
    img = (img - pv.MIN_PROBABILITY) / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY)
    factor = max(1, e // out_size)
    if factor > 1:
        s = (e // factor) * factor
        img = img[:s, :s].reshape(s // factor, factor, s // factor, factor).max(
            axis=(1, 3)
        )
    return SubmapImage(image=img.astype(jnp.float32),
                       meters_per_pixel=spec.resolution * factor)


def _rotate_image(img: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotate about the image center by `yaw` (bilinear gather)."""
    s = img.shape[0]
    c = (s - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(s), jnp.arange(s), indexing="ij")
    dx = xs - c
    dy = ys - c
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # inverse mapping: source coords for each destination pixel
    sx = cos * dx + sin * dy + c
    sy = -sin * dx + cos * dy + c
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, s - 2)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    inside = (sx >= 0) & (sx <= s - 1) & (sy >= 0) & (sy <= s - 1)

    def at(yy, xx):
        return img[yy, xx]

    v = (
        at(y0, x0) * (1 - fx) * (1 - fy)
        + at(y0, x0 + 1) * fx * (1 - fy)
        + at(y0 + 1, x0) * (1 - fx) * fy
        + at(y0 + 1, x0 + 1) * fx * fy
    )
    return jnp.where(inside, v, 0.0)


class Proposal(NamedTuple):
    yaw: jnp.ndarray  # relative yaw (rotate `other` into `anchor`)
    shift_xy: jnp.ndarray  # (2,) meters: translation of other's center
    score: jnp.ndarray  # normalized correlation in [0, 1]


def propose_2d_transform(
    anchor: SubmapImage,
    other: SubmapImage,
    num_yaw: int = 24,
    yaw_window: float = math.pi,
) -> Proposal:
    """Best (yaw, shift) aligning `other` onto `anchor` by FFT
    cross-correlation over candidate yaws."""
    a = anchor.image - jnp.mean(anchor.image)
    fa = jnp.fft.rfft2(a)
    s = a.shape[0]
    yaws = jnp.linspace(-yaw_window, yaw_window, num_yaw, endpoint=False)

    def corr_at(yaw):
        # image (row, col) = grid (x, y): the pixel-space rotation of a
        # +yaw frame rotation is -yaw in (row, col) handedness
        b = _rotate_image(other.image, -yaw)
        b = b - jnp.mean(b)
        fb = jnp.fft.rfft2(b)
        xc = jnp.fft.irfft2(fa * jnp.conj(fb), s=(s, s))
        denom = jnp.maximum(
            jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-6
        )
        xc = xc / denom
        idx = jnp.argmax(xc)
        return xc.reshape(-1)[idx], idx

    scores, idxs = jax.vmap(corr_at)(yaws)
    best = jnp.argmax(scores)
    idx = idxs[best]
    dy = idx // s
    dx = idx % s
    # wrap circular shifts to signed offsets
    dy = jnp.where(dy > s // 2, dy - s, dy)
    dx = jnp.where(dx > s // 2, dx - s, dx)
    shift = (
        jnp.stack([dy, dx]).astype(jnp.float32) * anchor.meters_per_pixel
    )  # row -> x (grid axis 0), col -> y (grid axis 1)
    return Proposal(yaw=yaws[best], shift_xy=shift, score=scores[best])


def proposal_to_initial_guess(
    proposal: Proposal,
    node_pose_in_other: Rigid3,
) -> Rigid3:
    """Embed the 2D proposal as the node-in-anchor initial guess
    (ComputeConstraint, constraint_builder_3d.cc:240-259). The proposal's
    (yaw, shift) already IS the anchor-from-other submap transform in their
    gravity-aligned frames (submap rotations are gravity alignments by
    construction), so no global-pose composition is involved — drifted
    global estimates cannot and should not affect the image-derived seed."""
    # Pure numpy: this runs per sampled node on the host search path, where
    # a jnp composition would dispatch device ops whose staging read later
    # costs a blocking relay round trip per node.
    import numpy as np

    from dliom_tpu.transform.rigid import np_compose, np_rigid

    yaw = float(proposal.yaw)
    t2d = Rigid3(
        rotation=np.array(
            [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)], np.float64
        ),
        translation=np.array(
            [float(proposal.shift_xy[0]), float(proposal.shift_xy[1]), 0.0],
            np.float64,
        ),
    )
    return np_compose(t2d, np_rigid(node_pose_in_other))
