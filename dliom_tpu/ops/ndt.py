"""Normal Distributions Transform (NDT) scan-to-scan matching.

Counterpart of the reference's PCL NDT usage for dynamic initialization
(`MatchByNDT`, local_trajectory_builder_3d.cc:969-1008): voxelize the target
scan into per-voxel Gaussians, then Gauss-Newton a pose that minimizes the
Mahalanobis distance of each source point to its voxel's distribution.
Occupancy matching is ill-suited to single sparse scans (beam rings bias the
gradient); distributions capture the local surface plane.

TPU formulation: voxel statistics by one sort + segment sums; a dense
voxel-id -> slot table makes per-point lookup a gather; the pose solve
reuses the trust-region LM structure of the grid matcher."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping.grid import GridSpec, cell_index, linear_index
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
)


class NdtField(NamedTuple):
    """Per-voxel Gaussians + dense slot table."""

    means: jnp.ndarray  # (K, 3)
    sqrt_inv_cov: jnp.ndarray  # (K, 3, 3) whitening transforms
    valid: jnp.ndarray  # (K,)
    slot_table: jnp.ndarray  # (num_cells,) int32 -> slot or K


def build_field(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    spec: GridSpec,
    max_voxels: int = 4096,
    min_points: int = 4,
) -> NdtField:
    n = points.shape[0]
    cells = cell_index(points, spec.resolution)
    lin, ok = linear_index(cells, spec)
    valid = mask & ok
    key = jnp.where(valid, lin, spec.num_cells)
    order = jnp.argsort(key)
    s_key = key[order]
    s_pts = points[order]
    s_cells = cells

    first = jnp.concatenate([jnp.ones(1, bool), s_key[1:] != s_key[:-1]]) & (
        s_key < spec.num_cells
    )
    # slot id per sorted element = rank of its group head
    slot_of_elem = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot_of_elem = jnp.where(s_key < spec.num_cells, slot_of_elem, max_voxels)
    slot_of_elem = jnp.minimum(slot_of_elem, max_voxels)

    w = (s_key < spec.num_cells).astype(jnp.float32)
    counts = jax.ops.segment_sum(w, slot_of_elem, num_segments=max_voxels + 1)
    # Moments about each point's CELL CENTER, not the origin: E[pp^T] -
    # mu mu^T on absolute f32 coordinates cancels catastrophically for
    # voxels far from the origin (1e4-scale outer products vs sub-1 true
    # covariances), which can push cov non-PSD -> NaN cholesky -> silently
    # zeroed residuals for exactly the far-field voxels.
    s_centers = s_cells[order].astype(jnp.float32) * spec.resolution
    s_rel = s_pts - s_centers
    sums = jax.ops.segment_sum(
        s_rel * w[:, None], slot_of_elem, num_segments=max_voxels + 1
    )
    center_sums = jax.ops.segment_sum(
        s_centers * w[:, None], slot_of_elem, num_segments=max_voxels + 1
    )
    outer = s_rel[:, :, None] * s_rel[:, None, :] * w[:, None, None]
    sq = jax.ops.segment_sum(outer, slot_of_elem, num_segments=max_voxels + 1)

    counts = counts[:max_voxels]
    rel_means = sums[:max_voxels] / jnp.maximum(counts, 1.0)[:, None]
    means = (
        rel_means
        + center_sums[:max_voxels] / jnp.maximum(counts, 1.0)[:, None]
    )
    cov = sq[:max_voxels] / jnp.maximum(counts, 1.0)[:, None, None] - (
        rel_means[:, :, None] * rel_means[:, None, :]
    )
    # NDT regularization: floor eigenvalues at a fraction of the voxel size
    eps = (0.05 * spec.resolution) ** 2
    cov = cov + eps * jnp.eye(3)
    ok_voxel = counts >= min_points
    # whitening via cholesky of inv(cov): sqrtinfo = L^-1 with cov = L L^T
    l = jnp.linalg.cholesky(cov)
    inv_l = jax.vmap(
        lambda m: jax.scipy.linalg.solve_triangular(m, jnp.eye(3), lower=True)
    )(l)
    inv_l = jnp.where(jnp.isfinite(inv_l), inv_l, 0.0)

    # dense slot table (per cell)
    table = jnp.full(spec.num_cells + 1, max_voxels, jnp.int32)
    head_lin = jnp.where(first, s_key, spec.num_cells)
    head_slot = jnp.where(first, slot_of_elem, max_voxels)
    table = table.at[head_lin].set(head_slot, mode="drop")
    return NdtField(
        means=means,
        sqrt_inv_cov=inv_l,
        valid=ok_voxel,
        slot_table=table[: spec.num_cells],
    )


def match(
    field: NdtField,
    spec: GridSpec,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial: Rigid3,
    *,
    max_iterations: int = 20,
    huber_delta: float = 1.0,
) -> Rigid3:
    """Point-to-distribution Gauss-Newton (trust-region, Huber-weighted)."""
    k = field.means.shape[0]

    def residuals(pose: Rigid3):
        world = pose.apply(points)
        cells = cell_index(world, spec.resolution)
        lin, ok = linear_index(cells, spec)
        slot = field.slot_table[jnp.clip(lin, 0, spec.num_cells - 1)]
        has = ok & mask & (slot < k) & field.valid[jnp.clip(slot, 0, k - 1)]
        slot = jnp.clip(slot, 0, k - 1)
        d = world - field.means[slot]
        r = jnp.einsum("nij,nj->ni", field.sqrt_inv_cov[slot], d)
        # Huber weighting for robustness to wrong associations
        nrm = jnp.linalg.norm(r, axis=-1)
        scale = jnp.where(
            nrm > huber_delta, jnp.sqrt(huber_delta / jnp.maximum(nrm, 1e-9)), 1.0
        )
        r = r * scale[:, None]
        n_valid = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
        return jnp.where(has[:, None], r, 0.0).reshape(-1) / jnp.sqrt(n_valid)

    def apply_delta(pose, d):
        dq = quat_from_axis_angle(d[3:6])
        return Rigid3(
            quat_normalize(quat_multiply(dq, pose.rotation)),
            pose.translation + d[:3],
        )

    zero = jnp.zeros(6, jnp.float32)
    eye = jnp.eye(6, dtype=jnp.float32)

    def r_and_jac(pose):
        r, jvp = jax.linearize(lambda d: residuals(apply_delta(pose, d)), zero)
        jac = jnp.stack([jvp(eye[i]) for i in range(6)], axis=1)
        return r, jac

    def lm_step(carry, _):
        pose, radius, best_pose, best_cost = carry
        r, jac = r_and_jac(pose)
        cost = jnp.sum(r * r)
        grad = jac.T @ r
        hess = jac.T @ jac
        d2 = jnp.clip(jnp.diag(hess), 1e-12, None)
        step = -jnp.linalg.solve(hess + (1.0 / radius) * jnp.diag(d2), grad)
        cand = apply_delta(pose, step)
        new_cost = jnp.sum(residuals(cand) ** 2)
        accept = new_cost < cost
        pose = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, pose)
        radius = jnp.where(accept, radius * 2.0, radius * 0.25)
        radius = jnp.clip(radius, 1e-3, 1e5)
        is_best = accept & (new_cost < best_cost)
        best_pose = jax.tree.map(
            lambda a, b: jnp.where(is_best, a, b), cand, best_pose
        )
        best_cost = jnp.where(is_best, new_cost, best_cost)
        return (pose, radius, best_pose, best_cost), None

    c0 = jnp.sum(residuals(initial) ** 2)
    (_, _, pose, _), _ = jax.lax.scan(
        lm_step,
        (initial, jnp.float32(100.0), initial, c0),
        None,
        length=max_iterations,
    )
    return pose
