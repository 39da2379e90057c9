"""IMU initialization: static, dynamic (linear alignment), gravity estimation.

TPU-native counterparts of the reference's initializers:

  * `static_initialize` — LocalTrajectoryBuilder3D::InitializeStatic
    (local_trajectory_builder_3d.cc:203-229): average a buffer of IMU
    samples, derive the gravity-aligned initial rotation and biases;
  * `approximate_gravity` / `refine_gravity` — VINS-style linear alignment
    (initialization/imu_lidar_initializer.cc:50-210): from inter-scan
    odometry poses and IMU preintegrations, solve per-frame (body-frame)
    velocities + the gravity vector by LDLT; then re-solve on the gravity
    tangent basis with the norm constrained;
  * `estimate_gravity` — the online sliding-window gravity estimator
    (gravity_factor/gravity_estimator.cc:20-170) used by the gravity factor:
    same structure but velocities are known.

All functions take fixed-size stacked windows with a pair-validity mask.
Systems are a few dozen unknowns — solved densely in f32 on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_from_two_vectors,
    quat_inverse_rotate,
    quat_to_rotation_matrix,
)


def static_initialize(
    accs: jnp.ndarray,  # (M, 3) buffered accelerometer samples
    gyrs: jnp.ndarray,  # (M, 3)
    mask: jnp.ndarray,  # (M,)
    gravity_norm: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (rotation quaternion body->world, accel bias, gyro bias)."""
    w = mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    accel_mean = jnp.sum(accs * w, axis=0) / n
    gyro_mean = jnp.sum(gyrs * w, axis=0) / n
    g_vec = jnp.asarray([0.0, 0.0, -gravity_norm], jnp.float32)
    # R maps the measured specific force onto +z*g (frame I to frame G).
    rot = quat_from_two_vectors(accel_mean, -g_vec)
    ba = quat_inverse_rotate(rot, g_vec) + accel_mean
    bg = gyro_mean
    return rot, ba, bg


def tangent_basis(g0: jnp.ndarray) -> jnp.ndarray:
    """(3, 2) basis of the tangent plane at direction g0 (TangentBasis)."""
    a = g0 / jnp.maximum(jnp.linalg.norm(g0), 1e-12)
    tmp = jnp.where(
        jnp.abs(a[2]) > 1.0 - 1e-6,
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
    )
    b = tmp - a * jnp.dot(a, tmp)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
    c = jnp.cross(a, b)
    return jnp.stack([b, c], axis=1)


class AlignmentInput(NamedTuple):
    """A window of W odometry frames with preintegrations between them.

    rotations/translations: laser poses (W, 4)/(W, 3); delta_p/delta_v: IMU
    preintegrated deltas between frame i and i+1 stored at index i+1 (W, 3);
    dts: preintegration spans (W,); pair_mask: validity of pair (i, i+1)
    stored at i+1 (W,).
    """

    rotations: jnp.ndarray
    translations: jnp.ndarray
    delta_p: jnp.ndarray
    delta_v: jnp.ndarray
    dts: jnp.ndarray
    pair_mask: jnp.ndarray


def _pair_terms(inp: AlignmentInput, tlb: jnp.ndarray):
    """Common per-pair quantities (frame_i R/T, frame_j R/T, etc.)."""
    r = quat_to_rotation_matrix(inp.rotations)  # (W, 3, 3)
    ri = r[:-1]
    rj = r[1:]
    ti = inp.translations[:-1]
    tj = inp.translations[1:]
    dt = inp.dts[1:]
    dp = inp.delta_p[1:]
    dv = inp.delta_v[1:]
    m = inp.pair_mask[1:].astype(jnp.float32)
    rit = jnp.swapaxes(ri, -1, -2)
    return ri, rj, rit, ti, tj, dt, dp, dv, m, tlb


def approximate_gravity(
    inp: AlignmentInput, tlb_pose: Rigid3, g_norm: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linear alignment LDLT solve (imu_lidar_initializer.cc:50-123).

    Unknowns x = [v_0..v_{W-1} (body frame), g]; returns (g, velocities, ok).
    """
    w = inp.rotations.shape[0]
    n_state = w * 3 + 3
    ri, rj, rit, ti, tj, dt, dp, dv, m, _ = _pair_terms(inp, tlb_pose.translation)
    tlb = tlb_pose.translation

    eye = jnp.eye(3, dtype=jnp.float32)
    # per-pair blocks (W-1, 6, 9) over unknowns [v_i, v_j, g]
    a_pv = -dt[:, None, None] * eye  # d r_p / d v_i
    a_pg = rit * (0.5 * dt * dt)[:, None, None]  # d r_p / d g
    b_p = (
        dp
        + jnp.einsum("kij,kj->ki", rit @ rj, jnp.broadcast_to(tlb, dp.shape))
        - tlb
        - jnp.einsum("kij,kj->ki", rit, tj - ti)
    )
    a_vv_i = -jnp.broadcast_to(eye, ri.shape)
    a_vv_j = rit @ rj
    a_vg = rit * dt[:, None, None]
    b_v = dv

    big_a = jnp.zeros((n_state, n_state), jnp.float32)
    big_b = jnp.zeros(n_state, jnp.float32)

    for k in range(w - 1):
        blk = jnp.zeros((6, 9), jnp.float32)
        blk = blk.at[0:3, 0:3].set(a_pv[k])
        blk = blk.at[0:3, 6:9].set(a_pg[k])
        blk = blk.at[3:6, 0:3].set(a_vv_i[k])
        blk = blk.at[3:6, 3:6].set(a_vv_j[k])
        blk = blk.at[3:6, 6:9].set(a_vg[k])
        rhs = jnp.concatenate([b_p[k], b_v[k]]) * m[k]
        blk = blk * m[k]
        ra = blk.T @ blk
        rb = blk.T @ rhs
        idx = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
        # scatter into the big system: v_i at 3k, v_j at 3k+3, g at end
        sl = [3 * k, 3 * k + 1, 3 * k + 2, 3 * k + 3, 3 * k + 4, 3 * k + 5,
              n_state - 3, n_state - 2, n_state - 1]
        sl = jnp.asarray(sl)
        big_a = big_a.at[sl[:, None], sl[None, :]].add(ra)
        big_b = big_b.at[sl].add(rb)

    big_a = big_a * 1000.0 + 1e-6 * jnp.eye(n_state)
    big_b = big_b * 1000.0
    x = jnp.linalg.solve(big_a, big_b)
    g = x[n_state - 3 :]
    velocities = x[: 3 * w].reshape(w, 3)
    ok = jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0
    return g, velocities, ok


def refine_gravity(
    inp: AlignmentInput,
    tlb_pose: Rigid3,
    g_norm: float,
    g_approx: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Norm-constrained refinement on the gravity tangent basis
    (imu_lidar_initializer.cc:126-210). Returns (g, velocities)."""
    w = inp.rotations.shape[0]
    n_state = w * 3 + 2
    ri, rj, rit, ti, tj, dt, dp, dv, m, _ = _pair_terms(inp, tlb_pose.translation)
    tlb = tlb_pose.translation
    eye = jnp.eye(3, dtype=jnp.float32)

    def one_round(g0, _):
        lxly = tangent_basis(g0)  # (3, 2)
        big_a = jnp.zeros((n_state, n_state), jnp.float32)
        big_b = jnp.zeros(n_state, jnp.float32)
        for k in range(w - 1):
            blk = jnp.zeros((6, 8), jnp.float32)
            blk = blk.at[0:3, 0:3].set(-dt[k] * eye)
            blk = blk.at[0:3, 6:8].set(rit[k] @ lxly * (0.5 * dt[k] * dt[k]))
            blk = blk.at[3:6, 0:3].set(-eye)
            blk = blk.at[3:6, 3:6].set(rit[k] @ rj[k])
            blk = blk.at[3:6, 6:8].set(rit[k] @ lxly * dt[k])
            bp = (
                dp[k]
                + rit[k] @ rj[k] @ tlb
                - tlb
                - rit[k] @ (0.5 * dt[k] * dt[k] * g0)
                - rit[k] @ (tj[k] - ti[k])
            )
            bv = dv[k] - rit[k] @ (dt[k] * g0)
            rhs = jnp.concatenate([bp, bv]) * m[k]
            blk = blk * m[k]
            ra = blk.T @ blk
            rb = blk.T @ rhs
            sl = jnp.asarray(
                [3 * k, 3 * k + 1, 3 * k + 2, 3 * k + 3, 3 * k + 4, 3 * k + 5,
                 n_state - 2, n_state - 1]
            )
            big_a = big_a.at[sl[:, None], sl[None, :]].add(ra)
            big_b = big_b.at[sl].add(rb)
        big_a = big_a * 1000.0 + 1e-6 * jnp.eye(n_state)
        big_b = big_b * 1000.0
        x = jnp.linalg.solve(big_a, big_b)
        dg = x[n_state - 2 :]
        g_new = g0 + lxly @ dg
        g_new = g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-12) * g_norm
        return g_new, x[: 3 * w].reshape(w, 3)

    g0 = g_approx / jnp.maximum(jnp.linalg.norm(g_approx), 1e-12) * g_norm
    g_final, vs = g0, jnp.zeros((w, 3), jnp.float32)
    for _ in range(4):
        g_final, vs = one_round(g_final, None)
    return g_final, vs


def initialize_dynamic(
    inp: AlignmentInput, tlb_pose: Rigid3, g_norm: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Initializer::Initialization (imu_lidar_initializer.cc:213-229):
    approximate solve, tangent-basis refinement, success check.
    Returns (g, velocities, ok)."""
    g, _, ok0 = approximate_gravity(inp, tlb_pose, g_norm)
    g_ref, vs = refine_gravity(inp, tlb_pose, g_norm, g)
    # refine_gravity renormalizes to exactly g_norm, so a norm gate there is
    # vacuous; instead reject refinements that swing far from the
    # approximate direction (poor excitation that barely passed ok0's
    # |norm - g| < 1 gate diverges direction-wise during refinement)
    cos = jnp.dot(g_ref, g) / jnp.maximum(
        jnp.linalg.norm(g_ref) * jnp.linalg.norm(g), 1e-12
    )
    ok = ok0 & (cos > 0.9)  # within ~25 degrees
    return g_ref, vs, ok


def estimate_gravity(
    inp: AlignmentInput,
    velocities: jnp.ndarray,  # (W, 3) known body-frame velocities
    tlb_pose: Rigid3,
    g_norm: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online gravity estimation with known velocities
    (gravity_estimator.cc:20-170). Returns (g, ok)."""
    w = inp.rotations.shape[0]
    ri, rj, rit, ti, tj, dt, dp, dv, m, _ = _pair_terms(inp, tlb_pose.translation)
    tlb = tlb_pose.translation
    vs_i = velocities[:-1]
    vs_j = velocities[1:]

    # Approximate: A (3x3) over g only.
    a_p = rit * (0.5 * dt * dt)[:, None, None]
    b_p = (
        dp
        + jnp.einsum("kij,kj->ki", rit @ rj, jnp.broadcast_to(tlb, dp.shape))
        - tlb
        - jnp.einsum("kij,kj->ki", rit, tj - ti)
        + dt[:, None] * vs_i
    )
    a_v = rit * dt[:, None, None]
    b_v = dv + vs_i - jnp.einsum("kij,kj->ki", rit @ rj, vs_j)

    mm = m[:, None, None]
    big_a = jnp.sum(
        jnp.swapaxes(a_p, 1, 2) @ a_p * mm + jnp.swapaxes(a_v, 1, 2) @ a_v * mm,
        axis=0,
    )
    big_b = jnp.sum(
        jnp.einsum("kji,kj->ki", a_p, b_p * m[:, None])
        + jnp.einsum("kji,kj->ki", a_v, b_v * m[:, None]),
        axis=0,
    )
    g = jnp.linalg.solve(big_a * 1000.0 + 1e-6 * jnp.eye(3), big_b * 1000.0)
    ok = jnp.abs(jnp.linalg.norm(g) - g_norm) < 0.5

    # Refine on the tangent basis (2 unknowns), 4 rounds.
    def one_round(g0):
        lxly = tangent_basis(g0)
        ap2 = a_p @ lxly  # (K, 3, 2)
        av2 = a_v @ lxly
        bp2 = b_p - jnp.einsum("kij,j->ki", a_p, g0)
        bv2 = b_v - jnp.einsum("kij,j->ki", a_v, g0)
        aa = jnp.sum(
            jnp.swapaxes(ap2, 1, 2) @ ap2 * mm
            + jnp.swapaxes(av2, 1, 2) @ av2 * mm,
            axis=0,
        )
        bb = jnp.sum(
            jnp.einsum("kji,kj->ki", ap2, bp2 * m[:, None])
            + jnp.einsum("kji,kj->ki", av2, bv2 * m[:, None]),
            axis=0,
        )
        dg = jnp.linalg.solve(aa * 1000.0 + 1e-6 * jnp.eye(2), bb * 1000.0)
        g_new = g0 + lxly @ dg
        return g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-12) * g_norm

    g0 = g / jnp.maximum(jnp.linalg.norm(g), 1e-12) * g_norm
    for _ in range(4):
        g0 = one_round(g0)
    return g0, ok
