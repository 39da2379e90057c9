"""Tightly-coupled sliding-window factor-graph optimizer.

TPU-native counterpart of the reference's GTSAM ISAM2 window
(`LocalTrajectoryBuilder3D::WindowOptimize`,
local_trajectory_builder_3d.cc:693-863). The reference grows an ISAM2 graph —
per key an `ImuFactor`, a bias `BetweenFactor`, and a scan-match
`PriorFactor<Pose3>` (+ optional gravity factor) — and every
`num_range_data` keys resets it, carrying the last state over as priors with
its marginal covariance (:750-797).

Here the same estimation problem is a *fixed-lag smoother*: a dense window of
W keys, each (q, p, v, ba, bg); when a key slides out it is marginalized
exactly (Schur complement), leaving an information-form prior on the new
head — the same operation as the reference's reset, performed every scan
instead of every 100. Incremental (ISAM2) relinearization is unnecessary at
this window size: a fixed-count Gauss-Newton over all 15W variables is one
small dense solve on device.

Factor residuals:
  * IMU (15-dim, VINS `evaluate()` form — algebraically the reference's
    gtsam ImuFactor (9) + bias BetweenFactor (6) combined; the bias
    random-walk weighting comes from the preintegration covariance instead
    of the reference's sqrt(dt)*sigma diagonal);
  * scan-match pose prior (6-dim, correction_noise_ /
    correction_noise_2_ when degenerate, ctor :94-101);
  * gravity attitude factor (yaw-independent, gravity_factor.cc:10-31);
  * head prior (15-dim, information form).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dliom_tpu.common.config import ImuConfig
from dliom_tpu.imu.preintegration import (
    NavState,
    Preintegrated,
    bias_corrected_deltas,
)
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_inverse_rotate,
    quat_remove_yaw,
    quat_rotate,
    quat_to_axis_angle,
)

# tangent layout per key: [dp 0:3, dtheta 3:6, dv 6:9, dba 9:12, dbg 12:15]
KEY_DIM = 15


class WindowState(NamedTuple):
    """Dense sliding window; index 0 = oldest key. Slots beyond num_keys are
    inactive padding."""

    q: jnp.ndarray  # (W, 4)
    p: jnp.ndarray  # (W, 3)
    v: jnp.ndarray  # (W, 3)
    ba: jnp.ndarray  # (W, 3)
    bg: jnp.ndarray  # (W, 3)
    # scan-match observation per key
    obs_q: jnp.ndarray  # (W, 4)
    obs_t: jnp.ndarray  # (W, 3)
    obs_drift: jnp.ndarray  # (W,) bool — use the drift noise model
    obs_valid: jnp.ndarray  # (W,) bool — key has a scan-match observation
    # preintegrated IMU between key i-1 and key i (slot 0 unused)
    pre_p: jnp.ndarray  # (W, 3)
    pre_q: jnp.ndarray  # (W, 4)
    pre_v: jnp.ndarray  # (W, 3)
    pre_jac: jnp.ndarray  # (W, 15, 15)
    pre_sqrt_info: jnp.ndarray  # (W, 9, 9) whitener of the (p, theta, v) block
    pre_ba: jnp.ndarray  # (W, 3) linearization biases
    pre_bg: jnp.ndarray  # (W, 3)
    pre_dt: jnp.ndarray  # (W,)
    # gravity measurement (direction in world) per key
    grav_dir: jnp.ndarray  # (W, 3)
    grav_valid: jnp.ndarray  # (W,) bool
    # information-form prior on key 0
    prior_sqrt_info: jnp.ndarray  # (15, 15)
    prior_q: jnp.ndarray  # (4,)
    prior_p: jnp.ndarray  # (3,)
    prior_v: jnp.ndarray  # (3,)
    prior_ba: jnp.ndarray  # (3,)
    prior_bg: jnp.ndarray  # (3,)
    num_keys: jnp.ndarray  # () int32

    @property
    def window(self) -> int:
        return self.q.shape[0]


def make_window(
    w: int, initial: NavState, ba: jnp.ndarray, bg: jnp.ndarray, cfg: ImuConfig
) -> WindowState:
    """Bootstrap with the initializer's state as key 0 under the initial
    priors (WindowOptimize first-call block, :712-746)."""
    qs = jnp.tile(initial.rotation, (w, 1))
    prior_sigmas = jnp.asarray(
        [cfg.prior_pose_noise] * 6
        + [cfg.prior_vel_noise] * 3
        + [cfg.prior_bias_noise] * 6,
        jnp.float32,
    )
    return WindowState(
        q=qs,
        p=jnp.tile(initial.position, (w, 1)),
        v=jnp.tile(initial.velocity, (w, 1)),
        ba=jnp.tile(jnp.asarray(ba, jnp.float32), (w, 1)),
        bg=jnp.tile(jnp.asarray(bg, jnp.float32), (w, 1)),
        obs_q=qs,
        obs_t=jnp.tile(initial.position, (w, 1)),
        obs_drift=jnp.zeros(w, bool),
        obs_valid=jnp.zeros(w, bool),
        pre_p=jnp.zeros((w, 3), jnp.float32),
        pre_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (w, 1)),
        pre_v=jnp.zeros((w, 3), jnp.float32),
        pre_jac=jnp.tile(jnp.eye(15, dtype=jnp.float32), (w, 1, 1)),
        pre_sqrt_info=jnp.tile(jnp.eye(9, dtype=jnp.float32), (w, 1, 1)),
        pre_ba=jnp.tile(jnp.asarray(ba, jnp.float32), (w, 1)),
        pre_bg=jnp.tile(jnp.asarray(bg, jnp.float32), (w, 1)),
        pre_dt=jnp.zeros(w, jnp.float32),
        grav_dir=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (w, 1)),
        grav_valid=jnp.zeros(w, bool),
        prior_sqrt_info=jnp.diag(1.0 / prior_sigmas),
        prior_q=initial.rotation,
        prior_p=initial.position,
        prior_v=initial.velocity,
        prior_ba=jnp.asarray(ba, jnp.float32),
        prior_bg=jnp.asarray(bg, jnp.float32),
        num_keys=jnp.int32(1),
    )


def sqrt_information(cov: jnp.ndarray) -> jnp.ndarray:
    """Whitener L^-1 (cov = L L^T) with relative jitter, f32-safe."""
    n = cov.shape[0]
    jitter = 1e-6 * jnp.maximum(jnp.max(jnp.diag(cov)), 1e-12)
    c = cov + jitter * jnp.eye(n, dtype=cov.dtype)
    l = jnp.linalg.cholesky(c)
    inv_l = jax.scipy.linalg.solve_triangular(
        l, jnp.eye(n, dtype=cov.dtype), lower=True
    )
    return inv_l  # r_whitened = L^-1 r


def _states_apply_delta(state: WindowState, delta: jnp.ndarray) -> WindowState:
    """delta (W*15,) -> perturbed window (left-multiplicative rotation)."""
    w = state.window
    d = delta.reshape(w, KEY_DIM)
    dq = quat_from_axis_angle(d[:, 3:6])
    return state._replace(
        q=quat_normalize(quat_multiply(dq, state.q)),
        p=state.p + d[:, 0:3],
        v=state.v + d[:, 6:9],
        ba=state.ba + d[:, 9:12],
        bg=state.bg + d[:, 12:15],
    )


def _imu_residual(
    state: WindowState, i: int | jnp.ndarray, gravity: float, cfg_bias_sigmas
):
    """15-dim IMU residual between keys i-1 and i: VINS evaluate() for the
    (p, theta, v) block + reference-style bias between residual."""
    g = jnp.asarray([0.0, 0.0, -gravity], jnp.float32)
    qi, pi, vi = state.q[i - 1], state.p[i - 1], state.v[i - 1]
    bai, bgi = state.ba[i - 1], state.bg[i - 1]
    qj, pj, vj = state.q[i], state.p[i], state.v[i]
    baj, bgj = state.ba[i], state.bg[i]
    pre = Preintegrated(
        delta_p=state.pre_p[i],
        delta_q=state.pre_q[i],
        delta_v=state.pre_v[i],
        jacobian=state.pre_jac[i],
        covariance=jnp.eye(15),  # unused here
        dt=state.pre_dt[i],
        ba=state.pre_ba[i],
        bg=state.pre_bg[i],
        acc0=jnp.zeros(3),
        gyr0=jnp.zeros(3),
        count=jnp.int32(0),
    )
    cp, cq, cv = bias_corrected_deltas(pre, bai, bgi)
    dt = state.pre_dt[i]
    r_p = quat_inverse_rotate(qi, pj - pi - vi * dt - 0.5 * g * dt * dt) - cp
    dq_meas = quat_multiply(quat_conjugate(cq), quat_multiply(quat_conjugate(qi), qj))
    r_q = 2.0 * jnp.where(dq_meas[0] < 0, -dq_meas, dq_meas)[1:4]
    r_v = quat_inverse_rotate(qi, vj - vi - g * dt) - cv
    # (p, theta, v) block whitened by the preintegration covariance; bias
    # random walk as a separate diagonal-weighted between-residual
    # (the reference structure: gtsam ImuFactor + BetweenFactor with
    # sqrt(deltaTij) * noise_model_between_bias_, :802-813).
    r_pqv = state.pre_sqrt_info[i] @ jnp.concatenate([r_p, r_q, r_v])
    sdt = jnp.sqrt(jnp.maximum(dt, 1e-3))
    r_ba = (baj - bai) / (sdt * cfg_bias_sigmas[0])
    r_bg = (bgj - bgi) / (sdt * cfg_bias_sigmas[1])
    return jnp.concatenate([r_pqv, r_ba, r_bg])


def _pose_prior_residual(state: WindowState, i, cfg: ImuConfig):
    """Scan-match pose prior (PriorFactor<Pose3> w/ correction_noise_)."""
    sig_t = jnp.where(
        state.obs_drift[i], cfg.ceres_pose_noise_t_drift, cfg.ceres_pose_noise_t
    )
    sig_r = jnp.where(
        state.obs_drift[i], cfg.ceres_pose_noise_r_drift, cfg.ceres_pose_noise_r
    )
    r_t = (state.p[i] - state.obs_t[i]) / sig_t
    dq = quat_multiply(quat_conjugate(state.obs_q[i]), state.q[i])
    r_r = quat_to_axis_angle(dq) / sig_r
    return jnp.where(state.obs_valid[i], jnp.concatenate([r_t, r_r]), 0.0)


def _gravity_residual(state: WindowState, i, cfg: ImuConfig):
    """Gravity attitude factor (gravity_factor.cc:10-31): compare the
    measured gravity direction in the nav frame with the yaw-removed body-z
    reference; yaw explicitly does not participate."""
    q_yawless = quat_remove_yaw(state.q[i])
    b_ref = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    predicted = quat_rotate(q_yawless, b_ref)
    # 2-dof error in the tangent of the unit sphere ≈ cross product for
    # small angles; weight by the configured gravity noise.
    err = jnp.cross(predicted, state.grav_dir[i])
    valid = state.grav_valid[i]
    return jnp.where(valid, err / cfg.prior_gravity_noise, 0.0)


def _prior_residual(state: WindowState):
    dp = state.p[0] - state.prior_p
    dq = quat_multiply(quat_conjugate(state.prior_q), state.q[0])
    dth = quat_to_axis_angle(dq)
    dv = state.v[0] - state.prior_v
    dba = state.ba[0] - state.prior_ba
    dbg = state.bg[0] - state.prior_bg
    raw = jnp.concatenate([dp, dth, dv, dba, dbg])
    return state.prior_sqrt_info @ raw


def _all_residuals(state: WindowState, cfg: ImuConfig, gravity: float):
    """All factor residuals, flattened. Per-key factors are evaluated as ONE
    vmapped batch each (not a Python loop): the window GN is latency-bound
    on TPU, so op count — not FLOPs — sets its cost."""
    w = state.window
    active = jnp.arange(w) < state.num_keys
    bias_sigmas = (cfg.acc_bias_noise, cfg.gyr_bias_noise)
    r_imu = jax.vmap(
        lambda i: _imu_residual(state, i, gravity, bias_sigmas)
    )(jnp.arange(1, w))
    r_imu = jnp.where(active[1:, None], r_imu, 0.0)
    r_pose = jax.vmap(lambda i: _pose_prior_residual(state, i, cfg))(
        jnp.arange(w)
    )
    r_pose = jnp.where(active[:, None], r_pose, 0.0)
    r_grav = jax.vmap(lambda i: _gravity_residual(state, i, cfg))(
        jnp.arange(w)
    )
    r_grav = jnp.where(active[:, None], r_grav, 0.0)
    return jnp.concatenate(
        [_prior_residual(state), r_imu.reshape(-1), r_pose.reshape(-1),
         r_grav.reshape(-1)]
    )


def optimize(
    state: WindowState, cfg: ImuConfig, gravity: float, iterations: int = 8
) -> WindowState:
    """Fixed-count Gauss-Newton over the whole window."""
    w = state.window
    n = w * KEY_DIM
    zero = jnp.zeros(n, jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    active_keys = (jnp.arange(w) < state.num_keys)
    active_mask = jnp.repeat(active_keys, KEY_DIM)

    def gn_iter(s, _):
        def res(d):
            return _all_residuals(_states_apply_delta(s, d), cfg, gravity)

        r, jvp = jax.linearize(res, zero)
        jac = jax.vmap(jvp, in_axes=1, out_axes=1)(eye)  # (M, n)
        jac = jac * active_mask[None, :]
        h = jac.T @ jac
        g = jac.T @ r
        # Jacobi preconditioning keeps the f32 solve well-scaled across the
        # wildly different variable magnitudes (meters vs bias rad/s).
        d = jnp.sqrt(jnp.clip(jnp.diag(h), 1e-12, None))
        hs = h / d[:, None] / d[None, :] + 1e-5 * eye
        gs = g / d
        # hs is damped-SPD (J^T J + 1e-5 I): Cholesky solve — no pivoting
        # (LU's row pivots serialize badly on TPU) and half the flops
        delta = (
            -jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(hs, lower=True), gs
            )
            / d
        )
        delta = jnp.where(active_mask, delta, 0.0)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        # simple step clamp for robustness
        delta = jnp.clip(delta, -1.0, 1.0)
        return _states_apply_delta(s, delta), None

    state, _ = jax.lax.scan(gn_iter, state, None, length=iterations, unroll=True)
    return state


# Exact Schur marginalization of slid-out keys accumulates over-confident,
# linearization-stale information (first-estimates-Jacobian inconsistency,
# amplified in f32) and was measured to drift; the default instead anchors
# the new head softly at its current estimate — the scan-match pose prior
# re-anchors pose every scan and biases stay softly pinned while still
# adapting. The exact path is kept for study.
EXACT_MARGINALIZATION = False

ANCHOR_POSE_SIGMA = 1.0  # m / rad: weak, the per-scan pose obs dominates
ANCHOR_VEL_SIGMA = 1.0  # m/s


def _drop_oldest(state: WindowState, cfg: ImuConfig) -> WindowState:
    """Slide the window, anchoring the new head at its current estimate."""
    state = _shift_window(state)
    sig = jnp.asarray(
        [ANCHOR_POSE_SIGMA] * 6
        + [ANCHOR_VEL_SIGMA] * 3
        + [cfg.prior_bias_noise] * 6,
        jnp.float32,
    )
    return state._replace(
        prior_sqrt_info=jnp.diag(1.0 / sig),
        prior_q=state.q[0],
        prior_p=state.p[0],
        prior_v=state.v[0],
        prior_ba=state.ba[0],
        prior_bg=state.bg[0],
    )


def push_key(
    state: WindowState,
    pre: Preintegrated,
    predicted: NavState,
    obs_pose: Rigid3,
    obs_drift: jnp.ndarray,
    grav_dir: jnp.ndarray,
    grav_valid: jnp.ndarray,
    cfg: ImuConfig,
    gravity: float,
) -> WindowState:
    """Append a key (WindowOptimize per-scan block :800-840). When the
    window is full, the oldest key is first marginalized into the head prior
    (the reference's marginal-covariance reset, done incrementally)."""
    w = state.window
    full = state.num_keys >= w

    slide = (
        (lambda s: _marginalize_oldest(s, cfg, gravity))
        if EXACT_MARGINALIZATION
        else (lambda s: _drop_oldest(s, cfg))
    )
    state = jax.lax.cond(full, slide, lambda s: s, state)
    idx = jnp.minimum(state.num_keys, w - 1)

    # IMU-dropout guard: an empty preintegration (no samples -> dt == 0,
    # covariance == 0) would whiten with ~1e9 off the jitter floor, pinning
    # the key to its predecessor and overpowering the scan-match
    # observation. Zero-weight the IMU factor instead — the pose prior and
    # neighbors still constrain the key.
    sqrt_info = jnp.where(
        pre.dt > 0.0,
        sqrt_information(pre.covariance[0:9, 0:9]),
        jnp.zeros((9, 9), jnp.float32),
    )

    def set_row(arr, value):
        return arr.at[idx].set(value)

    state = state._replace(
        q=set_row(state.q, predicted.rotation),
        p=set_row(state.p, predicted.position),
        v=set_row(state.v, predicted.velocity),
        ba=set_row(state.ba, state.ba[idx - 1]),
        bg=set_row(state.bg, state.bg[idx - 1]),
        obs_q=set_row(state.obs_q, obs_pose.rotation),
        obs_t=set_row(state.obs_t, obs_pose.translation),
        obs_drift=state.obs_drift.at[idx].set(obs_drift),
        obs_valid=state.obs_valid.at[idx].set(True),
        pre_p=set_row(state.pre_p, pre.delta_p),
        pre_q=set_row(state.pre_q, pre.delta_q),
        pre_v=set_row(state.pre_v, pre.delta_v),
        pre_jac=state.pre_jac.at[idx].set(pre.jacobian),
        pre_sqrt_info=state.pre_sqrt_info.at[idx].set(sqrt_info),
        pre_ba=set_row(state.pre_ba, pre.ba),
        pre_bg=set_row(state.pre_bg, pre.bg),
        pre_dt=state.pre_dt.at[idx].set(pre.dt),
        grav_dir=set_row(state.grav_dir, grav_dir),
        grav_valid=state.grav_valid.at[idx].set(grav_valid),
        num_keys=jnp.minimum(state.num_keys + 1, w),
    )
    return state


def _shift_window(state: WindowState) -> WindowState:
    """Drop key 0; shift everything left by one."""

    def shift(arr):
        return jnp.roll(arr, -1, axis=0)

    return state._replace(
        q=shift(state.q),
        p=shift(state.p),
        v=shift(state.v),
        ba=shift(state.ba),
        bg=shift(state.bg),
        obs_q=shift(state.obs_q),
        obs_t=shift(state.obs_t),
        obs_drift=shift(state.obs_drift),
        obs_valid=shift(state.obs_valid),
        pre_p=shift(state.pre_p),
        pre_q=shift(state.pre_q),
        pre_v=shift(state.pre_v),
        pre_jac=shift(state.pre_jac),
        pre_sqrt_info=shift(state.pre_sqrt_info),
        pre_ba=shift(state.pre_ba),
        pre_bg=shift(state.pre_bg),
        pre_dt=shift(state.pre_dt),
        grav_dir=shift(state.grav_dir),
        grav_valid=shift(state.grav_valid),
        num_keys=state.num_keys - 1,
    )


def _marginalize_oldest(
    state: WindowState, cfg: ImuConfig, gravity: float
) -> WindowState:
    """Exact marginalization of key 0 onto key 1 (Schur complement of the
    factors touching key 0: head prior, IMU(0->1), pose prior(0), gravity(0)).
    This is the reference's marginal-covariance carry-over
    (local_trajectory_builder_3d.cc:750-765) as an incremental operation."""
    # Residuals over (key0, key1) as a function of their 30-dim tangent.
    zero = jnp.zeros(2 * KEY_DIM, jnp.float32)
    eye = jnp.eye(2 * KEY_DIM, dtype=jnp.float32)

    def res(d):
        pert = _states_apply_delta(
            state, jnp.concatenate([d, jnp.zeros((state.window - 2) * KEY_DIM)])
        )
        return jnp.concatenate(
            [
                _prior_residual(pert),
                _imu_residual(pert, 1, gravity, (cfg.acc_bias_noise, cfg.gyr_bias_noise)),
                _pose_prior_residual(pert, 0, cfg),
                _gravity_residual(pert, 0, cfg),
            ]
        )

    r, jvp = jax.linearize(res, zero)
    jac = jax.vmap(jvp, in_axes=1, out_axes=1)(eye)
    h = jac.T @ jac
    g = jac.T @ r
    # Jacobi scaling over the joint 30-dim system for f32 robustness.
    d = jnp.sqrt(jnp.clip(jnp.diag(h), 1e-8, None))
    hs = h / d[:, None] / d[None, :]
    gs = g / d
    h00 = hs[:KEY_DIM, :KEY_DIM] + 1e-5 * jnp.eye(KEY_DIM)
    h01 = hs[:KEY_DIM, KEY_DIM:]
    h11 = hs[KEY_DIM:, KEY_DIM:]
    g0 = gs[:KEY_DIM]
    g1 = gs[KEY_DIM:]
    h00_inv = jnp.linalg.inv(h00)
    hm_s = h11 - h01.T @ h00_inv @ h01
    gm_s = g1 - h01.T @ h00_inv @ g0
    d1 = d[KEY_DIM:]
    h_marg = hm_s * d1[:, None] * d1[None, :]
    g_marg = gm_s * d1
    # Convert (H, g) at the current linearization point into a prior with a
    # shifted mean: H (x ⊖ x1*) with x1* = x1 ⊖ H^-1 g.
    h_marg = 0.5 * (h_marg + h_marg.T)
    jitter = 1e-6 * jnp.maximum(jnp.max(jnp.diag(h_marg)), 1e-6)
    h_marg = h_marg + jitter * jnp.eye(KEY_DIM)
    mean_shift = -jnp.linalg.solve(h_marg, g_marg)
    mean_shift = jnp.clip(
        jnp.where(jnp.isfinite(mean_shift), mean_shift, 0.0), -1.0, 1.0
    )
    # sqrt of the information
    lq = jnp.linalg.cholesky(h_marg)
    sqrt_info = lq.T  # H = L L^T, residual = L^T (x ⊖ x*)
    sqrt_info = jnp.where(jnp.isfinite(sqrt_info), sqrt_info, 0.0)

    # Shifted linearization point of key 1.
    dq = quat_from_axis_angle(mean_shift[3:6])
    new_prior_q = quat_normalize(quat_multiply(dq, state.q[1]))
    new_prior_p = state.p[1] + mean_shift[0:3]
    new_prior_v = state.v[1] + mean_shift[6:9]
    new_prior_ba = state.ba[1] + mean_shift[9:12]
    new_prior_bg = state.bg[1] + mean_shift[12:15]

    state = _shift_window(state)
    return state._replace(
        prior_sqrt_info=sqrt_info,
        prior_q=new_prior_q,
        prior_p=new_prior_p,
        prior_v=new_prior_v,
        prior_ba=new_prior_ba,
        prior_bg=new_prior_bg,
    )


def latest_state(state: WindowState) -> Tuple[NavState, jnp.ndarray, jnp.ndarray]:
    """(NavState, ba, bg) of the newest key."""
    i = state.num_keys - 1
    return (
        NavState(state.q[i], state.p[i], state.v[i]),
        state.ba[i],
        state.bg[i],
    )


def failure_detected(state: WindowState) -> jnp.ndarray:
    """FailureDetection (local_trajectory_builder_3d.cc:896-913):
    ||v|| > 30 m/s or ||ba||/||bg|| > 1.0."""
    i = state.num_keys - 1
    return (
        (jnp.linalg.norm(state.v[i]) > 30.0)
        | (jnp.linalg.norm(state.ba[i]) > 1.0)
        | (jnp.linalg.norm(state.bg[i]) > 1.0)
    )
