"""IMU preintegration with midpoint integration and full 15x15 covariance.

TPU-native counterpart of the reference's VINS-Mono `IntegrationBase`
(`cartographer/mapping/internal/3d/initialization/integration_base.h`,
`midPointIntegration` :156-265) which D-LIOM uses for dynamic initialization,
and of the GTSAM `PreintegratedImuMeasurements` driving the window optimizer
(AddImuData, local_trajectory_builder_3d.cc:180-195) — one midpoint
preintegrator serves both roles here.

State ordering of the 15-dof error state (VINS O_P/O_R/O_V/O_BA/O_BG):
[delta_p (0:3), delta_theta (3:6), delta_v (6:9), d_ba (9:12), d_bg (12:15)].

All integration is a `lax.scan` over a fixed-capacity batch of samples with a
validity mask, so the per-scan IMU bridge compiles once.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dliom_tpu.common.config import ImuConfig
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_rotation_matrix,
    so3_hat,
)


class Preintegrated(NamedTuple):
    """Preintegrated IMU measurement between two keys."""

    delta_p: jnp.ndarray  # (3,)
    delta_q: jnp.ndarray  # (4,) wxyz
    delta_v: jnp.ndarray  # (3,)
    jacobian: jnp.ndarray  # (15, 15) d(state)/d(state0 incl. biases)
    covariance: jnp.ndarray  # (15, 15)
    dt: jnp.ndarray  # () total time
    ba: jnp.ndarray  # (3,) linearization accel bias
    bg: jnp.ndarray  # (3,) linearization gyro bias
    acc0: jnp.ndarray  # (3,) last accepted sample (midpoint partner)
    gyr0: jnp.ndarray  # (3,)
    count: jnp.ndarray  # () int32 number of samples integrated


def make_preintegrated(
    ba: jnp.ndarray, bg: jnp.ndarray, acc0: jnp.ndarray, gyr0: jnp.ndarray
) -> Preintegrated:
    return Preintegrated(
        delta_p=jnp.zeros(3, jnp.float32),
        delta_q=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        delta_v=jnp.zeros(3, jnp.float32),
        jacobian=jnp.eye(15, dtype=jnp.float32),
        covariance=jnp.zeros((15, 15), jnp.float32),
        dt=jnp.float32(0.0),
        ba=jnp.asarray(ba, jnp.float32),
        bg=jnp.asarray(bg, jnp.float32),
        acc0=jnp.asarray(acc0, jnp.float32),
        gyr0=jnp.asarray(gyr0, jnp.float32),
        count=jnp.int32(0),
    )


def noise_matrix(cfg: ImuConfig) -> jnp.ndarray:
    """18x18 process noise (integration_base.h IMUNoise ctor :18-33):
    blocks [acc_n, gyr_n, acc_n, gyr_n, ba_w, bg_w] squared."""
    d = jnp.asarray(
        [cfg.acc_noise] * 3
        + [cfg.gyr_noise] * 3
        + [cfg.acc_noise] * 3
        + [cfg.gyr_noise] * 3
        + [cfg.acc_bias_noise] * 3
        + [cfg.gyr_bias_noise] * 3,
        jnp.float32,
    )
    return jnp.diag(d * d)


# test override: None = auto (TPU -> pallas), True/False forces the path;
# _CHAIN_INTERPRET runs the kernel in interpreter mode (CPU equivalence tests)
FORCE_PALLAS_CHAIN = None
_CHAIN_INTERPRET = False


def _use_pallas_chain() -> bool:
    """The Pallas chain kernel runs on real TPU only; CPU (tests, virtual
    meshes) keeps the associative_scan path — both are exact. Platform
    resolution honors mesh-pinned `force_platform` contexts."""
    if FORCE_PALLAS_CHAIN is not None:
        return FORCE_PALLAS_CHAIN
    from dliom_tpu.common.platform import on_tpu

    return on_tpu()


def _pallas_affine_chain(f: jnp.ndarray, q: jnp.ndarray):
    """Sequential affine-map composition J <- F_i J, P <- F_i P F_i^T + Q_i
    as ONE Pallas kernel: the 15x15 blocks pad to native 128x128 MXU tiles
    and the whole chain runs in VMEM — M serial tiny-matmul dispatches (or
    log M associative-scan rounds) collapse into a single kernel launch.

    The grid iterates over steps; the outputs act as VMEM accumulators
    (same output block every step — TPU grids execute sequentially)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = f.shape[0]
    fp = jnp.zeros((m, 128, 128), jnp.float32).at[:, :15, :15].set(f)
    qp = jnp.zeros((m, 128, 128), jnp.float32).at[:, :15, :15].set(q)

    def kernel(f_ref, q_ref, a_out, p_out):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            a_out[...] = ((row == col) & (row < 15)).astype(jnp.float32)
            p_out[...] = jnp.zeros((128, 128), jnp.float32)

        fi = f_ref[0]
        a = a_out[...]
        p = p_out[...]
        fp_ = jnp.dot(fi, p, preferred_element_type=jnp.float32)
        a_out[...] = jnp.dot(fi, a, preferred_element_type=jnp.float32)
        p_out[...] = (
            jnp.dot(fp_, fi.T, preferred_element_type=jnp.float32) + q_ref[0]
        )

    a_final, p_final = pl.pallas_call(
        kernel,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, 128), jnp.float32),
            jax.ShapeDtypeStruct((128, 128), jnp.float32),
        ],
        interpret=_CHAIN_INTERPRET,
    )(fp, qp)
    return a_final[:15, :15], p_final[:15, :15]


def _midpoint_step(pre: Preintegrated, dt, acc1, gyr1, noise) -> Preintegrated:
    """One midPointIntegration step (integration_base.h:173-265)."""
    ba, bg = pre.ba, pre.bg
    un_gyr = 0.5 * (pre.gyr0 + gyr1) - bg
    dq_step = quat_from_axis_angle(un_gyr * dt)
    new_dq = quat_normalize(quat_multiply(pre.delta_q, dq_step))

    un_acc_0 = quat_rotate(pre.delta_q, pre.acc0 - ba)
    un_acc_1 = quat_rotate(new_dq, acc1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    new_dp = pre.delta_p + pre.delta_v * dt + 0.5 * un_acc * dt * dt
    new_dv = pre.delta_v + un_acc * dt

    # 15x15 error-state transition F and 15x18 noise mapping V
    # (integration_base.h:191-240).
    r0 = quat_to_rotation_matrix(pre.delta_q)
    r1 = quat_to_rotation_matrix(new_dq)
    rwx = so3_hat(un_gyr)
    ra0 = so3_hat(pre.acc0 - ba)
    ra1 = so3_hat(acc1 - ba)
    eye3 = jnp.eye(3, dtype=jnp.float32)

    f = jnp.zeros((15, 15), jnp.float32)
    f = f.at[0:3, 0:3].set(eye3)
    f = f.at[0:3, 3:6].set(
        -0.25 * r0 @ ra0 * dt * dt
        + -0.25 * r1 @ ra1 @ (eye3 - rwx * dt) * dt * dt
    )
    f = f.at[0:3, 6:9].set(eye3 * dt)
    f = f.at[0:3, 9:12].set(-0.25 * (r0 + r1) * dt * dt)
    f = f.at[0:3, 12:15].set(0.25 * r1 @ ra1 * dt * dt * dt)
    f = f.at[3:6, 3:6].set(eye3 - rwx * dt)
    f = f.at[3:6, 12:15].set(-eye3 * dt)
    f = f.at[6:9, 3:6].set(
        -0.5 * r0 @ ra0 * dt + -0.5 * r1 @ ra1 @ (eye3 - rwx * dt) * dt
    )
    f = f.at[6:9, 6:9].set(eye3)
    f = f.at[6:9, 9:12].set(-0.5 * (r0 + r1) * dt)
    f = f.at[6:9, 12:15].set(0.5 * r1 @ ra1 * dt * dt)
    f = f.at[9:12, 9:12].set(eye3)
    f = f.at[12:15, 12:15].set(eye3)

    v = jnp.zeros((15, 18), jnp.float32)
    v = v.at[0:3, 0:3].set(0.25 * r0 * dt * dt)
    v03 = -0.125 * r1 @ ra1 * dt * dt * dt
    v = v.at[0:3, 3:6].set(v03)
    v = v.at[0:3, 6:9].set(0.25 * r1 * dt * dt)
    v = v.at[0:3, 9:12].set(v03)
    v = v.at[3:6, 3:6].set(0.5 * eye3 * dt)
    v = v.at[3:6, 9:12].set(0.5 * eye3 * dt)
    v = v.at[6:9, 0:3].set(0.5 * r0 * dt)
    v63 = -0.25 * r1 @ ra1 * dt * dt
    v = v.at[6:9, 3:6].set(v63)
    v = v.at[6:9, 6:9].set(0.5 * r1 * dt)
    v = v.at[6:9, 9:12].set(v63)
    v = v.at[9:12, 12:15].set(eye3 * dt)
    v = v.at[12:15, 15:18].set(eye3 * dt)

    return pre._replace(
        delta_p=new_dp,
        delta_q=new_dq,
        delta_v=new_dv,
        jacobian=f @ pre.jacobian,
        covariance=f @ pre.covariance @ f.T + v @ noise @ v.T,
        dt=pre.dt + dt,
        acc0=acc1,
        gyr0=gyr1,
        count=pre.count + 1,
    )


def integrate_sequential(
    pre: Preintegrated,
    dts: jnp.ndarray,  # (M,)
    accs: jnp.ndarray,  # (M, 3)
    gyrs: jnp.ndarray,  # (M, 3)
    mask: jnp.ndarray,  # (M,)
    noise: jnp.ndarray,  # (18, 18)
) -> Preintegrated:
    """Reference-shaped sequential integration (propagate, :266-292).
    Kept as the ground truth for the batched path below."""

    def body(p, x):
        dt, acc, gyr, ok = x
        new = _midpoint_step(p, dt, acc, gyr, noise)
        out = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, p)
        return out, None

    out, _ = jax.lax.scan(body, pre, (dts, accs, gyrs, mask))
    return out


def integrate(
    pre: Preintegrated,
    dts: jnp.ndarray,  # (M,)
    accs: jnp.ndarray,  # (M, 3)
    gyrs: jnp.ndarray,  # (M, 3)
    mask: jnp.ndarray,  # (M,) must be a PREFIX mask (valid samples first)
    noise: jnp.ndarray,  # (18, 18)
) -> Preintegrated:
    """Batched integration, numerically identical to the sequential path.

    TPU-native restructuring: the only truly sequential part of midpoint
    preintegration is the tiny quaternion chain; everything heavy is
    reformulated batch-first —
      1. lax.scan over the quaternion increments only (cheap vector ops);
      2. position/velocity deltas as cumulative sums of batched terms;
      3. the 15x15 error-state chain J_n = F_n ... F_1 and the covariance
         recurrence P_k = F P F^T + V N V^T as an `associative_scan` over
         the affine maps (F, Q) — log2(M) rounds of batched matmuls on the
         MXU instead of M serial 15x15 products.
    """
    m = dts.shape[0]
    okf = mask.astype(jnp.float32)[:, None]
    dt = jnp.where(mask, dts, 0.0)
    ba, bg = pre.ba, pre.bg

    # previous-sample pairs (prefix-masked stream)
    acc_prev = jnp.concatenate([pre.acc0[None], accs[:-1]], axis=0)
    gyr_prev = jnp.concatenate([pre.gyr0[None], gyrs[:-1]], axis=0)

    # 1. quaternion chain: a prefix product of unit quaternions. Hamilton
    #    product is associative, so the M-step serial scan (≈10 us/step of
    #    pure loop overhead on TPU) becomes log2(M) rounds of batched
    #    4-vector products; masked steps contribute the identity. Combines
    #    renormalize, mirroring the sequential per-step normalization.
    un_gyr = 0.5 * (gyr_prev + gyrs) - bg
    dq_steps = quat_from_axis_angle(un_gyr * dt[:, None])
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], dq_steps.dtype)
    steps = jnp.where(mask[:, None], dq_steps, ident)

    def qcomb(a, b):
        return quat_normalize(quat_multiply(a, b))

    prefix = jax.lax.associative_scan(qcomb, steps)
    q_all = quat_normalize(quat_multiply(pre.delta_q[None], prefix))
    q_final = q_all[-1]
    q_prev = jnp.concatenate([pre.delta_q[None], q_all[:-1]], axis=0)

    # 2. batched translation/velocity chains
    un_acc_0 = quat_rotate(q_prev, acc_prev - ba)
    un_acc_1 = quat_rotate(q_all, accs - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1) * okf
    dv_steps = un_acc * dt[:, None]
    v_all = pre.delta_v + jnp.cumsum(dv_steps, axis=0)
    v_prev = jnp.concatenate([pre.delta_v[None], v_all[:-1]], axis=0)
    dp_steps = v_prev * dt[:, None] + 0.5 * un_acc * (dt * dt)[:, None]
    p_final = pre.delta_p + jnp.sum(dp_steps, axis=0)
    v_final = v_all[-1]

    # 3. batched F/V construction + associative affine composition
    r0 = quat_to_rotation_matrix(q_prev)
    r1 = quat_to_rotation_matrix(q_all)
    rwx = jax.vmap(so3_hat)(un_gyr)
    ra0 = jax.vmap(so3_hat)(acc_prev - ba)
    ra1 = jax.vmap(so3_hat)(accs - ba)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    dtc = dt[:, None, None]

    # Block CONCATENATION, not .at[...].set chains: each DUS on an
    # (m, 15, ·) operand rewrites the whole (8, 128)-tile-padded buffer —
    # ~22 sequential 4.7 ms ops at B=4 on v5e (profiled: 18% of the batched
    # step). Concats fuse into one materialization.
    ii = jnp.broadcast_to(eye3, r0.shape)
    zz = jnp.zeros_like(r0)

    def brow(*blocks):
        return jnp.concatenate(blocks, axis=-1)

    f01 = (
        -0.25 * r0 @ ra0 * dtc * dtc
        + -0.25 * r1 @ ra1 @ (eye3 - rwx * dtc) * dtc * dtc
    )
    f21 = -0.5 * r0 @ ra0 * dtc + -0.5 * r1 @ ra1 @ (eye3 - rwx * dtc) * dtc
    f = jnp.concatenate(
        [
            brow(ii, f01, ii * dtc, -0.25 * (r0 + r1) * dtc * dtc,
                 0.25 * r1 @ ra1 * dtc * dtc * dtc),
            brow(zz, ii - rwx * dtc, zz, zz, -ii * dtc),
            brow(zz, f21, ii, -0.5 * (r0 + r1) * dtc,
                 0.5 * r1 @ ra1 * dtc * dtc),
            brow(zz, zz, zz, ii, zz),
            brow(zz, zz, zz, zz, ii),
        ],
        axis=-2,
    )

    v03 = -0.125 * r1 @ ra1 * dtc * dtc * dtc
    v63 = -0.25 * r1 @ ra1 * dtc * dtc
    v = jnp.concatenate(
        [
            brow(0.25 * r0 * dtc * dtc, v03, 0.25 * r1 * dtc * dtc, v03,
                 zz, zz),
            brow(zz, 0.5 * ii * dtc, zz, 0.5 * ii * dtc, zz, zz),
            brow(0.5 * r0 * dtc, v63, 0.5 * r1 * dtc, v63, zz, zz),
            brow(zz, zz, zz, zz, ii * dtc, zz),
            brow(zz, zz, zz, zz, zz, ii * dtc),
        ],
        axis=-2,
    )

    q_noise = v @ noise @ jnp.swapaxes(v, 1, 2)
    # masked steps compose as the identity map
    eye15 = jnp.eye(15, dtype=jnp.float32)
    f = jnp.where(mask[:, None, None], f, eye15)
    q_noise = jnp.where(mask[:, None, None], q_noise, 0.0)

    if _use_pallas_chain():
        f_total, q_total = _pallas_affine_chain(f, q_noise)
    else:
        def combine(a, b):
            fa, qa = a
            fb, qb = b
            return fb @ fa, fb @ qa @ jnp.swapaxes(fb, -1, -2) + qb

        f_cum, q_cum = jax.lax.associative_scan(combine, (f, q_noise), axis=0)
        f_total = f_cum[-1]
        q_total = q_cum[-1]

    n_valid = jnp.sum(mask.astype(jnp.int32))
    last = jnp.maximum(n_valid - 1, 0)
    has = n_valid > 0
    return pre._replace(
        delta_p=p_final,
        delta_q=q_final,
        delta_v=v_final,
        jacobian=f_total @ pre.jacobian,
        covariance=f_total @ pre.covariance @ f_total.T + q_total,
        dt=pre.dt + jnp.sum(dt),
        acc0=jnp.where(has, accs[last], pre.acc0),
        gyr0=jnp.where(has, gyrs[last], pre.gyr0),
        count=pre.count + n_valid,
    )


class NavState(NamedTuple):
    """World-frame navigation state (gtsam::NavState analog)."""

    rotation: jnp.ndarray  # (4,) wxyz, body->world
    position: jnp.ndarray  # (3,)
    velocity: jnp.ndarray  # (3,)

    @property
    def pose(self) -> Rigid3:
        return Rigid3(self.rotation, self.position)

    @staticmethod
    def identity() -> "NavState":
        return NavState(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32),
        )


def predict(state: NavState, pre: Preintegrated, gravity: float) -> NavState:
    """Forward prediction (gtsam PreintegratedImuMeasurements::predict):
    world gravity g = (0, 0, -gravity)."""
    g = jnp.asarray([0.0, 0.0, -gravity], jnp.float32)
    dt = pre.dt
    rot = state.rotation
    return NavState(
        rotation=quat_normalize(quat_multiply(rot, pre.delta_q)),
        position=state.position
        + state.velocity * dt
        + 0.5 * g * dt * dt
        + quat_rotate(rot, pre.delta_p),
        velocity=state.velocity + g * dt + quat_rotate(rot, pre.delta_v),
    )


def bias_corrected_deltas(
    pre: Preintegrated, ba: jnp.ndarray, bg: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order bias-corrected (delta_p, delta_q, delta_v)
    (integration_base.h evaluate())."""
    dba = ba - pre.ba
    dbg = bg - pre.bg
    dp_dba = pre.jacobian[0:3, 9:12]
    dp_dbg = pre.jacobian[0:3, 12:15]
    dq_dbg = pre.jacobian[3:6, 12:15]
    dv_dba = pre.jacobian[6:9, 9:12]
    dv_dbg = pre.jacobian[6:9, 12:15]
    corrected_p = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg
    corrected_v = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    corrected_q = quat_normalize(
        quat_multiply(pre.delta_q, quat_from_axis_angle(dq_dbg @ dbg))
    )
    return corrected_p, corrected_q, corrected_v
