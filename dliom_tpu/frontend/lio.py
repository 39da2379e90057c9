"""The full tightly-coupled LIO frontend step: IMU prediction + deskew +
scan matching + sliding-window fusion + insertion.

This is the complete `LocalTrajectoryBuilder3D` equivalent (BASELINE config
#2): the per-scan flow of local_trajectory_builder_3d.cc with WindowOptimize
in the loop —

  AddImuData accumulation        -> preintegrate the scan's IMU bridge
  predict(prev_state, bias)      -> pose prediction + deskew relative motion
  AddRangeData / matching        -> frontend.local_trajectory_builder.step
  WindowOptimize (:693-863)      -> push key + window GN -> fused state
  FailureDetection (:896-913)    -> window re-anchor on divergence
  gravity estimation (:1106)     -> optional gravity factor measurement
  InsertIntoSubmap               -> under the fused pose

All of it is one compiled device step over fixed-capacity inputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dliom_tpu.common.config import TrajectoryBuilderConfig
from dliom_tpu.frontend.local_trajectory_builder import (
    FrontendState,
    ScanInput,
    ScanResult,
    make_initial_state,
    step,
)
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.imu import window_optimizer as wo
from dliom_tpu.imu.initialization import AlignmentInput, estimate_gravity
from dliom_tpu.transform.rigid import Rigid3, quat_inverse_rotate, quat_rotate


class LioState(NamedTuple):
    frontend: FrontendState
    window: wo.WindowState
    nav: pre.NavState  # prev_state_
    ba: jnp.ndarray
    bg: jnp.ndarray
    last_acc: jnp.ndarray  # midpoint partner carried across scans
    last_gyr: jnp.ndarray
    failures: jnp.ndarray  # int32 count of FailureDetection resets


class LioScanInput(NamedTuple):
    time: jnp.ndarray
    points: jnp.ndarray  # (N, 3)
    times: jnp.ndarray  # (N,)
    mask: jnp.ndarray  # (N,)
    imu_dts: jnp.ndarray  # (M,) sample spacings covering (prev scan, scan]
    imu_acc: jnp.ndarray  # (M, 3)
    imu_gyr: jnp.ndarray  # (M, 3)
    imu_mask: jnp.ndarray  # (M,)


class LioResult(NamedTuple):
    scan: ScanResult
    velocity: jnp.ndarray
    ba: jnp.ndarray
    bg: jnp.ndarray
    failed: jnp.ndarray
    gravity_valid: jnp.ndarray


def make_lio_state(
    cfg: TrajectoryBuilderConfig,
    initial: pre.NavState,
    ba: jnp.ndarray,
    bg: jnp.ndarray,
) -> LioState:
    """State after initialization (InitializeIMU,
    local_trajectory_builder_3d.cc:332-357)."""
    frontend = make_initial_state(cfg)
    frontend = frontend._replace(pose=initial.pose)
    g_body = quat_inverse_rotate(
        initial.rotation, jnp.asarray([0.0, 0.0, cfg.imu.gravity], jnp.float32)
    )
    return LioState(
        frontend=frontend,
        window=wo.make_window(cfg.window_size, initial, ba, bg, cfg.imu),
        nav=initial,
        ba=jnp.asarray(ba, jnp.float32),
        bg=jnp.asarray(bg, jnp.float32),
        last_acc=g_body + jnp.asarray(ba, jnp.float32),
        last_gyr=jnp.asarray(bg, jnp.float32),
        failures=jnp.int32(0),
    )


def _window_gravity(state: LioState, cfg: TrajectoryBuilderConfig):
    """Gravity measurement from the optimizer window (EstimateGravity,
    local_trajectory_builder_3d.cc:1106-1154): poses re-expressed in the
    window-start frame, velocities in body frames, linear solve; returns
    (direction_in_world, valid)."""
    win = state.window
    w = win.window
    t0 = Rigid3(win.q[0], win.p[0])
    t0_inv = t0.inverse()
    rel_q = jax.vmap(lambda q: t0_inv.compose(Rigid3(q, jnp.zeros(3))).rotation)(win.q)
    rel_p = jax.vmap(lambda p: t0_inv.apply(p))(win.p)
    v_body = jax.vmap(quat_inverse_rotate)(win.q, win.v)
    active = jnp.arange(w) < win.num_keys
    inp = AlignmentInput(
        rotations=rel_q,
        translations=rel_p,
        delta_p=win.pre_p,
        delta_v=win.pre_v,
        dts=win.pre_dt,
        pair_mask=active & (jnp.arange(w) > 0),
    )
    g_b, ok = estimate_gravity(inp, v_body, Rigid3.identity(), cfg.imu.gravity)
    # g solved in the window-start frame is the "up" specific force; world
    # gravity = R0 * (-g) (:1142-1144).
    g_world = quat_rotate(t0.rotation, -g_b)
    ok = ok & (g_world[2] + cfg.imu.gravity < 0.5)
    # need a full estimation window (g_est_transforms_ > win_size + 1)
    ok = ok & (win.num_keys >= jnp.int32(min(w, cfg.frames_for_online_gravity_estimate)))
    direction = g_world / jnp.maximum(jnp.linalg.norm(g_world), 1e-9)
    return direction, ok


def lio_step(
    state: LioState,
    inp: LioScanInput,
    cfg: TrajectoryBuilderConfig,
    defer_grid_writes: bool = False,
) -> Tuple[LioState, LioResult]:
    noise = pre.noise_matrix(cfg.imu)
    g_norm = cfg.imu.gravity

    # 1. Preintegrate the IMU bridge (AddImuData integration, :180-195).
    p0 = pre.make_preintegrated(state.ba, state.bg, state.last_acc, state.last_gyr)
    preint = pre.integrate(p0, inp.imu_dts, inp.imu_acc, inp.imu_gyr, inp.imu_mask, noise)
    predicted = pre.predict(state.nav, preint, g_norm)
    rel = state.nav.pose.inverse().compose(predicted.pose)

    # Optional gravity factor measurement from the current window.
    if cfg.enable_gravity_factor:
        grav_dir, grav_ok = _window_gravity(state, cfg)
    else:
        grav_dir = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
        grav_ok = jnp.bool_(False)

    def fuse(pose_estimate: Rigid3):
        win = wo.push_key(
            state.window,
            preint,
            predicted,
            pose_estimate,
            jnp.bool_(False),
            grav_dir,
            grav_ok,
            cfg.imu,
            g_norm,
        )
        win = wo.optimize(win, cfg.imu, g_norm, iterations=cfg.gn_iterations)
        nav2, ba2, bg2 = wo.latest_state(win)
        failed = wo.failure_detected(win)
        # FailureDetection -> ResetParams (:896-913): restart the window
        # anchored at the predicted state with the previous biases.
        reset_win = wo.make_window(
            cfg.window_size, predicted, state.ba, state.bg, cfg.imu
        )
        win = jax.tree.map(
            lambda a, b: jnp.where(failed, a, b), reset_win, win
        )
        nav2 = jax.tree.map(
            lambda a, b: jnp.where(failed, a, b), predicted, nav2
        )
        ba2 = jnp.where(failed, state.ba, ba2)
        bg2 = jnp.where(failed, state.bg, bg2)
        return nav2.pose, (win, nav2, ba2, bg2, failed)

    scan = ScanInput(
        time=inp.time,
        points=inp.points,
        times=inp.times,
        mask=inp.mask,
        relative_prediction=rel,
    )
    new_frontend, (result, (win, nav2, ba2, bg2, failed)) = step(
        state.frontend, scan, cfg, fuse_fn=fuse,
        defer_grid_writes=defer_grid_writes,
    )

    # carry the last valid IMU sample as the next midpoint partner
    has_imu = jnp.any(inp.imu_mask)
    last_idx = jnp.maximum(
        jnp.sum(inp.imu_mask.astype(jnp.int32)) - 1, 0
    )
    last_acc = jnp.where(has_imu, inp.imu_acc[last_idx], state.last_acc)
    last_gyr = jnp.where(has_imu, inp.imu_gyr[last_idx], state.last_gyr)

    new_state = LioState(
        frontend=new_frontend,
        window=win,
        nav=nav2,
        ba=ba2,
        bg=bg2,
        last_acc=last_acc,
        last_gyr=last_gyr,
        failures=state.failures + failed.astype(jnp.int32),
    )
    return new_state, LioResult(
        scan=result,
        velocity=nav2.velocity,
        ba=ba2,
        bg=bg2,
        failed=failed,
        gravity_valid=grav_ok,
    )


def make_jit_lio_chunk(cfg: TrajectoryBuilderConfig, chunk: int):
    """Compiled multi-scan step: `lax.scan` over `chunk` stacked scans per
    dispatch. Per-dispatch host overhead (~0.4 ms through the TPU relay) is
    paid once per chunk instead of once per scan — the offline/bench
    throughput path. Returns (fn, split, join) like make_jit_lio_step; `fn`
    takes a LioScanInput whose leaves carry a leading (chunk, ...) axis and
    returns the stacked LioResults."""
    _, split, join = make_jit_lio_step(cfg)

    @functools.partial(jax.jit, donate_argnums=0)
    def fn(grids, rest, scans):
        def body(state, scan):
            st, res = lio_step(state, scan, cfg)
            return st, res

        # rolled on purpose: unroll=2 was measured at +0.4% (the while op's
        # self time is not carry forwarding) while a full unroll compiles
        # for many minutes
        st, results = jax.lax.scan(body, join(grids, rest), scans)
        g2, rest2 = split(st)
        return g2, rest2, results

    return fn, split, join


def make_jit_lio_step(cfg: TrajectoryBuilderConfig):
    """Compiled LIO step with the submap grid banks donated (in-place HBM
    updates) and the rest of the state copied.

    Donating the whole LioState trips a TPU-backend aliasing fault in the
    current runtime (opaque InvalidArgument; grids-only donation is stable
    and covers ~99% of the state bytes). Returns (fn, split, join):
      grids, rest = split(state);  grids, rest, res = fn(grids, rest, inp);
      state = join(grids, rest).
    """

    def split(state: LioState):
        """Split the heavy grid buffers (dense banks + brick directory/pool)
        out of the state so only they are donated."""
        sm = state.frontend.submaps
        brick = sm.high_brick
        lbrick = sm.low_brick
        grids = (
            sm.high_values,
            sm.low_values,
            brick.directory if brick is not None else None,
            brick.pool if brick is not None else None,
            lbrick.directory if lbrick is not None else None,
            lbrick.pool if lbrick is not None else None,
        )
        empty16 = jnp.zeros((0,), sm.low_values.dtype)

        def strip(b):
            return (
                b._replace(directory=jnp.zeros((0,), jnp.int32), pool=empty16)
                if b is not None
                else None
            )

        rest = state._replace(
            frontend=state.frontend._replace(
                submaps=sm._replace(
                    high_values=jnp.zeros((0,), sm.high_values.dtype),
                    low_values=empty16,
                    high_brick=strip(brick),
                    low_brick=strip(lbrick),
                )
            )
        )
        return grids, rest

    def join(grids, rest: LioState) -> LioState:
        sm = rest.frontend.submaps
        brick = sm.high_brick
        if brick is not None:
            brick = brick._replace(directory=grids[2], pool=grids[3])
        lbrick = sm.low_brick
        if lbrick is not None:
            lbrick = lbrick._replace(directory=grids[4], pool=grids[5])
        return rest._replace(
            frontend=rest.frontend._replace(
                submaps=sm._replace(
                    high_values=grids[0],
                    low_values=grids[1],
                    high_brick=brick,
                    low_brick=lbrick,
                )
            )
        )

    @functools.partial(jax.jit, donate_argnums=0)
    def fn(grids, rest, inp):
        st, res = lio_step(join(grids, rest), inp, cfg)
        g2, rest2 = split(st)
        return g2, rest2, res

    return fn, split, join
