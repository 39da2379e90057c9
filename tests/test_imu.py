"""IMU layer tests: preintegration against closed-form motion, static and
dynamic initializers, sliding-window fusion on synthetic data. The reference
has no unit tests for these (SURVEY.md §4 end) — these are new coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.common.config import ImuConfig
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.imu import window_optimizer as wo
from dliom_tpu.imu.initialization import (
    AlignmentInput,
    estimate_gravity,
    initialize_dynamic,
    static_initialize,
)
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_from_axis_angle,
    quat_inverse_rotate,
    quat_multiply,
    quat_rotate,
    quat_conjugate,
)

G = 9.80511


def _simulate_imu(n, dt, accel_world_fn, omega_body_fn, q0=None):
    """Ideal IMU: a_meas = R^T (a_world - g_world), w_meas = omega_body."""
    g_world = np.array([0.0, 0.0, -G])
    q = np.array([1.0, 0, 0, 0]) if q0 is None else np.asarray(q0)
    p = np.zeros(3)
    v = np.zeros(3)
    qs, ps, vs, accs, gyrs = [q.copy()], [p.copy()], [v.copy()], [], []
    for i in range(n):
        t = i * dt
        a_w = accel_world_fn(t)
        w_b = omega_body_fn(t)
        a_meas = np.asarray(
            quat_inverse_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(a_w - g_world, jnp.float32))
        )
        accs.append(a_meas)
        gyrs.append(w_b)
        # integrate ground truth (midpoint-free small dt)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        dq = np.asarray(quat_from_axis_angle(jnp.asarray(w_b * dt, jnp.float32)))
        q = np.array(
            quat_multiply(jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32))
        )
        q /= np.linalg.norm(q)
        qs.append(q.copy()); ps.append(p.copy()); vs.append(v.copy())
    return (
        np.array(qs), np.array(ps), np.array(vs),
        np.array(accs, np.float32), np.array(gyrs, np.float32),
    )


def test_preintegration_static():
    # Static: delta_p = delta_v = 0 is wrong — without gravity compensation,
    # a static IMU measures +g up, so deltas grow; check against closed form
    # dv = R(a-ba) integrated, dp = 0.5 a t^2 with a = (0,0,+G).
    cfg = ImuConfig()
    n, dt = 100, 0.005
    acc = jnp.tile(jnp.asarray([0.0, 0.0, G]), (n, 1))
    gyr = jnp.zeros((n, 3))
    p = pre.make_preintegrated(jnp.zeros(3), jnp.zeros(3), acc[0], gyr[0])
    out = pre.integrate(
        p, jnp.full(n, dt), acc, gyr, jnp.ones(n, bool), pre.noise_matrix(cfg)
    )
    t = n * dt
    np.testing.assert_allclose(float(out.dt), t, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.delta_v), [0, 0, G * t], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.delta_p), [0, 0, 0.5 * G * t * t], atol=1e-3
    )
    # predict from identity with gravity cancels: static stays static
    nav = pre.predict(pre.NavState.identity(), out, G)
    np.testing.assert_allclose(np.asarray(nav.position), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(nav.velocity), 0.0, atol=1e-3)


def test_preintegration_matches_ground_truth_motion():
    n, dt = 200, 0.0025
    accel = lambda t: np.array([0.4, -0.2, 0.1])
    omega = lambda t: np.array([0.1, 0.3, -0.2])
    qs, ps, vs, accs, gyrs = _simulate_imu(n, dt, accel, omega)
    cfg = ImuConfig()
    p0 = pre.make_preintegrated(jnp.zeros(3), jnp.zeros(3), jnp.asarray(accs[0]), jnp.asarray(gyrs[0]))
    out = pre.integrate(
        p0,
        jnp.full(n - 1, dt),
        jnp.asarray(accs[1:]),
        jnp.asarray(gyrs[1:]),
        jnp.ones(n - 1, bool),
        pre.noise_matrix(cfg),
    )
    nav = pre.predict(pre.NavState.identity(), out, G)
    np.testing.assert_allclose(np.asarray(nav.position), ps[n - 1], atol=5e-3)
    np.testing.assert_allclose(np.asarray(nav.velocity), vs[n - 1], atol=5e-3)
    dot = abs(float(jnp.sum(nav.rotation * jnp.asarray(qs[n - 1], jnp.float32))))
    assert dot > 1.0 - 1e-4


def test_preintegration_bias_correction_first_order():
    # bias_corrected_deltas with a small bias shift should match
    # re-integration with that bias.
    n, dt = 100, 0.005
    accel = lambda t: np.array([0.3, 0.1, -0.2])
    omega = lambda t: np.array([0.2, -0.1, 0.15])
    _, _, _, accs, gyrs = _simulate_imu(n, dt, accel, omega)
    cfg = ImuConfig()
    noise = pre.noise_matrix(cfg)
    zeros = jnp.zeros(3)
    p0 = pre.make_preintegrated(zeros, zeros, jnp.asarray(accs[0]), jnp.asarray(gyrs[0]))
    base = pre.integrate(p0, jnp.full(n - 1, dt), jnp.asarray(accs[1:]), jnp.asarray(gyrs[1:]), jnp.ones(n - 1, bool), noise)
    dba = jnp.asarray([0.01, -0.02, 0.015])
    dbg = jnp.asarray([-0.005, 0.01, 0.008])
    cp, cq, cv = pre.bias_corrected_deltas(base, dba, dbg)
    p1 = pre.make_preintegrated(dba, dbg, jnp.asarray(accs[0]), jnp.asarray(gyrs[0]))
    re = pre.integrate(p1, jnp.full(n - 1, dt), jnp.asarray(accs[1:]), jnp.asarray(gyrs[1:]), jnp.ones(n - 1, bool), noise)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(re.delta_p), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(re.delta_v), atol=2e-3)
    dot = abs(float(jnp.sum(cq * re.delta_q)))
    assert dot > 1.0 - 1e-5


def test_masked_samples_ignored():
    cfg = ImuConfig()
    acc = jnp.tile(jnp.asarray([0.0, 0.0, G]), (10, 1))
    gyr = jnp.zeros((10, 3))
    p0 = pre.make_preintegrated(jnp.zeros(3), jnp.zeros(3), acc[0], gyr[0])
    mask = jnp.arange(10) < 5
    out = pre.integrate(p0, jnp.full(10, 0.01), acc, gyr, mask, pre.noise_matrix(cfg))
    np.testing.assert_allclose(float(out.dt), 0.05, rtol=1e-5)
    assert int(out.count) == 5


def test_static_initializer():
    # IMU tilted 10 degrees about x, small biases.
    rng = np.random.default_rng(0)
    tilt = quat_from_axis_angle(jnp.asarray([0.17, 0.0, 0.0]))
    g_body = np.asarray(quat_inverse_rotate(tilt, jnp.asarray([0.0, 0.0, G])))
    true_bg = np.array([0.002, -0.001, 0.003], np.float32)
    accs = jnp.asarray(g_body[None, :] + rng.normal(0, 1e-3, (200, 3)), jnp.float32)
    gyrs = jnp.asarray(true_bg[None, :] + rng.normal(0, 1e-4, (200, 3)), jnp.float32)
    rot, ba, bg = static_initialize(accs, gyrs, jnp.ones(200, bool), G)
    # recovered rotation maps measured accel onto +z
    up = quat_rotate(rot, jnp.asarray(g_body, jnp.float32))
    np.testing.assert_allclose(np.asarray(up)[:2], 0.0, atol=2e-2)
    assert float(up[2]) > 9.7
    np.testing.assert_allclose(np.asarray(bg), true_bg, atol=1e-3)
    assert float(jnp.linalg.norm(ba)) < 0.05


def _alignment_window(w=8, dt=0.1, with_rotation=True):
    """Ground-truth window: accelerating + rotating body; returns
    (AlignmentInput, g_world, body-frame velocities)."""
    n_sub = 40
    sub = dt / n_sub
    accel = lambda t: np.array([0.5 * np.cos(t), 0.3 * np.sin(t), 0.2])
    omega = (lambda t: np.array([0.05, 0.1, 0.3])) if with_rotation else (lambda t: np.zeros(3))
    qs, ps, vs, accs, gyrs = _simulate_imu(w * n_sub + 1, sub, accel, omega)
    cfg = ImuConfig()
    noise = pre.noise_matrix(cfg)
    rot_w, trans_w, dps, dvs, dts = [], [], [], [], []
    vels_body = []
    for k in range(w):
        i0 = k * n_sub
        rot_w.append(qs[i0])
        trans_w.append(ps[i0])
        vels_body.append(
            np.asarray(
                quat_inverse_rotate(jnp.asarray(qs[i0], jnp.float32), jnp.asarray(vs[i0], jnp.float32))
            )
        )
        if k == 0:
            dps.append(np.zeros(3)); dvs.append(np.zeros(3)); dts.append(0.0)
        else:
            j0 = (k - 1) * n_sub
            p0 = pre.make_preintegrated(jnp.zeros(3), jnp.zeros(3), jnp.asarray(accs[j0]), jnp.asarray(gyrs[j0]))
            out = pre.integrate(
                p0, jnp.full(n_sub, sub),
                jnp.asarray(accs[j0 + 1 : j0 + 1 + n_sub]),
                jnp.asarray(gyrs[j0 + 1 : j0 + 1 + n_sub]),
                jnp.ones(n_sub, bool), noise,
            )
            dps.append(np.asarray(out.delta_p)); dvs.append(np.asarray(out.delta_v)); dts.append(float(out.dt))
    inp = AlignmentInput(
        rotations=jnp.asarray(np.array(rot_w), jnp.float32),
        translations=jnp.asarray(np.array(trans_w), jnp.float32),
        delta_p=jnp.asarray(np.array(dps), jnp.float32),
        delta_v=jnp.asarray(np.array(dvs), jnp.float32),
        dts=jnp.asarray(np.array(dts), jnp.float32),
        pair_mask=jnp.asarray([False] + [True] * (w - 1)),
    )
    return inp, np.array([0.0, 0.0, -G]), np.array(vels_body, np.float32)


def test_dynamic_initialization_recovers_gravity():
    inp, g_world, vels = _alignment_window()
    # unknown-to-solver: gravity expressed in frame 0 (identity here) = g_world.
    # The initializer's g is in the first frame; sign convention: solve for
    # the vector satisfying p_j = ... + 0.5 g t^2 (downward).
    g, vs, ok = initialize_dynamic(inp, Rigid3.identity(), G)
    assert bool(ok)
    # Reference convention (imu_lidar_initializer.cc linear system): the
    # solved g is the specific-force direction = -g_world ("up").
    np.testing.assert_allclose(np.asarray(g), -g_world, atol=0.15)
    np.testing.assert_allclose(np.asarray(vs[1:]), vels[1:], atol=0.1)


def test_gravity_estimator_with_known_velocities():
    inp, g_world, vels = _alignment_window()
    g, ok = estimate_gravity(inp, jnp.asarray(vels), Rigid3.identity(), G)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(g), -g_world, atol=0.1)


def test_window_optimizer_tracks_and_estimates_bias():
    # Trajectory with constant world accel + rotation; IMU has a gyro bias;
    # pose observations are ground truth. The window must track pose/velocity
    # tightly and steadily pull the gyro bias toward truth (full convergence
    # of a random-walk bias takes hundreds of keys, as in the reference).
    n_scans, n_sub, sub = 30, 20, 0.005
    true_bg = np.array([0.05, -0.04, 0.06], np.float32)
    accel = lambda t: np.array([0.3, -0.1, 0.0])
    omega = lambda t: np.array([0.1, 0.2, -0.1])
    qs, ps, vs, accs, gyrs = _simulate_imu(n_scans * n_sub + 1, sub, accel, omega)
    gyrs_biased = gyrs + true_bg[None, :]
    cfg = ImuConfig(
        prior_vel_noise=0.5, prior_bias_noise=0.1,
        ceres_pose_noise_t=0.01, ceres_pose_noise_r=0.01,
    )
    noise = pre.noise_matrix(cfg)
    state = wo.make_window(
        6, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3), cfg
    )

    @jax.jit
    def update(state, nav, ba, bg, acc0, gyr0, accs_s, gyrs_s, obs_q, obs_t):
        p0 = pre.make_preintegrated(ba, bg, acc0, gyr0)
        out = pre.integrate(
            p0, jnp.full(n_sub, sub), accs_s, gyrs_s, jnp.ones(n_sub, bool), noise
        )
        predicted = pre.predict(nav, out, G)
        state = wo.push_key(
            state, out, predicted, Rigid3(obs_q, obs_t), jnp.bool_(False),
            jnp.asarray([0.0, 0.0, 1.0]), jnp.bool_(False), cfg, G,
        )
        state = wo.optimize(state, cfg, G, iterations=8)
        nav2, ba2, bg2 = wo.latest_state(state)
        return state, nav2, ba2, bg2

    nav = pre.NavState.identity()
    ba = jnp.zeros(3)
    bg = jnp.zeros(3)
    bg_err_mid = None
    for k in range(n_scans):
        i0 = k * n_sub
        state, nav, ba, bg = update(
            state, nav, ba, bg,
            jnp.asarray(accs[i0]), jnp.asarray(gyrs_biased[i0]),
            jnp.asarray(accs[i0 + 1 : i0 + 1 + n_sub]),
            jnp.asarray(gyrs_biased[i0 + 1 : i0 + 1 + n_sub]),
            jnp.asarray(qs[i0 + n_sub], jnp.float32),
            jnp.asarray(ps[i0 + n_sub], jnp.float32),
        )
        if k == 9:
            bg_err_mid = float(jnp.linalg.norm(bg - jnp.asarray(true_bg)))

    np.testing.assert_allclose(
        np.asarray(nav.position), ps[n_scans * n_sub], atol=0.01
    )
    # velocity estimated without ever being observed directly
    np.testing.assert_allclose(
        np.asarray(nav.velocity), vs[n_scans * n_sub], atol=0.05
    )
    # gyro bias moving monotonically toward truth (>=50% of it recovered)
    bg_err = float(jnp.linalg.norm(bg - jnp.asarray(true_bg)))
    assert bg_err < bg_err_mid
    assert bg_err < 0.65 * float(np.linalg.norm(true_bg))
    assert not bool(wo.failure_detected(state))


def test_failure_detection():
    cfg = ImuConfig()
    state = wo.make_window(4, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3), cfg)
    bad = state._replace(v=state.v.at[0].set(jnp.asarray([40.0, 0.0, 0.0])))
    assert bool(wo.failure_detected(bad))


def test_batched_integrate_matches_sequential():
    # The associative-scan path must be numerically equivalent to the
    # reference-shaped sequential scan.
    rng = np.random.default_rng(9)
    n = 48
    accs = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32) + np.array([0, 0, G], np.float32))
    gyrs = jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32))
    dts = jnp.asarray(rng.uniform(0.002, 0.004, n).astype(np.float32))
    mask = jnp.arange(n) < 40  # prefix mask
    cfg = ImuConfig()
    noise = pre.noise_matrix(cfg)
    ba = jnp.asarray([0.01, -0.02, 0.005])
    bg = jnp.asarray([0.002, 0.001, -0.003])
    p0 = pre.make_preintegrated(ba, bg, accs[0] * 0.9, gyrs[0] * 0.9)
    a = pre.integrate_sequential(p0, dts, accs, gyrs, mask, noise)
    b = pre.integrate(p0, dts, accs, gyrs, mask, noise)
    np.testing.assert_allclose(np.asarray(b.delta_p), np.asarray(a.delta_p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.delta_v), np.asarray(a.delta_v), atol=1e-4)
    assert abs(float(jnp.sum(a.delta_q * b.delta_q))) > 1.0 - 1e-6
    np.testing.assert_allclose(np.asarray(b.jacobian), np.asarray(a.jacobian), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(b.covariance), np.asarray(a.covariance),
        atol=2e-3 * float(jnp.max(jnp.abs(a.covariance))),
    )
    np.testing.assert_allclose(float(b.dt), float(a.dt), rtol=1e-6)
    assert int(b.count) == int(a.count)
    np.testing.assert_allclose(np.asarray(b.acc0), np.asarray(a.acc0), atol=1e-6)


def test_pallas_chain_matches_sequential():
    """The Pallas affine-chain kernel (interpret mode on CPU) reproduces the
    sequential (F, Q) recurrence exactly — tighter than associative_scan."""
    from dliom_tpu.imu import preintegration as pre

    rng = np.random.default_rng(3)
    M = 7
    f = jnp.asarray(rng.normal(0, 0.2, (M, 15, 15)).astype(np.float32)) + jnp.eye(15)
    q = jnp.asarray(rng.normal(0, 0.05, (M, 15, 15)).astype(np.float32))
    q = q @ jnp.swapaxes(q, 1, 2)
    old_force, old_interp = pre.FORCE_PALLAS_CHAIN, pre._CHAIN_INTERPRET
    pre.FORCE_PALLAS_CHAIN, pre._CHAIN_INTERPRET = True, True
    try:
        fp, qp = pre._pallas_affine_chain(f, q)
    finally:
        pre.FORCE_PALLAS_CHAIN, pre._CHAIN_INTERPRET = old_force, old_interp
    A = jnp.eye(15)
    P = jnp.zeros((15, 15))
    for i in range(M):
        A = f[i] @ A
        P = f[i] @ P @ f[i].T + q[i]
    np.testing.assert_allclose(np.asarray(fp), np.asarray(A), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(P), rtol=1e-5, atol=1e-6)
