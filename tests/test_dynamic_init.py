"""Dynamic initialization tests (InitilizeByNDT + AlignWithWorld analog):
in-motion bootstrap from scan-to-scan odometry + linear alignment."""

import jax.numpy as jnp
import numpy as np

from dliom_tpu.common.config import load_config
from dliom_tpu.imu.dynamic_initializer import DynamicInitializer
from dliom_tpu.io.synthetic import SyntheticWorld
from dliom_tpu.transform.rigid import Rigid3, quat_inverse_rotate, quat_rotate

G = 9.80511


def _cfg():
    return load_config(
        "basic",
        {"trajectory_builder": {
            "enable_ndt_initialization": True,
            "frames_for_dynamic_initialization": 6,
        }},
    ).trajectory_builder


def _run_sequence(accel_scale=1.0):
    """Time-varying acceleration through the bubbles world with consistent
    IMU (the VINS excitation gate requires acceleration VARIANCE, not just
    acceleration); returns (initializer result, velocity at the last scan
    consumed)."""
    cfg = _cfg()
    world = SyntheticWorld.create()
    init = DynamicInitializer(cfg)
    dt = 0.25
    imu_rate = 100

    def accel(tau):
        return accel_scale * np.array(
            [1.4 * np.cos(1.8 * tau), 1.0 * np.sin(1.8 * tau), 0.0]
        )

    g_w = np.array([0.0, 0.0, -G])
    p = np.zeros(3)
    v = np.zeros(3)
    result = None
    t = 0.0
    v_at_scan = v.copy()
    for k in range(9):
        pts, _ = world.cast_scan(Rigid3.translation_only(jnp.asarray(p, jnp.float32)))
        v_at_scan = v.copy()
        result = init.add_scan(t, pts)
        if result is not None:
            break
        # IMU over the next interval (level body: measured = a_w - g_w)
        n = int(dt * imu_rate)
        sub = dt / n
        for i in range(n):
            tau = t + (i + 0.5) * sub
            a_w = accel(tau)
            init.add_imu(t + (i + 1) * sub, (a_w - g_w).astype(np.float32),
                         np.zeros(3, np.float32))
            p = p + v * sub + 0.5 * a_w * sub * sub
            v = v + a_w * sub
        t += dt
    return result, v_at_scan


def test_dynamic_initialization_succeeds_with_excitation():
    result, v_true = _run_sequence(accel_scale=1.0)
    assert result is not None, "dynamic init did not trigger"
    # gravity-aligned: body was level, so world rotation ~ identity
    up = quat_rotate(result.nav.rotation, jnp.asarray([0.0, 0.0, 1.0]))
    assert float(up[2]) > 0.99
    # velocity of the newest frame close to the truth at that scan
    v_est = np.asarray(result.nav.velocity)
    assert np.linalg.norm(v_est) > 0.3  # moving, not zero
    err = np.linalg.norm(v_est - v_true)
    assert err < 0.4, (v_est, v_true)


def test_dynamic_initialization_rejects_no_excitation():
    # constant velocity (zero acceleration): the VINS excitation check
    # (var < 0.25) must reject and re-buffer
    result, _ = _run_sequence(accel_scale=0.0)
    assert result is None


def test_ndt_matcher_accuracy():
    """NDT scan-to-scan odometry (ops/ndt.py, the MatchByNDT analog)."""
    from dliom_tpu.mapping.grid import GridSpec
    from dliom_tpu.ops.ndt import build_field, match as ndt_match
    from dliom_tpu.ops.voxel_filter import truncate_cloud, voxel_filter

    spec = GridSpec(1.0, 128)
    world = SyntheticWorld.create()

    def prep(pose):
        pts = jnp.asarray(world.cast_scan(pose)[0])
        n = pts.shape[0]
        f = voxel_filter(pts, jnp.zeros(n), jnp.ones(n, bool), 0.3)
        return truncate_cloud(f, 4096)

    a = prep(Rigid3.identity())
    field = build_field(a.points, a.mask, spec)
    for true_t in ([0.1, 0.0, 0.0], [0.2, 0.08, 0.0], [-0.15, 0.1, 0.05]):
        b = prep(Rigid3.translation_only(jnp.asarray(true_t, jnp.float32)))
        pose = ndt_match(field, spec, b.points, b.mask, Rigid3.identity())
        np.testing.assert_allclose(
            np.asarray(pose.translation), true_t, atol=0.03
        )
