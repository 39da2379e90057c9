"""Pose-graph optimization tests (optimization_problem_3d_test.cc analog):
SPA on synthetic constraints converges to ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.backend.optimization import (
    PoseGraphData,
    make_pose_graph_data,
    solve,
)
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_inverse_rotate,
    quat_normalize,
    quat_angle,
)


def _random_pose(rng, scale_t=5.0, scale_r=0.5):
    aa = rng.normal(0, scale_r, 3).astype(np.float32)
    return Rigid3(
        rotation=quat_from_axis_angle(jnp.asarray(aa)),
        translation=jnp.asarray(rng.normal(0, scale_t, 3).astype(np.float32)),
    )


def _relative(a: Rigid3, b: Rigid3) -> Rigid3:
    return a.inverse().compose(b)


def _build_problem(rng, num_submaps=4, nodes_per_submap=6, perturb=0.3):
    """Ground-truth submaps along a line; nodes around each; constraints =
    exact relative poses; initial values perturbed."""
    S, N = 64, 256
    C = 1024
    data = make_pose_graph_data(S, N, C)
    true_submaps = []
    true_nodes = []
    sq, st, sv = [], [], np.zeros(S, bool)
    nq, nt, nv = [], [], np.zeros(N, bool)
    cs, cn, cq, ct, ctw, crw, cv = [], [], [], [], [], [], []

    for i in range(num_submaps):
        pose = Rigid3(
            rotation=quat_from_axis_angle(
                jnp.asarray(rng.normal(0, 0.2, 3).astype(np.float32))
            ),
            translation=jnp.asarray([4.0 * i, 0.5 * i, 0.0], jnp.float32),
        )
        true_submaps.append(pose)
    node_id = 0
    for i in range(num_submaps):
        for j in range(nodes_per_submap):
            pose = Rigid3(
                rotation=quat_from_axis_angle(
                    jnp.asarray(rng.normal(0, 0.3, 3).astype(np.float32))
                ),
                translation=true_submaps[i].translation
                + jnp.asarray(rng.normal(0, 1.5, 3).astype(np.float32)),
            )
            true_nodes.append(pose)
            # INTRA constraint to own submap
            rel = _relative(true_submaps[i], pose)
            cs.append(i); cn.append(node_id)
            cq.append(np.asarray(rel.rotation)); ct.append(np.asarray(rel.translation))
            ctw.append(1e2); crw.append(1e2); cv.append(True)
            # INTER constraint to the previous submap (loop-ish)
            if i > 0:
                rel2 = _relative(true_submaps[i - 1], pose)
                cs.append(i - 1); cn.append(node_id)
                cq.append(np.asarray(rel2.rotation)); ct.append(np.asarray(rel2.translation))
                ctw.append(1e2); crw.append(1e2); cv.append(True)
            node_id += 1

    # perturbed initial values (submap 0 exact: it's held fixed)
    for i, pose in enumerate(true_submaps):
        p = pose if i == 0 else Rigid3(
            rotation=quat_normalize(
                pose.rotation
                + jnp.asarray(rng.normal(0, perturb * 0.2, 4).astype(np.float32))
            ),
            translation=pose.translation
            + jnp.asarray(rng.normal(0, perturb, 3).astype(np.float32)),
        )
        sq.append(np.asarray(p.rotation)); st.append(np.asarray(p.translation))
        sv[i] = True
    for i, pose in enumerate(true_nodes):
        p = Rigid3(
            rotation=quat_normalize(
                pose.rotation
                + jnp.asarray(rng.normal(0, perturb * 0.2, 4).astype(np.float32))
            ),
            translation=pose.translation
            + jnp.asarray(rng.normal(0, perturb, 3).astype(np.float32)),
        )
        nq.append(np.asarray(p.rotation)); nt.append(np.asarray(p.translation))
        nv[i] = True

    def pad(arr, n, width=None):
        a = np.asarray(arr, np.float32)
        if width is None:
            out = np.zeros(n, np.float32)
            out[: len(a)] = a
        else:
            out = np.zeros((n, width), np.float32)
            if width == 4:
                out[:, 0] = 1.0
            out[: len(a)] = a
        return jnp.asarray(out)

    data = data._replace(
        submap_q=pad(sq, 64, 4), submap_t=pad(st, 64, 3),
        submap_valid=jnp.asarray(sv),
        node_q=pad(nq, 256, 4), node_t=pad(nt, 256, 3),
        node_valid=jnp.asarray(nv),
        c_submap=jnp.asarray(np.pad(np.asarray(cs, np.int32), (0, 1024 - len(cs)))),
        c_node=jnp.asarray(np.pad(np.asarray(cn, np.int32), (0, 1024 - len(cn)))),
        c_q=pad(cq, 1024, 4), c_t=pad(ct, 1024, 3),
        c_trans_weight=pad(ctw, 1024), c_rot_weight=pad(crw, 1024),
        c_valid=jnp.asarray(np.arange(1024) < len(cs)),
    )
    return data, true_submaps, true_nodes


def test_spa_converges_to_ground_truth():
    rng = np.random.default_rng(0)
    data, true_submaps, true_nodes = _build_problem(rng)
    out = jax.jit(lambda d: solve(d, iterations=8, cg_iterations=48))(data)
    for i, pose in enumerate(true_submaps):
        t_err = float(jnp.linalg.norm(out.submap_t[i] - pose.translation))
        r_err = float(
            quat_angle(quat_multiply(quat_conjugate(out.submap_q[i]), pose.rotation))
        )
        assert t_err < 0.02, (i, t_err)
        assert r_err < 0.02, (i, r_err)
    for i, pose in enumerate(true_nodes):
        t_err = float(jnp.linalg.norm(out.node_t[i] - pose.translation))
        assert t_err < 0.02, (i, t_err)


def test_spa_first_submap_fixed():
    rng = np.random.default_rng(1)
    data, true_submaps, _ = _build_problem(rng)
    out = jax.jit(lambda d: solve(d, iterations=4, cg_iterations=32))(data)
    np.testing.assert_allclose(
        np.asarray(out.submap_t[0]), np.asarray(data.submap_t[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.submap_q[0]), np.asarray(data.submap_q[0]), atol=1e-6
    )


def test_spa_pulls_drift_through_loop_constraint():
    # Chain of submaps with accumulated drift in the initial values; a loop
    # constraint between the last node and submap 0 repairs the chain.
    rng = np.random.default_rng(2)
    data, true_submaps, true_nodes = _build_problem(
        rng, num_submaps=6, nodes_per_submap=4, perturb=1.0
    )
    out = jax.jit(lambda d: solve(d, iterations=12, cg_iterations=64))(data)
    errs = [
        float(jnp.linalg.norm(out.submap_t[i] - p.translation))
        for i, p in enumerate(true_submaps)
    ]
    assert max(errs) < 0.05, errs


def test_fixed_frame_anchors_drifted_chain():
    """GPS-style fixed-frame observations pull a drifted chain back
    (optimization_problem_3d.cc fixed-frame cost)."""
    rng = np.random.default_rng(5)
    data, true_submaps, true_nodes = _build_problem(
        rng, num_submaps=5, nodes_per_submap=3, perturb=1.2
    )
    # fixed-frame (GPS) position for every node at its TRUE position
    F = data.ff_node.shape[0]
    ffn = np.zeros(F, np.int32)
    fft = np.zeros((F, 3), np.float32)
    ffw = np.zeros(F, np.float32)
    ffv = np.zeros(F, bool)
    for i, pose in enumerate(true_nodes):
        ffn[i] = i
        fft[i] = np.asarray(pose.translation)
        ffw[i] = 50.0
        ffv[i] = True
    data = data._replace(
        ff_node=jnp.asarray(ffn), ff_t=jnp.asarray(fft),
        ff_weight=jnp.asarray(ffw), ff_valid=jnp.asarray(ffv),
    )
    out = jax.jit(lambda d: solve(d, iterations=10, cg_iterations=64))(data)
    errs = [
        float(jnp.linalg.norm(out.node_t[i] - p.translation))
        for i, p in enumerate(true_nodes)
    ]
    assert max(errs) < 0.05, max(errs)


def test_landmark_positions_estimated():
    rng = np.random.default_rng(6)
    data, true_submaps, true_nodes = _build_problem(rng, perturb=0.0)
    true_lm = np.array([3.0, -2.0, 1.0], np.float32)
    L = data.lm_node.shape[0]
    lmn = np.zeros(L, np.int32); lmi = np.zeros(L, np.int32)
    lmr = np.zeros((L, 3), np.float32); lmw = np.zeros(L, np.float32)
    lmv = np.zeros(L, bool)
    from dliom_tpu.transform.rigid import quat_inverse_rotate

    for i, pose in enumerate(true_nodes[:8]):
        rel = quat_inverse_rotate(
            pose.rotation, jnp.asarray(true_lm) - pose.translation
        )
        lmn[i], lmi[i], lmr[i], lmw[i], lmv[i] = i, 0, np.asarray(rel), 10.0, True
    K = data.lm_positions.shape[0]
    lmp = np.zeros((K, 3), np.float32)
    lmp[0] = true_lm + np.array([0.5, -0.3, 0.2])  # perturbed initial
    lmpv = np.zeros(K, bool); lmpv[0] = True
    data = data._replace(
        lm_node=jnp.asarray(lmn), lm_node2=jnp.asarray(lmn),
        lm_alpha=jnp.zeros(L, jnp.float32), lm_id=jnp.asarray(lmi),
        lm_rel_t=jnp.asarray(lmr), lm_trans_weight=jnp.asarray(lmw),
        lm_rot_weight=jnp.zeros(L, jnp.float32),
        lm_valid=jnp.asarray(lmv),
        lm_positions=jnp.asarray(lmp), lm_pos_valid=jnp.asarray(lmpv),
    )
    out = jax.jit(lambda d: solve(d, iterations=6, cg_iterations=48))(data)
    np.testing.assert_allclose(np.asarray(out.lm_positions[0]), true_lm, atol=0.05)


def test_consecutive_node_links_constrain_nodes():
    """Node-node relative costs (odometry / consecutive local-SLAM poses,
    upstream optimization_problem_3d.cc:437-489): a chain of nodes with only
    one node constrained to a submap must be pulled into place by the
    node-node links."""
    rng = np.random.default_rng(21)
    data = make_pose_graph_data(8, 16, 32)
    # submap 0 fixed at origin; node 0 tied to it at identity
    data = data._replace(
        submap_valid=data.submap_valid.at[0].set(True),
        node_valid=data.node_valid.at[:4].set(True),
        c_valid=data.c_valid.at[0].set(True),
        c_submap=data.c_submap.at[0].set(0),
        c_node=data.c_node.at[0].set(0),
        c_trans_weight=data.c_trans_weight.at[0].set(100.0),
        c_rot_weight=data.c_rot_weight.at[0].set(100.0),
    )
    # true node k at (k, 0, 0); links say +1 m in x each step
    nnf = np.array([0, 1, 2], np.int32)
    nns = np.array([1, 2, 3], np.int32)
    nnt = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (3, 1))
    data = data._replace(
        nn_first=data.nn_first.at[:3].set(jnp.asarray(nnf)),
        nn_second=data.nn_second.at[:3].set(jnp.asarray(nns)),
        nn_t=data.nn_t.at[:3].set(jnp.asarray(nnt)),
        nn_trans_weight=data.nn_trans_weight.at[:3].set(50.0),
        nn_rot_weight=data.nn_rot_weight.at[:3].set(50.0),
        nn_valid=data.nn_valid.at[:3].set(True),
        # perturbed initial node positions
        node_t=data.node_t.at[:4].set(
            jnp.asarray(rng.normal(0, 0.5, (4, 3)).astype(np.float32))
            + jnp.asarray([[k, 0.0, 0.0] for k in range(4)], jnp.float32)
        ),
    )
    out = jax.jit(lambda d: solve(d, iterations=6, cg_iterations=48))(data)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(out.node_t[k]), [k, 0.0, 0.0], atol=0.05
        )


def test_huber_downweights_gps_outlier():
    """huber_scale on fixed-frame costs: one wild GPS outlier must not drag
    the trajectory (robust), while without Huber it visibly does."""
    data = make_pose_graph_data(8, 16, 32)
    data = data._replace(
        submap_valid=data.submap_valid.at[0].set(True),
        node_valid=data.node_valid.at[:4].set(True),
        node_t=data.node_t.at[:4].set(
            jnp.asarray([[k, 0.0, 0.0] for k in range(4)], jnp.float32)
        ),
        # chain the nodes rigidly so the GPS terms fight one shared offset
        nn_first=data.nn_first.at[:3].set(jnp.asarray([0, 1, 2])),
        nn_second=data.nn_second.at[:3].set(jnp.asarray([1, 2, 3])),
        nn_t=data.nn_t.at[:3].set(
            jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (3, 1))
        ),
        nn_trans_weight=data.nn_trans_weight.at[:3].set(1e3),
        nn_rot_weight=data.nn_rot_weight.at[:3].set(1e3),
        nn_valid=data.nn_valid.at[:3].set(True),
    )
    # good GPS at nodes 0-2 (measuring truth); outlier at node 3 (+20 m in y)
    ff_t = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 20.0, 0]], np.float32
    )
    data = data._replace(
        ff_node=data.ff_node.at[:4].set(jnp.arange(4)),
        ff_t=data.ff_t.at[:4].set(jnp.asarray(ff_t)),
        ff_weight=data.ff_weight.at[:4].set(10.0),
        ff_valid=data.ff_valid.at[:4].set(True),
    )
    robust = jax.jit(
        lambda d: solve(d, iterations=8, cg_iterations=48, ff_huber_scale=1.0)
    )(data)
    naive = jax.jit(
        lambda d: solve(d, iterations=8, cg_iterations=48)
    )(data)
    err_robust = float(jnp.abs(robust.node_t[3, 1]))
    err_naive = float(jnp.abs(naive.node_t[3, 1]))
    assert err_robust < 1.0, err_robust
    assert err_naive > 3.0, err_naive  # quadratic loss follows the outlier


def test_final_optimization_converges_within_capped_iterations():
    """Evidence for the 400 -> 50 final-iteration cap (run_final_optimization):
    on a LARGE drifted chain with loop closures, the solution at the capped
    iteration count must already sit at the converged fixed point — i.e.
    more GN outer iterations change nothing material. One GN outer here
    runs 64 preconditioned-CG inners, so 50 outers are NOT comparable to 50
    Ceres LM iterations."""
    rng = np.random.default_rng(17)
    data, true_submaps, true_nodes = _build_problem(
        rng, num_submaps=10, nodes_per_submap=6, perturb=2.0
    )
    at_cap = jax.jit(
        lambda d: solve(d, iterations=50, cg_iterations=64)
    )(data)
    beyond = jax.jit(
        lambda d: solve(d, iterations=80, cg_iterations=64)
    )(data)
    err_cap = max(
        float(jnp.linalg.norm(at_cap.submap_t[i] - p.translation))
        for i, p in enumerate(true_submaps)
    )
    # converged to truth at the cap...
    assert err_cap < 0.05, err_cap
    # ...and already at the fixed point: further iterations are a no-op
    drift_beyond = float(
        jnp.max(jnp.abs(at_cap.submap_t[:10] - beyond.submap_t[:10]))
    )
    assert drift_beyond < 1e-3, drift_beyond


def test_inter_huber_bounds_false_loop_damage():
    """use_inter_huber (upstream cartographer's HuberLoss on loop
    constraints — the original that the reference's TrivialLoss replaced,
    optimization_problem_3d.cc:335): one wildly-wrong INTER constraint must
    not drag the solution; without the robust loss it does."""
    rng = np.random.default_rng(23)
    data, true_submaps, true_nodes = _build_problem(
        rng, num_submaps=6, nodes_per_submap=5, perturb=0.05
    )
    # inject a false loop: node 2 claimed to sit AT submap 4's origin
    # (truth: several meters away), loop-closure weights
    ci = np.zeros(data.c_valid.shape[0], bool)
    k = int(np.asarray(data.c_valid).sum())
    cs = np.asarray(data.c_submap).copy(); cn = np.asarray(data.c_node).copy()
    cq = np.asarray(data.c_q).copy(); ct = np.asarray(data.c_t).copy()
    ctw = np.asarray(data.c_trans_weight).copy()
    crw = np.asarray(data.c_rot_weight).copy()
    cv = np.asarray(data.c_valid).copy()
    cs[k], cn[k] = 4, 2
    cq[k] = [1, 0, 0, 0]; ct[k] = [0, 0, 0]  # false: "node 2 at submap 4"
    # weight-matched to the INTRA chain: the Huber influence bound scales
    # with the OUTLIER's weight (a false 1e4-weight loop against a 5e2
    # chain retains ~weight-ratio leverage even robustified — inherent to
    # any linear-tail loss; the primary production gate is min_score)
    ctw[k], crw[k] = 100.0, 100.0
    cv[k], ci[k] = True, True
    data = data._replace(
        c_submap=jnp.asarray(cs), c_node=jnp.asarray(cn),
        c_q=jnp.asarray(cq), c_t=jnp.asarray(ct),
        c_trans_weight=jnp.asarray(ctw), c_rot_weight=jnp.asarray(crw),
        c_valid=jnp.asarray(cv), c_is_inter=jnp.asarray(ci),
    )

    def max_err(out):
        return max(
            float(jnp.linalg.norm(out.submap_t[i] - p.translation))
            for i, p in enumerate(true_submaps)
        )

    plain = solve(data, iterations=12, cg_iterations=64)
    robust = solve(
        data, iterations=12, cg_iterations=64, inter_huber_scale=1.0
    )
    e_plain, e_robust = max_err(plain), max_err(robust)
    # the false loop corrupts the quadratic solve (measured ~24 m)...
    assert e_plain > 1.0, e_plain
    # ...and the Huber solve holds the graph near truth (measured ~0.09 m)
    assert e_robust < 0.2, (e_robust, e_plain)
    assert e_robust < 0.05 * e_plain
