"""Global pose-graph optimization (sparse pose adjustment).

TPU-native counterpart of the reference's `OptimizationProblem3D`
(`cartographer/mapping/internal/optimization/optimization_problem_3d.cc`
Solve :259-360 + spa_cost_function_3d.h): 6-dof relative-pose residuals
between submap and node poses for INTRA and INTER constraints (both with
quadratic loss — the reference uses nullptr / TrivialLoss respectively,
:336-338), first submap held fixed (:293-301; the reference additionally
allows its roll/pitch to vary under ConstantYawQuaternionPlus — here it is
fully fixed).

Instead of Ceres' sparse Schur solver, Gauss-Newton steps are computed
matrix-free: the Hessian-vector product H v = J^T (J v) comes from one
jvp+vjp through the vectorized residual function, and conjugate gradients
with a Jacobi preconditioner solves the normal equations — no sparse matrix
is ever materialized, and everything maps onto batched gathers + dense
linear algebra. Constraints can be sharded over a device mesh for large
graphs (the partial H v sums reduce with psum over ICI).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dliom_tpu.transform.rigid import (
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_inverse_rotate,
)


class PoseGraphData(NamedTuple):
    """Dense fixed-capacity pose-graph state (device-resident)."""

    submap_q: jnp.ndarray  # (S, 4)
    submap_t: jnp.ndarray  # (S, 3)
    submap_valid: jnp.ndarray  # (S,)
    node_q: jnp.ndarray  # (N, 4)
    node_t: jnp.ndarray  # (N, 3)
    node_valid: jnp.ndarray  # (N,)
    # constraints: node pose expected in submap frame
    c_submap: jnp.ndarray  # (C,) int32
    c_node: jnp.ndarray  # (C,) int32
    c_q: jnp.ndarray  # (C, 4) relative rotation
    c_t: jnp.ndarray  # (C, 3) relative translation
    c_trans_weight: jnp.ndarray  # (C,)
    c_rot_weight: jnp.ndarray  # (C,)
    c_valid: jnp.ndarray  # (C,)
    # INTER (loop-closure) flag: with inter_huber_scale > 0, these blocks
    # get a Huber loss — upstream cartographer's behavior
    # (optimization_problem_3d.cc:335 shows the original
    # `new ceres::HuberLoss(huber_scale)` that D-LIOM replaced with
    # TrivialLoss); off by default for reference parity.
    c_is_inter: jnp.ndarray  # (C,)
    # frozen poses stay fixed during optimization (FreezeTrajectory /
    # pure localization, map_builder.cc:220-234)
    submap_fixed: jnp.ndarray  # (S,)
    node_fixed: jnp.ndarray  # (N,)
    # fixed-frame (GPS/navsat) position observations per node
    # (optimization_problem_3d.cc:491-548; the fixed-frame origin's
    # translation is solved jointly as a 3-vector). Residuals get a Huber
    # loss (huber_scale) via IRLS reweighting in _residuals.
    ff_node: jnp.ndarray  # (F,) int32
    ff_t: jnp.ndarray  # (F, 3) measured position in the fixed frame
    ff_weight: jnp.ndarray  # (F,)
    ff_valid: jnp.ndarray  # (F,)
    # landmark observations (landmark_cost_function_3d.h): the landmark POSE
    # (rotation + translation) observed in the tracking frame, from a pose
    # linearly interpolated between the two bracketing nodes at the
    # observation stamp; landmark world poses are variables
    lm_node: jnp.ndarray  # (L,) int32 previous (bracketing) node
    lm_node2: jnp.ndarray  # (L,) int32 next bracketing node
    lm_alpha: jnp.ndarray  # (L,) interpolation parameter in [0, 1]
    lm_id: jnp.ndarray  # (L,) int32 landmark index
    lm_rel_q: jnp.ndarray  # (L, 4) landmark rotation in the tracking frame
    lm_rel_t: jnp.ndarray  # (L, 3) landmark position in the tracking frame
    lm_trans_weight: jnp.ndarray  # (L,)
    lm_rot_weight: jnp.ndarray  # (L,)
    lm_valid: jnp.ndarray  # (L,)
    lm_q: jnp.ndarray  # (K, 4) landmark world rotations (variables)
    lm_positions: jnp.ndarray  # (K, 3) landmark world positions (variables)
    lm_pos_valid: jnp.ndarray  # (K,)
    # node-node relative-pose links: odometry and consecutive local-SLAM
    # costs (upstream optimization_problem_3d.cc:437-489 — commented out in
    # the D-LIOM reference; restored behind use_consecutive_node_costs)
    nn_first: jnp.ndarray  # (Q,) int32
    nn_second: jnp.ndarray  # (Q,) int32
    nn_q: jnp.ndarray  # (Q, 4) expected second-in-first rotation
    nn_t: jnp.ndarray  # (Q, 3)
    nn_trans_weight: jnp.ndarray  # (Q,)
    nn_rot_weight: jnp.ndarray  # (Q,)
    nn_valid: jnp.ndarray  # (Q,)


def make_pose_graph_data(
    max_submaps: int,
    max_nodes: int,
    max_constraints: int,
    max_fixed_frame: int = 256,
    max_landmark_obs: int = 256,
    max_landmarks: int = 64,
    max_node_links: int = 1024,
) -> PoseGraphData:
    qi = jnp.zeros((max_submaps, 4), jnp.float32).at[:, 0].set(1.0)
    qn = jnp.zeros((max_nodes, 4), jnp.float32).at[:, 0].set(1.0)
    qc = jnp.zeros((max_constraints, 4), jnp.float32).at[:, 0].set(1.0)
    ql = jnp.zeros((max_landmark_obs, 4), jnp.float32).at[:, 0].set(1.0)
    qk = jnp.zeros((max_landmarks, 4), jnp.float32).at[:, 0].set(1.0)
    qq = jnp.zeros((max_node_links, 4), jnp.float32).at[:, 0].set(1.0)
    return PoseGraphData(
        submap_q=qi,
        submap_t=jnp.zeros((max_submaps, 3), jnp.float32),
        submap_valid=jnp.zeros(max_submaps, bool),
        node_q=qn,
        node_t=jnp.zeros((max_nodes, 3), jnp.float32),
        node_valid=jnp.zeros(max_nodes, bool),
        c_submap=jnp.zeros(max_constraints, jnp.int32),
        c_node=jnp.zeros(max_constraints, jnp.int32),
        c_q=qc,
        c_t=jnp.zeros((max_constraints, 3), jnp.float32),
        c_trans_weight=jnp.zeros(max_constraints, jnp.float32),
        c_rot_weight=jnp.zeros(max_constraints, jnp.float32),
        c_valid=jnp.zeros(max_constraints, bool),
        c_is_inter=jnp.zeros(max_constraints, bool),
        submap_fixed=jnp.zeros(max_submaps, bool),
        node_fixed=jnp.zeros(max_nodes, bool),
        ff_node=jnp.zeros(max_fixed_frame, jnp.int32),
        ff_t=jnp.zeros((max_fixed_frame, 3), jnp.float32),
        ff_weight=jnp.zeros(max_fixed_frame, jnp.float32),
        ff_valid=jnp.zeros(max_fixed_frame, bool),
        lm_node=jnp.zeros(max_landmark_obs, jnp.int32),
        lm_node2=jnp.zeros(max_landmark_obs, jnp.int32),
        lm_alpha=jnp.zeros(max_landmark_obs, jnp.float32),
        lm_id=jnp.zeros(max_landmark_obs, jnp.int32),
        lm_rel_q=ql,
        lm_rel_t=jnp.zeros((max_landmark_obs, 3), jnp.float32),
        lm_trans_weight=jnp.zeros(max_landmark_obs, jnp.float32),
        lm_rot_weight=jnp.zeros(max_landmark_obs, jnp.float32),
        lm_valid=jnp.zeros(max_landmark_obs, bool),
        lm_q=qk,
        lm_positions=jnp.zeros((max_landmarks, 3), jnp.float32),
        lm_pos_valid=jnp.zeros(max_landmarks, bool),
        nn_first=jnp.zeros(max_node_links, jnp.int32),
        nn_second=jnp.zeros(max_node_links, jnp.int32),
        nn_q=qq,
        nn_t=jnp.zeros((max_node_links, 3), jnp.float32),
        nn_trans_weight=jnp.zeros(max_node_links, jnp.float32),
        nn_rot_weight=jnp.zeros(max_node_links, jnp.float32),
        nn_valid=jnp.zeros(max_node_links, bool),
    )


def _relative_pose_error(iq, it, jq, jt, zq, zt, tw, rw):
    """SpaCostFunction3D residual: h = T_i^-1 * T_j vs measurement z."""
    h_q = quat_multiply(quat_conjugate(iq), jq)
    h_t = quat_inverse_rotate(iq, jt - it)
    e_t = (h_t - zt) * tw[:, None]
    dq = quat_multiply(quat_conjugate(zq), h_q)
    dq = jnp.where(dq[:, 0:1] < 0, -dq, dq)
    e_r = 2.0 * dq[:, 1:4] * rw[:, None]
    return jnp.concatenate([e_t, e_r], axis=-1)


def _residuals(
    data: PoseGraphData,
    d_submap: jnp.ndarray,
    d_node: jnp.ndarray,
    d_extra: jnp.ndarray,
    ff_huber_scale: float = 0.0,
    inter_huber_scale: float = 0.0,
):
    """Weighted residuals at perturbed poses; delta layout per pose:
    [dt (3), dtheta (3)], left-multiplicative rotation. `d_extra` holds
    [fixed-frame-origin dt (3); landmark dt (K, 3); landmark dtheta (K, 3)].

    `ff_huber_scale > 0` applies a Huber loss to each fixed-frame residual
    block (reference: ceres::HuberLoss(huber_scale) on fixed-frame costs,
    optimization_problem_3d.cc:491-548) by IRLS: the robust weight
    sqrt(rho'(||r||^2)) is computed on the CURRENT residual (stop-gradient)
    and rescales it, so each GN step solves the standard reweighted normal
    equations."""
    sq = quat_normalize(
        quat_multiply(quat_from_axis_angle(d_submap[:, 3:6]), data.submap_q)
    )
    st = data.submap_t + d_submap[:, 0:3]
    nq = quat_normalize(
        quat_multiply(quat_from_axis_angle(d_node[:, 3:6]), data.node_q)
    )
    nt = data.node_t + d_node[:, 0:3]

    r = _relative_pose_error(
        sq[data.c_submap], st[data.c_submap],
        nq[data.c_node], nt[data.c_node],
        data.c_q, data.c_t, data.c_trans_weight, data.c_rot_weight,
    )
    r = jnp.where(data.c_valid[:, None], r, 0.0)
    if inter_huber_scale > 0.0:
        # Huber on INTER blocks only (upstream's HuberLoss(huber_scale) on
        # loop constraints) via IRLS, same scheme as the fixed-frame blocks
        a = jnp.float32(inter_huber_scale)
        s = jax.lax.stop_gradient(jnp.sum(r * r, axis=-1))
        w = jnp.where(
            s <= a * a, 1.0, jnp.sqrt(a / jnp.sqrt(jnp.maximum(s, 1e-12)))
        )
        r = jnp.where(data.c_is_inter[:, None], r * w[:, None], r)
    r = r.reshape(-1)

    # node-node relative costs (odometry / consecutive local-SLAM poses)
    r_nn = _relative_pose_error(
        nq[data.nn_first], nt[data.nn_first],
        nq[data.nn_second], nt[data.nn_second],
        data.nn_q, data.nn_t, data.nn_trans_weight, data.nn_rot_weight,
    )
    r_nn = jnp.where(data.nn_valid[:, None], r_nn, 0.0).reshape(-1)

    # fixed-frame (GPS) residuals: node position vs measurement + solved
    # fixed-frame origin translation; Huber-robustified per block
    ff_origin = d_extra[0:3]
    ff_nt = nt[data.ff_node]
    r_ff = (ff_nt - (data.ff_t + ff_origin)) * data.ff_weight[:, None]
    r_ff = jnp.where(data.ff_valid[:, None], r_ff, 0.0)
    if ff_huber_scale > 0.0:
        a = jnp.float32(ff_huber_scale)
        s = jax.lax.stop_gradient(jnp.sum(r_ff * r_ff, axis=-1))
        # rho(s) = s for s <= a^2 else 2a sqrt(s) - a^2; sqrt(rho') scaling
        w = jnp.where(s <= a * a, 1.0, jnp.sqrt(a / jnp.sqrt(jnp.maximum(s, 1e-12))))
        r_ff = r_ff * w[:, None]
    r_ff = r_ff.reshape(-1)

    # landmark residuals (landmark_cost_function_3d.h): the landmark's
    # world POSE vs its observation from the interpolated bracketing-node
    # pose. Node interpolation: linear translation + normalized quaternion
    # lerp (nlerp ~ slerp for the small inter-node rotations at scan rate;
    # documented deviation from InterpolateNodes3D's slerp).
    k = data.lm_positions.shape[0]
    lm_t = data.lm_positions + d_extra[3 : 3 + 3 * k].reshape(-1, 3)
    lm_q = quat_normalize(
        quat_multiply(
            quat_from_axis_angle(d_extra[3 + 3 * k :].reshape(-1, 3)),
            data.lm_q,
        )
    )
    a_ = data.lm_alpha[:, None]
    q1, q2 = nq[data.lm_node], nq[data.lm_node2]
    q2 = jnp.where(jnp.sum(q1 * q2, -1, keepdims=True) < 0, -q2, q2)
    iq = quat_normalize(q1 * (1.0 - a_) + q2 * a_)
    it = nt[data.lm_node] * (1.0 - a_) + nt[data.lm_node2] * a_
    r_lm = _relative_pose_error(
        iq, it, lm_q[data.lm_id], lm_t[data.lm_id],
        data.lm_rel_q, data.lm_rel_t,
        data.lm_trans_weight, data.lm_rot_weight,
    )
    r_lm = jnp.where(data.lm_valid[:, None], r_lm, 0.0).reshape(-1)
    return jnp.concatenate([r, r_nn, r_ff, r_lm])


def solve(
    data: PoseGraphData,
    *,
    iterations: int = 10,
    cg_iterations: int = 64,
    fix_first_submap: bool = True,
    ff_huber_scale: float = 0.0,
    inter_huber_scale: float = 0.0,
    mesh=None,
) -> PoseGraphData:
    """Gauss-Newton with matrix-free PCG on the normal equations.

    `mesh`: optional `jax.sharding.Mesh` — the constraint arrays shard over
    its first axis, so residual and Hessian-vector-product evaluation
    partition across chips; the vjp's per-pose accumulations become partial
    sums that GSPMD reduces with psum over ICI (poses replicated). This is
    the "SPA sharded over ICI" scale-out axis from SURVEY §7."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]

        def shard_c(x):
            spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )

        data = data._replace(
            c_submap=shard_c(data.c_submap),
            c_node=shard_c(data.c_node),
            c_q=shard_c(data.c_q),
            c_t=shard_c(data.c_t),
            c_trans_weight=shard_c(data.c_trans_weight),
            c_rot_weight=shard_c(data.c_rot_weight),
            c_valid=shard_c(data.c_valid),
            c_is_inter=shard_c(data.c_is_inter),
        )
    s = data.submap_q.shape[0]
    n = data.node_q.shape[0]

    free_submap = data.submap_valid & ~data.submap_fixed
    if fix_first_submap:
        free_submap = free_submap & (jnp.arange(s) != 0)
    submap_mask = free_submap[:, None].astype(jnp.float32)
    node_mask = (data.node_valid & ~data.node_fixed)[:, None].astype(jnp.float32)

    k_lm = data.lm_positions.shape[0]
    extra_dim = 3 + 6 * k_lm
    has_ff = data.ff_valid.any()
    lm_free = jnp.concatenate(
        [
            jnp.repeat(has_ff, 3),
            jnp.repeat(data.lm_pos_valid, 3),
            jnp.repeat(data.lm_pos_valid, 3),
        ]
    ).astype(jnp.float32)

    def gn_step(d: PoseGraphData, _):
        def res_flat(deltas):
            ds, dn, de = deltas
            return _residuals(
                d, ds * submap_mask, dn * node_mask, de * lm_free,
                ff_huber_scale=ff_huber_scale,
                inter_huber_scale=inter_huber_scale,
            ).reshape(-1)

        zero = (
            jnp.zeros((s, 6), jnp.float32),
            jnp.zeros((n, 6), jnp.float32),
            jnp.zeros(extra_dim, jnp.float32),
        )
        r0, jvp_fn = jax.linearize(res_flat, zero)
        _, vjp_fn = jax.vjp(res_flat, zero)

        def hv(v):
            (out,) = vjp_fn(jvp_fn(v))
            return out

        (grad,) = vjp_fn(r0)
        n_rows = r0.shape[0]

        # Exact Jacobi preconditioner diag(J^T J): one jvp per tangent dim k
        # with e_k set on EVERY pose at once. Each constraint row depends on
        # exactly one submap and one node, so the jvp evaluated with e_k on
        # all submaps (nodes zeroed) gives, per row, precisely the Jacobian
        # entry of that row's own submap — squared row norms scatter-add into
        # the true diagonal.
        n_spa_rows = d.c_valid.shape[0] * 6

        def col_sq():
            cols = []
            for k in range(6):
                vs = jnp.zeros((s, 6)).at[:, k].set(1.0) * submap_mask
                vn = jnp.zeros((n, 6)).at[:, k].set(1.0) * node_mask
                ze = jnp.zeros(extra_dim)
                js = jvp_fn((vs, jnp.zeros((n, 6)), ze))[:n_spa_rows]
                jn = jvp_fn((jnp.zeros((s, 6)), vn, ze))[:n_spa_rows]
                # accumulate per-pose squared column norms
                rs = (js.reshape(-1, 6) ** 2).sum(-1)
                rn = (jn.reshape(-1, 6) ** 2).sum(-1)
                cols.append((rs, rn, k))
            diag_s = jnp.zeros((s, 6))
            diag_n = jnp.zeros((n, 6))
            for rs, rn, k in cols:
                diag_s = diag_s.at[d.c_submap, k].add(
                    jnp.where(d.c_valid, rs, 0.0)
                )
                diag_n = diag_n.at[d.c_node, k].add(
                    jnp.where(d.c_valid, rn, 0.0)
                )
            # Analytic diagonal contributions of the non-SPA rows (node-node
            # links, fixed-frame, landmarks). The jvp trick above needs each
            # row to touch exactly one variable of the probed block; nn rows
            # touch TWO nodes, so their diagonals are added in closed form
            # (weight^2 per axis — columns of a rotation have unit norm;
            # lever-arm cross terms are dropped: this is a preconditioner,
            # not the Hessian). Without these, a node held only by nn/ff
            # rows gets a ~zero diagonal -> a wildly wrong Jacobi scale.
            tw2 = jnp.where(d.nn_valid, d.nn_trans_weight**2, 0.0)
            rw2 = jnp.where(d.nn_valid, d.nn_rot_weight**2, 0.0)
            for idx in (d.nn_first, d.nn_second):
                diag_n = diag_n.at[idx, 0:3].add(tw2[:, None])
                diag_n = diag_n.at[idx, 3:6].add(rw2[:, None])
            fw2 = jnp.where(d.ff_valid, d.ff_weight**2, 0.0)
            diag_n = diag_n.at[d.ff_node, 0:3].add(fw2[:, None])
            a_lm = d.lm_alpha
            ltw2 = jnp.where(d.lm_valid, d.lm_trans_weight**2, 0.0)
            lrw2 = jnp.where(d.lm_valid, d.lm_rot_weight**2, 0.0)
            diag_n = diag_n.at[d.lm_node, 0:3].add(
                (ltw2 * (1.0 - a_lm) ** 2)[:, None]
            )
            diag_n = diag_n.at[d.lm_node2, 0:3].add((ltw2 * a_lm**2)[:, None])
            diag_n = diag_n.at[d.lm_node, 3:6].add(
                (lrw2 * (1.0 - a_lm) ** 2)[:, None]
            )
            diag_n = diag_n.at[d.lm_node2, 3:6].add((lrw2 * a_lm**2)[:, None])
            return diag_s, diag_n

        diag_s, diag_n = col_sq()
        precond = (
            1.0 / jnp.maximum(diag_s, 1e-6),
            1.0 / jnp.maximum(diag_n, 1e-6),
            jnp.ones(extra_dim),
        )

        def pc(v):
            return tuple(vi * pi for vi, pi in zip(v, precond))

        def dot(a, b):
            return sum(jnp.sum(ai * bi) for ai, bi in zip(a, b))

        def axpy(alpha, x, y):
            return tuple(yi + alpha * xi for xi, yi in zip(x, y))

        b = tuple(-g for g in grad)
        x = (jnp.zeros((s, 6)), jnp.zeros((n, 6)), jnp.zeros(extra_dim))
        r = b
        z = pc(r)
        p = z
        rz = dot(r, z)

        def cg_body(carry, _):
            x, r, p, rz = carry
            hp = hv(p)
            hp = tuple(h + 1e-8 * pi for h, pi in zip(hp, p))
            alpha = rz / jnp.maximum(dot(p, hp), 1e-12)
            x = axpy(alpha, p, x)
            r = axpy(-alpha, hp, r)
            z = pc(r)
            rz_new = dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            p = tuple(zi + beta * pi for zi, pi in zip(z, p))
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(
            cg_body, (x, r, p, rz), None, length=cg_iterations
        )
        ds = x[0] * submap_mask
        dn = x[1] * node_mask
        de = x[2] * lm_free

        new = d._replace(
            submap_q=quat_normalize(
                quat_multiply(quat_from_axis_angle(ds[:, 3:6]), d.submap_q)
            ),
            submap_t=d.submap_t + ds[:, 0:3],
            node_q=quat_normalize(
                quat_multiply(quat_from_axis_angle(dn[:, 3:6]), d.node_q)
            ),
            node_t=d.node_t + dn[:, 0:3],
            # landmark poses persist; the fixed-frame origin delta is
            # exactly linear and re-solved each iteration (marginalized)
            lm_positions=d.lm_positions + de[3 : 3 + 3 * k_lm].reshape(-1, 3),
            lm_q=quat_normalize(
                quat_multiply(
                    quat_from_axis_angle(de[3 + 3 * k_lm :].reshape(-1, 3)),
                    d.lm_q,
                )
            ),
        )
        return new, jnp.sum(r0 * r0)

    data, costs = jax.lax.scan(gn_step, data, None, length=iterations)
    return data
