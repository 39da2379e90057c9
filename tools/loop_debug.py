"""Diagnose missed loop closures on the long course.

Re-runs the long-course dataset through MapBuilder, then for a sample of
ground-truth-close (finished submap, node) pairs WITHOUT a found constraint,
scores the node at its GROUND-TRUTH pose in the submap frame:

  - BnB pyramid score of the high cloud at the gt pose (what depth-0
    scoring would see if the search landed exactly right),
  - low-resolution-grid score at the gt pose (the min_low_resolution_score
    gate input),
  - fraction of high/low cloud points inside the cropped grids,
  - the initial-guess error (estimated relative vs gt relative) against the
    search windows.

This separates "the score gates reject a correct pose" (capacity-crop
dilution, gate tuning) from "the search never reaches the correct pose"
(initial drift beyond the window, pruning).

Usage: python tools/loop_debug.py --dataset /tmp/long_course_2.0_11.npz
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--pairs", type=int, default=12)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    np.asarray(jnp.zeros(1))

    sys.argv = ["long_course"]
    import tools.long_course as lc
    from dliom_tpu.runner import offline
    from dliom_tpu.backend.precomputation import probability_from_byte, lookup
    from dliom_tpu.mapping.grid import cell_index, interpolated_probability
    from dliom_tpu.transform.rigid import Rigid3

    z = np.load(args.dataset)
    gt = (z["gt/times"], z["gt/rotations"], z["gt/positions"])

    # the exact engine configuration the course runs under
    overrides = lc.course_overrides()
    run_args = argparse.Namespace(
        dataset=args.dataset, preset="basic",
        config_overrides=json.dumps(overrides),
        output_csv=None, output_state=None, output_pbstream=None,
        output_range_data=None, output_kitti=None, output_tum=None,
        output_relations=None, relations_min_covered_distance=100.0,
        output_ply=None, output_xray=None, assets_pipeline=None,
        assets_dir=None, verbose=False,
        load_state=None, pure_localization=False, profile=None,
        background_threads=True, pipeline_depth=1,
    )

    holder = {}

    def on_builder(builder, report):
        holder["builder"] = builder
        holder["report"] = report

    report = offline.run(run_args, on_builder=on_builder)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}), flush=True)

    builder = holder["builder"]
    pg = builder.pose_graph
    gt_times, gt_quats, gt_pos = gt

    def node_gt(nid):
        i = int(np.argmin(np.abs(gt_times - pg.nodes[nid].time)))
        return gt_quats[i], gt_pos[i]

    def submap_gt(sid):
        sub = pg.submaps[sid]
        n0 = sub.node_ids[0]
        qn, pn = node_gt(n0)
        node_l = pg.nodes[n0].local_pose
        qo, po = lc._np_rigid_inv_compose(
            np.asarray(node_l.rotation, np.float64),
            np.asarray(node_l.translation, np.float64),
            np.asarray(sub.local_pose.rotation, np.float64),
            np.asarray(sub.local_pose.translation, np.float64),
        )
        q = lc._np_quat_multiply(qn, qo)
        p = pn + lc._np_quat_to_matrix(qn) @ po
        return q, p

    every = max(1, pg.cfg.constraint_builder.every_nodes_to_find_constraint)
    have = {(c.submap_id, c.node_id) for c in pg.constraints if c.tag == "INTER"}
    missed = []
    for sid, sub in enumerate(pg.submaps):
        if not (sub.finished and sub.high is not None):
            continue
        qs, ps = submap_gt(sid)
        ts = pg.nodes[sub.node_ids[0]].time
        sub_nodes = set(sub.node_ids)
        for nid in range(0, len(pg.nodes), every):
            if nid in sub_nodes or (sid, nid) in have:
                continue
            if abs(pg.nodes[nid].time - ts) < 60.0:
                continue
            qn, pn = node_gt(nid)
            if np.linalg.norm(pn - ps) < 7.0:
                missed.append((sid, nid, (qs, ps), (qn, pn)))
    print(f"missed gt-close pairs: {len(missed)}", flush=True)
    rng = np.random.default_rng(0)
    rng.shuffle(missed)
    pg._matcher_fns()
    hi, lo = pg._hi_spec, pg._lo_spec
    for sid, nid, (qs, ps), (qn, pn) in missed[: args.pairs]:
        q_rel, p_rel = lc._np_rigid_inv_compose(qs, ps, qn, pn)
        gt_rel = Rigid3(
            jnp.asarray(q_rel, jnp.float32), jnp.asarray(p_rel, jnp.float32)
        )
        node = pg.nodes[nid]
        init = pg._initial_guess(pg.submaps[sid], node)
        init_t_err = float(np.linalg.norm(
            np.asarray(init.translation, np.float64) - p_rel))
        g_hi, g_lo, pyr = pg._decompressed_grids(sid)

        hp = jnp.asarray(node.high_points); hm = jnp.asarray(node.high_mask)
        lp = jnp.asarray(node.low_points); lm = jnp.asarray(node.low_mask)
        # depth-0 pyramid score at the gt pose
        cells = cell_index(gt_rel.apply(hp), hi.resolution)
        vals = lookup(pyr.levels[0], cells, hi.half)
        inb = jnp.all(
            (cells + hi.half >= 0) & (cells + hi.half < hi.extent), axis=-1
        ) & hm
        n_valid = jnp.maximum(jnp.sum(hm.astype(jnp.float32)), 1.0)
        score_all = probability_from_byte(
            jnp.sum(jnp.where(hm, vals, 0).astype(jnp.float32)) / n_valid
        )
        n_in = jnp.maximum(jnp.sum(inb.astype(jnp.float32)), 1.0)
        score_in = probability_from_byte(
            jnp.sum(jnp.where(inb, vals, 0).astype(jnp.float32)) / n_in
        )
        # low-res gate at the gt pose
        lo_cells = cell_index(gt_rel.apply(lp), lo.resolution)
        lo_inb = jnp.all(
            (lo_cells + lo.half >= 0) & (lo_cells + lo.half < lo.extent),
            axis=-1,
        ) & lm
        p_low = interpolated_probability(g_lo, gt_rel.apply(lp), lo)
        n_lo = jnp.maximum(jnp.sum(lm.astype(jnp.float32)), 1.0)
        low_all = jnp.sum(jnp.where(lm, p_low, 0.0)) / n_lo
        n_lo_in = jnp.maximum(jnp.sum(lo_inb.astype(jnp.float32)), 1.0)
        low_in = jnp.sum(jnp.where(lo_inb, p_low, 0.0)) / n_lo_in
        out = jax.device_get({
            "score_all": score_all, "score_inbounds": score_in,
            "hi_frac_in": n_in / n_valid,
            "low_all": low_all, "low_inbounds": low_in,
            "lo_frac_in": n_lo_in / n_lo,
        })
        print(json.dumps({
            "pair": [sid, nid],
            "init_t_err_m": round(init_t_err, 2),
            "gt_rel_t": [round(float(x), 1) for x in p_rel],
            **{k: round(float(v), 3) for k, v in out.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
