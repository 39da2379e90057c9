"""Loop-proposal recall/precision benchmark for the submap-image path.

De-risks the SURF -> FFT-NCC substitution (SURVEY C10, VERDICT r1 #7): a
synthetic long-loop scenario where the revisit drift exceeds both the
proximity gate and the BnB search window, so ONLY the image-proposal path
can close the loop. Measures, over many random worlds:

  * proposal recall — the true revisit target is among the image proposals,
  * proposal precision — fraction of proposals that are the true target
    (distinct sceneries per visited place; a proposal to a different place
    is a false positive),
  * end-to-end closure rate — an INTER constraint to the true target with a
    correct relative pose survives the BnB verifier + refinement (the
    reference verifies SURF proposals the same way,
    constraint_builder_3d.cc:202-347).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python tools/loop_recall.py [trials]
Record the rates in PARITY.md.
"""

import json
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dliom_tpu.backend.pose_graph import PoseGraph  # noqa: E402
from dliom_tpu.mapping import probability as pv  # noqa: E402
from dliom_tpu.mapping.grid import cell_index, make_grid, set_cells  # noqa: E402
from dliom_tpu.mapping.submap import grid_specs  # noqa: E402
from dliom_tpu.transform.rigid import Rigid3  # noqa: E402
from tests.test_pose_graph import _cfg, _make_node  # noqa: E402


def _place_cloud(rng, n=1200):
    """A distinct scenery per place: random wall segments + scattered posts
    on a floor — enough structure for both the image and the grids."""
    out = []
    for _ in range(4):  # wall segments
        c = rng.uniform(-6, 6, 2)
        ang = rng.uniform(0, np.pi)
        length = rng.uniform(4, 10)
        s = rng.uniform(-length / 2, length / 2, n // 6)
        out.append(
            np.stack(
                [
                    c[0] + s * np.cos(ang),
                    c[1] + s * np.sin(ang),
                    rng.uniform(-2, 2, n // 6),
                ],
                -1,
            )
        )
    k = n - 4 * (n // 6)
    out.append(
        np.stack(
            [rng.uniform(-7, 7, k), rng.uniform(-7, 7, k), np.full(k, -2.0)], -1
        )
    )
    return np.concatenate(out).astype(np.float32)


def run_trial(seed: int, num_places: int = 5, drift_norm: float = 8.0):
    import dataclasses as dc

    cfg = _cfg()
    pgc = dc.replace(
        cfg.pose_graph,
        max_radius_enable_loop_detection=2.0,  # proximity gate: too small
        num_close_submaps_loop_with_initial_value=1,
        optimize_every_n_nodes=0,
    )
    tb = cfg.trajectory_builder
    pg = PoseGraph(pgc, tb)
    hi, lo = grid_specs(tb.submaps)
    rng = np.random.default_rng(seed)
    vals_of = lambda pts: jnp.full(
        (pts.shape[0],), pv.probability_to_value(jnp.float32(0.9))
    )

    clouds = [_place_cloud(rng) for _ in range(num_places)]
    grids = []
    for c in clouds:
        pts = jnp.asarray(c)
        grids.append(
            (
                set_cells(make_grid(hi), cell_index(pts, hi.resolution), vals_of(pts), hi),
                set_cells(make_grid(lo), cell_index(pts, lo.resolution), vals_of(pts), lo),
            )
        )

    # travel through distinct places 30 m apart, then revisit place 0 with
    # accumulated drift far beyond the gate and the BnB window
    for k in range(num_places):
        pose = Rigid3.translation_only(jnp.asarray([30.0 * k, 0.0, 0.0]))
        s = pg.add_submap(pose)
        pg.add_node(_make_node(cfg, clouds[k], pose), (s,))
        pg.finish_submap(s, *grids[k])

    d = rng.normal(0, 1, 3)
    d[2] *= 0.05
    drift = jnp.asarray(drift_norm * d / np.linalg.norm(d), jnp.float32)
    revisit_pose = Rigid3.translation_only(drift)
    s_new = pg.add_submap(revisit_pose)
    proposals = {}
    orig = pg._image_proposals

    def spy(from_id):
        out = orig(from_id)
        proposals.update(out)
        return out

    pg._image_proposals = spy
    pg.add_node(
        _make_node(cfg, clouds[0], revisit_pose), (s_new,),
        newly_finished_submap_id=s_new, finished_grids=grids[0],
    )

    proposed = set(proposals.keys())
    recall = 1.0 if 0 in proposed else 0.0
    precision = (1.0 / len(proposed)) if 0 in proposed else 0.0 if proposed else 1.0
    inter = [
        c for c in pg.constraints if c.tag == "INTER" and c.submap_id == 0
    ]
    closed = bool(inter) and float(
        jnp.linalg.norm(inter[0].relative.translation)
    ) < 0.5
    false_inter = [
        c for c in pg.constraints if c.tag == "INTER" and c.submap_id != 0
    ]
    return {
        "recall": recall,
        "precision": precision,
        "closed": 1.0 if closed else 0.0,
        "false_constraints": len(false_inter),
    }


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rows = [run_trial(1000 + k) for k in range(trials)]
    agg = {
        "trials": trials,
        "proposal_recall": sum(r["recall"] for r in rows) / trials,
        "proposal_precision": sum(r["precision"] for r in rows) / trials,
        "e2e_closure_rate": sum(r["closed"] for r in rows) / trials,
        "false_constraints_total": sum(r["false_constraints"] for r in rows),
    }
    print(json.dumps(agg), flush=True)


if __name__ == "__main__":
    main()
