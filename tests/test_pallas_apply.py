"""Equivalence of the grouped Pallas apply path with the XLA sort/scatter
insert (mapping/brick_grid.py): identical pool contents, directory,
allocation counts, and reverse map for the same inserted scans — including
duplicate-record hit-over-miss priority (range_data_inserter_3d.cc:86-91)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dliom_tpu.mapping.brick_grid import (
    BrickGridSpec,
    _insert_brick_slots,
    make_brick_bank,
)


def _insert(spec, bank, origins, hits, masks):
    return _insert_brick_slots(
        bank, origins, hits, masks, spec=spec,
        hit_probability=0.55, miss_probability=0.49, num_free_space_voxels=2,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_apply_matches_xla_insert(seed):
    base = dict(resolution=0.1, dir_extent=16, max_bricks=768)
    spec_x = BrickGridSpec(**base, apply_groups=0)
    spec_p = BrickGridSpec(**base, apply_groups=128)

    rng = np.random.default_rng(seed)
    n = 512
    # cluster points so cells collide (duplicate records, mixed hit/miss);
    # spread sized so the touched-group working set stays under the pool's
    # group capacity (768 bricks / 32 = 24 groups, minus the parking group)
    hits = rng.normal(0, 0.8, (2, n, 3)).astype(np.float32)
    hits[:, : n // 4] = hits[:, n // 4 : n // 2]  # exact duplicates
    masks = rng.random((2, n)) < 0.9
    origins = rng.normal(0, 0.3, (2, 3)).astype(np.float32)

    bank_x = make_brick_bank(spec_x)
    bank_p = make_brick_bank(spec_p)
    for _ in range(3):
        bank_x = _insert(spec_x, bank_x, jnp.asarray(origins),
                         jnp.asarray(hits), jnp.asarray(masks))
        bank_p = _insert(spec_p, bank_p, jnp.asarray(origins),
                         jnp.asarray(hits), jnp.asarray(masks))

    np.testing.assert_array_equal(np.asarray(bank_x.counts), np.asarray(bank_p.counts))
    np.testing.assert_array_equal(
        np.asarray(bank_x.directory), np.asarray(bank_p.directory))
    np.testing.assert_array_equal(np.asarray(bank_x.pool), np.asarray(bank_p.pool))
    np.testing.assert_array_equal(
        np.asarray(bank_x.group_of_slot), np.asarray(bank_p.group_of_slot))
    assert int(np.asarray(bank_p.counts).sum()) > 0


def test_dense_grouped_apply_matches_xla_insert():
    """The dense-bank grouped path (ops/grid_update.py) must reproduce the
    XLA path exactly; the padded bank's tail group must stay untouched."""
    from dliom_tpu.mapping.grid import GridSpec
    from dliom_tpu.ops.grid_update import _insert_slots
    from dliom_tpu.ops.pallas_apply import DENSE_CELLS_PER_GROUP

    spec_x = GridSpec(resolution=0.5, extent=32, apply_groups=0)
    spec_p = GridSpec(resolution=0.5, extent=32, apply_groups=8)
    rng = np.random.default_rng(3)
    n = 512
    hits = rng.normal(0, 4.0, (2, n, 3)).astype(np.float32)
    hits[:, : n // 4] = hits[:, n // 4 : n // 2]
    masks = rng.random((2, n)) < 0.9
    origins = rng.normal(0, 0.5, (2, 3)).astype(np.float32)

    vx = jnp.zeros(2 * spec_x.num_cells, jnp.int16)
    vp = jnp.zeros(2 * spec_p.num_cells + DENSE_CELLS_PER_GROUP, jnp.int16)
    for _ in range(3):
        vx, dx = _insert_slots(vx, jnp.asarray(origins), jnp.asarray(hits),
                               jnp.asarray(masks), spec=spec_x,
                               hit_probability=0.55, miss_probability=0.49,
                               num_free_space_voxels=2)
        vp, dp = _insert_slots(vp, jnp.asarray(origins), jnp.asarray(hits),
                               jnp.asarray(masks), spec=spec_p,
                               hit_probability=0.55, miss_probability=0.49,
                               num_free_space_voxels=2)
        assert int(dx) == 0 and int(dp) == 0  # capacity not exceeded here
    vp = np.asarray(vp)
    np.testing.assert_array_equal(np.asarray(vx), vp[: 2 * spec_x.num_cells])
    assert (vp[2 * spec_x.num_cells :] == 0).all()  # padding untouched
    assert (vp != 0).sum() > 0


def test_dense_grouped_overflow_is_counted():
    """Dense grouped-apply overflow must be REPORTED (no silent truncation):
    dropped = touched groups beyond the apply capacity, and dropped groups'
    cells stay untouched (never half-applied)."""
    from dliom_tpu.mapping.grid import GridSpec
    from dliom_tpu.ops.grid_update import _insert_slots
    from dliom_tpu.ops.pallas_apply import DENSE_CELLS_PER_GROUP

    # extent 32 -> 2 slots * 32^3 = 65536 cells = 4 groups; capacity 1
    spec_tiny = GridSpec(resolution=0.5, extent=32, apply_groups=1)
    spec_full = GridSpec(resolution=0.5, extent=32, apply_groups=4)
    rng = np.random.default_rng(9)
    hits = rng.normal(0, 6.0, (2, 512, 3)).astype(np.float32)
    masks = np.ones((2, 512), bool)
    origins = np.zeros((2, 3), np.float32)
    args = (jnp.asarray(origins), jnp.asarray(hits), jnp.asarray(masks))

    v0 = jnp.zeros(2 * spec_tiny.num_cells + DENSE_CELLS_PER_GROUP, jnp.int16)
    v_tiny, d_tiny = _insert_slots(
        v0, *args, spec=spec_tiny, hit_probability=0.55,
        miss_probability=0.49, num_free_space_voxels=2)
    v_full, d_full = _insert_slots(
        v0, *args, spec=spec_full, hit_probability=0.55,
        miss_probability=0.49, num_free_space_voxels=2)
    assert int(d_full) == 0
    touched_full = {
        int(g)
        for g in np.flatnonzero(
            np.asarray(v_full).reshape(-1, DENSE_CELLS_PER_GROUP).any(axis=1)
        )
    }
    assert int(d_tiny) == len(touched_full) - 1  # kept exactly one group
    groups_tiny = np.asarray(v_tiny).reshape(-1, DENSE_CELLS_PER_GROUP)
    kept = np.flatnonzero(groups_tiny.any(axis=1))
    assert len(kept) == 1 and int(kept[0]) in touched_full
    # the kept group matches the full-capacity insert exactly
    np.testing.assert_array_equal(
        groups_tiny[kept[0]],
        np.asarray(v_full).reshape(-1, DENSE_CELLS_PER_GROUP)[kept[0]],
    )


def test_group_overflow_drops_whole_groups():
    """With a tiny group capacity, overflowing groups must be dropped whole —
    no neighbor-group records may leak into the last kept group's range."""
    base = dict(resolution=0.1, dir_extent=16, max_bricks=256)
    spec_p = BrickGridSpec(**base, apply_groups=2)
    rng = np.random.default_rng(2)
    hits = rng.normal(0, 3.0, (2, 256, 3)).astype(np.float32)
    masks = np.ones((2, 256), bool)
    origins = np.zeros((2, 3), np.float32)
    bank = _insert(spec_p, make_brick_bank(spec_p), jnp.asarray(origins),
                   jnp.asarray(hits), jnp.asarray(masks))
    pool = np.asarray(bank.pool).reshape(-1, spec_p.apply_group_bricks * 512)
    touched = (pool != 0).any(axis=1)
    assert touched.sum() <= 2  # at most `apply_groups` groups written


def test_reset_and_reinsert_grouped_matches_fresh():
    """Grouped configs recycle a slot WITHOUT clearing its pool region: the
    directory scatter-clear makes stale cells unreachable and the kernel's
    `fresh` flag zero-fills re-allocated groups. A reset + reinsert must be
    indistinguishable from inserting into a brand-new bank."""
    from dliom_tpu.mapping.brick_grid import dense_crop, reset_slot

    base = dict(resolution=0.1, dir_extent=16, max_bricks=768)
    spec_p = BrickGridSpec(**base, apply_groups=128)
    rng = np.random.default_rng(7)
    hits0 = rng.normal(0, 0.8, (2, 256, 3)).astype(np.float32)
    hits1 = rng.normal(0.5, 0.8, (2, 256, 3)).astype(np.float32)
    masks = np.ones((2, 256), bool)
    origins = np.zeros((2, 3), np.float32)

    bank = _insert(spec_p, make_brick_bank(spec_p), jnp.asarray(origins),
                   jnp.asarray(hits0), jnp.asarray(masks))
    assert int(bank.counts[0]) > 0
    bank = reset_slot(bank, spec_p, 0)
    assert int(bank.counts[0]) == 0
    # stale pool cells must be invisible through the cleared directory
    assert int(np.abs(np.asarray(dense_crop(bank, spec_p, 0, 32))).sum()) == 0
    bank = _insert(spec_p, bank, jnp.asarray(origins),
                   jnp.asarray(hits1), jnp.asarray(masks))
    fresh_bank = _insert(spec_p, make_brick_bank(spec_p), jnp.asarray(origins),
                         jnp.asarray(hits1), jnp.asarray(masks))
    crop_a = np.asarray(dense_crop(bank, spec_p, 0, 64))
    crop_b = np.asarray(dense_crop(fresh_bank, spec_p, 0, 64))
    np.testing.assert_array_equal(crop_a, crop_b)

    # Backend capture must also be stale-blind: compress_brick masks stale
    # pool groups BEFORE its top_k — otherwise the previous occupant's cells
    # crowd out every real cell and recycled submaps compress to empty.
    from dliom_tpu.mapping.brick_grid import compress_brick
    from dliom_tpu.mapping.grid import GridSpec

    dense_spec = GridSpec(resolution=0.1, extent=64)
    ca = compress_brick(bank, spec_p, 0, dense_spec, 256)
    cb = compress_brick(fresh_bank, spec_p, 0, dense_spec, 256)
    assert int(ca.count) == int(cb.count) and int(ca.count) > 0
    np.testing.assert_array_equal(np.asarray(ca.indices), np.asarray(cb.indices))
    np.testing.assert_array_equal(np.asarray(ca.values), np.asarray(cb.values))


def test_many_epochs_recycle_grouped():
    """The O(1) epoch-bump reset must stay correct across MANY recycles:
    entries tagged with any older epoch read as unallocated, and each
    re-insert matches a fresh bank bit-for-bit (directory entries are
    `(epoch << pg_bits) | pool_group`, mapping/brick_grid.py BrickBank)."""
    from dliom_tpu.mapping.brick_grid import dense_crop, reset_slot

    base = dict(resolution=0.1, dir_extent=16, max_bricks=768)
    spec_p = BrickGridSpec(**base, apply_groups=128)
    rng = np.random.default_rng(11)
    masks = jnp.asarray(np.ones((2, 256), bool))
    origins = jnp.asarray(np.zeros((2, 3), np.float32))

    bank = make_brick_bank(spec_p)
    for epoch in range(1, 6):
        hits = jnp.asarray(
            rng.normal(0.1 * epoch, 0.8, (2, 256, 3)).astype(np.float32)
        )
        bank = reset_slot(bank, spec_p, 0)
        assert int(bank.epochs[0]) == epoch and int(bank.epochs[1]) == 0
        # every pre-reset cell reads as unknown through the bumped epoch
        assert int(np.abs(np.asarray(dense_crop(bank, spec_p, 0, 32))).sum()) == 0
        bank = _insert(spec_p, bank, origins, hits, masks)
        fresh = _insert(spec_p, make_brick_bank(spec_p), origins, hits, masks)
        np.testing.assert_array_equal(
            np.asarray(dense_crop(bank, spec_p, 0, 64)),
            np.asarray(dense_crop(fresh, spec_p, 0, 64)),
        )
