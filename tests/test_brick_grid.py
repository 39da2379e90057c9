"""Brick grid tests: insertion equivalence vs the dense reference path,
allocation behavior, far-range coverage, slot recycling."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping.brick_grid import (
    BRICK,
    BrickGridSpec,
    dense_crop,
    insert_range_data_brick_dual,
    interpolated_probability_brick,
    lookup_value_brick,
    make_brick_bank,
    reset_slot,
)
from dliom_tpu.mapping.grid import GRID_DTYPE, GridSpec, interpolated_probability
from dliom_tpu.ops.grid_update import insert_range_data_dual

SPEC = BrickGridSpec(resolution=0.1, dir_extent=40, max_bricks=4096)  # ±16 m
DENSE = GridSpec(resolution=0.1, extent=128)  # ±6.4 m crop window


def _insert_both(pts, masks, origins):
    bank = make_brick_bank(SPEC)
    bank = jax.jit(
        functools.partial(insert_range_data_brick_dual, spec=SPEC)
    )(bank, origins, pts, masks)
    dense = jnp.zeros(2 * DENSE.num_cells, GRID_DTYPE)
    dense, _dropped = jax.jit(
        functools.partial(insert_range_data_dual, spec=DENSE)
    )(dense, origins, pts, masks)
    return bank, dense


def test_insert_matches_dense_within_crop():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-5.5, 5.5, (2, 512, 3)).astype(np.float32))
    masks = jnp.ones((2, 512), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    bank, dense = _insert_both(pts, masks, origins)
    for slot in range(2):
        crop = np.asarray(dense_crop(bank, SPEC, slot, DENSE.extent))
        ref = np.asarray(
            dense[slot * DENSE.num_cells : (slot + 1) * DENSE.num_cells]
        )
        np.testing.assert_array_equal(crop, ref)


def test_insert_beyond_dense_extent():
    """Cells out past the dense crop still update (the point of bricks)."""
    pts = jnp.asarray([[[15.0, 0.0, 0.0]], [[0.0, -15.0, 0.0]]], jnp.float32)
    masks = jnp.ones((2, 1), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    bank = make_brick_bank(SPEC)
    bank = insert_range_data_brick_dual(bank, origins, pts, masks, spec=SPEC)
    v0 = lookup_value_brick(bank, jnp.asarray([150, 0, 0]), SPEC, 0)
    v1 = lookup_value_brick(bank, jnp.asarray([0, -150, 0]), SPEC, 1)
    assert int(v0) > 0 and int(v1) > 0
    # the other slot's cell stays unknown (slot isolation)
    assert int(lookup_value_brick(bank, jnp.asarray([150, 0, 0]), SPEC, 1)) == 0


def test_repeat_insert_and_update_once():
    """Second insert of the same scan raises hit cells further; within one
    insert a cell updates once (hits beat misses)."""
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 128, 3)).astype(np.float32))
    masks = jnp.ones((2, 128), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    f = jax.jit(functools.partial(insert_range_data_brick_dual, spec=SPEC))
    bank1 = f(make_brick_bank(SPEC), origins, pts, masks)
    bank2 = f(bank1, origins, pts, masks)
    cells = jnp.round(pts[0] / SPEC.resolution).astype(jnp.int32)
    v1 = np.asarray(jax.vmap(lambda c: lookup_value_brick(bank1, c, SPEC, 0))(cells))
    v2 = np.asarray(jax.vmap(lambda c: lookup_value_brick(bank2, c, SPEC, 0))(cells))
    assert np.all(v2 >= v1) and np.any(v2 > v1)


def test_interpolation_matches_dense():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-5, 5, (2, 512, 3)).astype(np.float32))
    masks = jnp.ones((2, 512), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    bank, dense = _insert_both(pts, masks, origins)
    q = jnp.asarray(rng.uniform(-4, 4, (64, 3)).astype(np.float32))
    pb = interpolated_probability_brick(bank, q, SPEC, 0)
    pd = interpolated_probability(dense[: DENSE.num_cells], q, DENSE)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pd), atol=1e-6)


def test_reset_slot_recycles():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 128, 3)).astype(np.float32))
    masks = jnp.ones((2, 128), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    f = jax.jit(functools.partial(insert_range_data_brick_dual, spec=SPEC))
    bank = f(make_brick_bank(SPEC), origins, pts, masks)
    assert int(bank.counts[0]) > 0
    bank = reset_slot(bank, SPEC, 0)
    assert int(bank.counts[0]) == 0
    cells = jnp.round(pts[0, 0] / SPEC.resolution).astype(jnp.int32)
    assert int(lookup_value_brick(bank, cells, SPEC, 0)) == 0
    # slot 1 untouched
    cells1 = jnp.round(pts[1, 0] / SPEC.resolution).astype(jnp.int32)
    assert int(lookup_value_brick(bank, cells1, SPEC, 1)) > 0
    # reinsert into the recycled slot works and matches a fresh insert
    bank_re = f(bank, origins, pts, masks)
    fresh = f(make_brick_bank(SPEC), origins, pts, masks)
    crop_a = np.asarray(dense_crop(bank_re, SPEC, 0, 64))
    crop_b = np.asarray(dense_crop(fresh, SPEC, 0, 64))
    np.testing.assert_array_equal(crop_a, crop_b)


GROUPED = BrickGridSpec(
    resolution=0.1, dir_extent=40, max_bricks=4096, apply_groups=128
)


def test_epoch_wrap_is_harmless():
    """Epoch-tagged slot resets survive epoch-space wraparound: the bump
    wraps through spec.epoch_mask (an unmasked increment would overflow
    into the int32 sign bit, after which every lookup silently misses
    forever), encoded entries stay non-negative at the top of the epoch
    space, and post-wrap inserts behave exactly like fresh ones."""
    spec = GROUPED
    # static guard arithmetic: the incremental sweep covers the whole
    # directory within one epoch-wrap period
    assert spec.epoch_mask > 0
    assert spec.sweep_per_reset * (spec.epoch_mask + 1) >= spec.num_dir_groups

    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 128, 3)).astype(np.float32))
    masks = jnp.ones((2, 128), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    f = jax.jit(functools.partial(insert_range_data_brick_dual, spec=spec))

    # park slot 0 one reset below the top of the epoch space
    bank = make_brick_bank(spec)._replace(
        epochs=jnp.asarray([spec.epoch_mask - 1, 0], jnp.int32)
    )
    bank = reset_slot(bank, spec, 0)  # -> epoch_mask (top)
    assert int(bank.epochs[0]) == spec.epoch_mask
    bank = f(bank, origins, pts, masks)  # entries tagged with the top epoch
    cell = jnp.round(pts[0, 0] / spec.resolution).astype(jnp.int32)
    assert int(lookup_value_brick(bank, cell, spec, 0)) > 0
    assert int(np.asarray(bank.directory).max()) >= 0  # sign bit never set

    bank = reset_slot(bank, spec, 0)  # WRAP: epoch_mask -> 0
    assert int(bank.epochs[0]) == 0
    # top-epoch-tagged entries must not validate at the wrapped epoch
    assert int(lookup_value_brick(bank, cell, spec, 0)) == 0
    # reinsert into the wrapped slot matches a fresh bank's content
    bank_re = f(bank, origins, pts, masks)
    fresh = f(make_brick_bank(spec), origins, pts, masks)
    np.testing.assert_array_equal(
        np.asarray(dense_crop(bank_re, spec, 0, 64)),
        np.asarray(dense_crop(fresh, spec, 0, 64)),
    )


def test_reset_slot_incremental_sweep_clears_rotating_entry():
    """Each reset clears sweep_per_reset rotating directory entries of the
    recycled slot, so every entry is rewritten at least once per epoch-wrap
    period and a wrapped epoch can never false-validate a stale entry."""
    spec = GROUPED
    e, k = 7, spec.sweep_per_reset
    idx = (e * k) % spec.num_dir_groups  # slot-0 entry the sweep visits
    bank = make_brick_bank(spec)._replace(
        epochs=jnp.asarray([e, 0], jnp.int32)
    )
    bank = bank._replace(directory=bank.directory.at[idx].set(123))
    kept = reset_slot(bank, spec, 0, pending=False)
    assert int(kept.directory[idx]) == 123 and int(kept.epochs[0]) == e
    swept = reset_slot(bank, spec, 0)
    assert int(swept.directory[idx]) == -1
    assert int(swept.epochs[0]) == e + 1


def test_pool_overflow_drops_new_bricks():
    tiny = BrickGridSpec(resolution=0.1, dir_extent=40, max_bricks=8)
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(-10, 10, (2, 256, 3)).astype(np.float32))
    masks = jnp.ones((2, 256), bool)
    origins = jnp.zeros((2, 3), jnp.float32)
    bank = insert_range_data_brick_dual(
        make_brick_bank(tiny), origins, pts, masks, spec=tiny
    )
    assert int(bank.counts[0]) <= 8 and int(bank.counts[1]) <= 8
    # no out-of-range directory entries
    d = np.asarray(bank.directory)
    assert d.max() < 8
