"""Grid core tests mirroring the reference's hybrid_grid_test.cc,
range_data_inserter_3d_test.cc, and interpolated_grid_test.cc."""

import jax
import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping import probability as pv
from dliom_tpu.mapping.grid import (
    GridSpec,
    cell_index,
    interpolated_probability,
    linear_index,
    lookup_probability,
    lookup_value,
    make_grid,
    set_cells,
)
from dliom_tpu.ops.grid_update import insert_range_data


def test_cell_index_round_convention():
    # hybrid_grid.h:430 — round(point / resolution)
    cells = cell_index(jnp.asarray([[0.24, 0.26, -0.26], [0.0, -0.1, 1.0]]), 0.5)
    np.testing.assert_array_equal(np.asarray(cells), [[0, 1, -1], [0, 0, 2]])


def test_set_get_roundtrip_and_bounds():
    spec = GridSpec(resolution=0.5, extent=32)
    g = make_grid(spec)
    cells = jnp.asarray([[0, 0, 0], [5, -7, 3], [-16, 15, 0]], jnp.int32)
    vals = jnp.asarray([100, 200, 32767], jnp.int32)
    g = set_cells(g, cells, vals, spec)
    np.testing.assert_array_equal(np.asarray(lookup_value(g, cells, spec)), np.asarray(vals))
    # out of bounds reads unknown, writes are dropped
    oob = jnp.asarray([[16, 0, 0], [0, -17, 0]], jnp.int32)
    assert np.all(np.asarray(lookup_value(g, oob, spec)) == 0)
    g2 = set_cells(g, oob, jnp.asarray([5, 5]), spec)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g))


def _get_prob(g, spec, xyz):
    return float(
        lookup_probability(g, cell_index(jnp.asarray(xyz, jnp.float32), spec.resolution), spec)
    )


def _insert_test_cloud(g, spec):
    # Mirror of RangeDataInserter3DTest::InsertPointCloud
    origin = jnp.asarray([0.0, 0.0, -4.0])
    returns = jnp.asarray(
        [[-3.0, -1.0, 4.0], [-2.0, 0.0, 4.0], [-1.0, 1.0, 4.0], [0.0, 2.0, 4.0]]
    )
    mask = jnp.ones(4, bool)
    return insert_range_data(
        g,
        origin,
        returns,
        mask,
        spec=spec,
        hit_probability=0.7,
        miss_probability=0.4,
        num_free_space_voxels=1000,
    )


def test_insert_point_cloud_matches_reference():
    spec = GridSpec(resolution=1.0, extent=32)
    g = _insert_test_cloud(make_grid(spec), spec)
    assert abs(_get_prob(g, spec, [0, 0, -4]) - 0.4) < 1e-4
    assert abs(_get_prob(g, spec, [0, 0, -3]) - 0.4) < 1e-4
    assert abs(_get_prob(g, spec, [0, 0, -2]) - 0.4) < 1e-4
    for x in range(-4, 5):
        for y in range(-4, 5):
            known = float(
                lookup_value(g, jnp.asarray([x, y, 4], jnp.int32), spec)
            )
            if x < -3 or x > 0 or y != x + 2:
                assert known == 0, (x, y)
            else:
                assert abs(_get_prob(g, spec, [x, y, 4]) - 0.7) < 1e-4


def test_probability_progression():
    spec = GridSpec(resolution=1.0, extent=32)
    g = make_grid(spec)
    insert = jax.jit(lambda grid: _insert_test_cloud(grid, spec))
    g = insert(g)
    assert abs(_get_prob(g, spec, [-2, 0, 4]) - 0.7) < 1e-4
    assert abs(_get_prob(g, spec, [-2, 0, 3]) - 0.4) < 1e-4
    for _ in range(200):
        g = insert(g)
    assert abs(_get_prob(g, spec, [-2, 0, 4]) - pv.MAX_PROBABILITY) < 1e-3
    assert abs(_get_prob(g, spec, [-2, 0, 3]) - pv.MIN_PROBABILITY) < 1e-3
    assert abs(_get_prob(g, spec, [0, 0, -3]) - pv.MIN_PROBABILITY) < 1e-3


def test_hit_priority_over_miss():
    # A ray passing through another ray's hit cell must not erase the hit.
    spec = GridSpec(resolution=1.0, extent=32)
    g = make_grid(spec)
    origin = jnp.asarray([0.0, 0.0, 0.0])
    # hit at (2,0,0); second ray to (5,0,0) passes through (2,0,0) as a miss
    returns = jnp.asarray([[2.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    g = insert_range_data(
        g, origin, returns, jnp.ones(2, bool), spec=spec,
        hit_probability=0.7, miss_probability=0.4, num_free_space_voxels=1000,
    )
    assert abs(_get_prob(g, spec, [2, 0, 0]) - 0.7) < 1e-4
    assert abs(_get_prob(g, spec, [1, 0, 0]) - 0.4) < 1e-4
    assert abs(_get_prob(g, spec, [3, 0, 0]) - 0.4) < 1e-4
    assert abs(_get_prob(g, spec, [4, 0, 0]) - 0.4) < 1e-4


def test_update_once_per_insert():
    # Duplicate hits in one insert count once (kUpdateMarker semantics).
    spec = GridSpec(resolution=1.0, extent=16)
    g = make_grid(spec)
    returns = jnp.tile(jnp.asarray([[3.0, 0.0, 0.0]]), (10, 1))
    g = insert_range_data(
        g, jnp.zeros(3), returns, jnp.ones(10, bool), spec=spec,
        hit_probability=0.7, miss_probability=0.4, num_free_space_voxels=0,
    )
    assert abs(_get_prob(g, spec, [3, 0, 0]) - 0.7) < 1e-4


def test_masked_points_ignored():
    spec = GridSpec(resolution=1.0, extent=16)
    g = make_grid(spec)
    returns = jnp.asarray([[3.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    mask = jnp.asarray([True, False])
    g = insert_range_data(
        g, jnp.zeros(3), returns, mask, spec=spec,
        hit_probability=0.7, miss_probability=0.4, num_free_space_voxels=2,
    )
    assert _get_prob(g, spec, [3, 0, 0]) > 0.5
    assert float(lookup_value(g, jnp.asarray([0, 3, 0], jnp.int32), spec)) == 0


def test_interpolation_matches_grid_at_centers():
    # interpolated_grid_test.cc: interpolant equals grid value at cell centers
    spec = GridSpec(resolution=0.5, extent=32)
    g = make_grid(spec)
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.integers(-10, 10, size=(50, 3)), jnp.int32)
    vals = jnp.asarray(rng.integers(1, 32768, size=(50,)), jnp.int32)
    g = set_cells(g, cells, vals, spec)
    centers = cells.astype(jnp.float32) * spec.resolution
    interp = interpolated_probability(g, centers, spec)
    direct = lookup_probability(g, cells, spec)
    np.testing.assert_allclose(np.asarray(interp), np.asarray(direct), atol=1e-5)


def test_interpolation_monotone_between_two_cells():
    spec = GridSpec(resolution=1.0, extent=16)
    g = make_grid(spec)
    g = set_cells(
        g,
        jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32),
        jnp.asarray(
            [pv.probability_to_value(jnp.float32(0.2)), pv.probability_to_value(jnp.float32(0.8))]
        ),
        spec,
    )
    xs = jnp.linspace(0.0, 1.0, 21)
    pts = jnp.stack([xs, jnp.zeros_like(xs), jnp.zeros_like(xs)], axis=-1)
    probs = np.asarray(interpolated_probability(g, pts, spec))
    assert abs(probs[0] - 0.2) < 1e-4 and abs(probs[-1] - 0.8) < 1e-4
    assert np.all(np.diff(probs) >= -1e-6)
    # derivative vanishes at the centers (smoothstep property)
    gradf = jax.grad(lambda x: interpolated_probability(g, jnp.stack([x, jnp.float32(0.0), jnp.float32(0.0)]), spec))
    assert abs(float(gradf(jnp.float32(0.0)))) < 1e-5
    assert abs(float(gradf(jnp.float32(0.5)))) > 0.1


def test_interpolation_continuous_across_cell_boundary():
    spec = GridSpec(resolution=1.0, extent=16)
    g = make_grid(spec)
    rng = np.random.default_rng(1)
    cells = np.stack(np.meshgrid(*[np.arange(-3, 4)] * 3, indexing="ij"), -1).reshape(-1, 3)
    vals = rng.integers(1, 32768, size=(cells.shape[0],))
    g = set_cells(g, jnp.asarray(cells, jnp.int32), jnp.asarray(vals, jnp.int32), spec)
    eps = 1e-4
    for x in [0.5, 1.0, 1.5]:
        lo = float(interpolated_probability(g, jnp.asarray([x - eps, 0.2, 0.3]), spec))
        hi = float(interpolated_probability(g, jnp.asarray([x + eps, 0.2, 0.3]), spec))
        assert abs(hi - lo) < 1e-2
