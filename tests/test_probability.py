"""Tests mirroring cartographer/mapping/probability_values_test.cc, plus an
exact cross-check of the closed-form maps against the reference's table
construction recomputed in numpy."""

import jax.numpy as jnp
import numpy as np

from dliom_tpu.mapping import probability as pv


def _reference_table_value_to_probability():
    # Recompute the reference's kValueToProbability semantics
    # (probability_values.cc:26-56) in float32 numpy.
    scale = (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY) / 32766.0
    values = np.arange(32768, dtype=np.float64)
    probs = values * scale + (pv.MIN_PROBABILITY - scale)
    probs[0] = pv.MIN_PROBABILITY
    return probs.astype(np.float32)


def _reference_probability_to_value(p):
    # BoundedFloatToValue (probability_values.h:32-44): lround + 1
    clamped = np.clip(p, pv.MIN_PROBABILITY, pv.MAX_PROBABILITY)
    return (
        np.round(
            (clamped - pv.MIN_PROBABILITY)
            * (32766.0 / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY))
        ).astype(np.int64)
        + 1
    )


def test_value_to_probability_matches_reference_table():
    table = _reference_table_value_to_probability()
    ours = np.asarray(pv.value_to_probability(jnp.arange(32768)))
    np.testing.assert_allclose(ours, table, atol=2e-6)


def test_probability_value_roundtrip():
    values = jnp.arange(1, 32768)
    probs = pv.value_to_probability(values)
    back = pv.probability_to_value(probs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(values))


def test_probability_to_value_matches_reference_rounding():
    p = np.linspace(0.0, 1.0, 10007, dtype=np.float64)
    ref = _reference_probability_to_value(p)
    ours = np.asarray(pv.probability_to_value(jnp.asarray(p, jnp.float32)))
    # float32 quantization may shift boundary cases by at most 1 value step
    assert np.max(np.abs(ours - ref)) <= 1
    assert np.mean(ours != ref) < 1e-3


def test_odds_helpers():
    np.testing.assert_allclose(float(pv.odds(jnp.float32(0.5))), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        float(pv.probability_from_odds(jnp.float32(1.0))), 0.5, atol=1e-6
    )


def test_apply_odds_hit_then_decay():
    # Unknown cell hit with p=0.55 becomes exactly value(0.55)
    hit_odds = float(pv.odds(jnp.float32(0.55)))
    v0 = pv.apply_odds(jnp.asarray(0), hit_odds)
    assert int(v0) == int(pv.probability_to_value(jnp.float32(0.55)))
    # Repeated hits increase probability monotonically toward the max
    v = jnp.asarray(0)
    prev_p = 0.0
    for _ in range(50):
        v = pv.apply_odds(v, hit_odds)
        p = float(pv.value_to_probability(v))
        assert p >= prev_p - 1e-6
        prev_p = p
    assert prev_p > 0.85
    # Misses pull it back down
    miss_odds = float(pv.odds(jnp.float32(0.49)))
    for _ in range(200):
        v = pv.apply_odds(v, miss_odds)
    assert float(pv.value_to_probability(v)) < 0.2


def test_update_table_matches_reference_construction():
    # Reference ComputeLookupTableToApplyOdds semantics (minus the marker bit)
    for prob in (0.55, 0.49):
        o = prob / (1 - prob)
        table = np.asarray(pv.compute_update_table(o))
        # entry 0: value of ProbabilityFromOdds(odds)
        assert table[0] == int(pv.probability_to_value(jnp.float32(prob)))
        # spot-check entries against direct float64 computation
        vals = np.array([1, 5, 1000, 16384, 32767])
        ref_p = _reference_table_value_to_probability()[vals].astype(np.float64)
        new_p = np.clip(
            (o * (ref_p / (1 - ref_p))) / (1 + o * (ref_p / (1 - ref_p))),
            pv.MIN_PROBABILITY,
            pv.MAX_PROBABILITY,
        )
        ref_new = _reference_probability_to_value(new_p)
        assert np.max(np.abs(table[vals] - ref_new)) <= 1


def test_config_strict_keys():
    from dliom_tpu.common.config import load_config

    cfg = load_config("viral")
    assert cfg.trajectory_builder.submaps.high_resolution == 0.1
    assert cfg.pose_graph.optimize_every_n_nodes == 100
    try:
        cfg.override({"trajectory_builder": {"nonexistent_key": 1}})
    except KeyError as e:
        assert "nonexistent_key" in str(e)
    else:
        raise AssertionError("expected KeyError for unknown config key")
