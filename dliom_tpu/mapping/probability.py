"""Occupancy probability <-> integer cell value mapping and odds updates.

TPU-native counterpart of the reference's
`cartographer/mapping/probability_values.{h,cc}`: cell values are integers in
[0, 32767] where 0 is *unknown* and [1, 32767] maps linearly onto
probabilities [0.1, 0.9]. Updates multiply the cell's odds by a fixed
hit/miss odds.

Where the reference precomputes 32768-entry lookup tables and walks them one
cell at a time, here the value<->probability maps are closed-form vectorized
expressions (bit-exact with the tables, see tests) evaluated on whole point
batches; the per-insert "update each cell at most once" marker bit
(kUpdateMarker) is replaced by an explicit sort-based dedup pass in
`dliom_tpu.ops.grid_update`.

Cell storage dtype is int32 on device (uint16 in the reference; int32 gathers
and scatters are the natively supported path on TPU, and grid memory is not
the bottleneck at submap extents).
"""

from __future__ import annotations

import jax.numpy as jnp

MIN_PROBABILITY = 0.1
MAX_PROBABILITY = 1.0 - MIN_PROBABILITY
UNKNOWN_VALUE = 0
MAX_VALUE = 32767
# Scale of the linear value<->probability map (reference
# probability_values.cc:34 SlowValueToBoundedFloat).
_SCALE = (MAX_PROBABILITY - MIN_PROBABILITY) / 32766.0


def odds(probability: jnp.ndarray) -> jnp.ndarray:
    return probability / (1.0 - probability)


def probability_from_odds(o: jnp.ndarray) -> jnp.ndarray:
    return o / (o + 1.0)


def clamp_probability(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(p, MIN_PROBABILITY, MAX_PROBABILITY)


def probability_to_value(p: jnp.ndarray) -> jnp.ndarray:
    """Probability in [0.1, 0.9] -> integer value in [1, 32767].

    Matches the reference's BoundedFloatToValue (round-half-away handled via
    round-to-nearest-even on exact .5 is avoided by the offset arithmetic; the
    reference uses lround which rounds half away from zero — values land on
    exact integers only at the bounds, so the schemes agree; verified in
    tests against the exact table).
    """
    p = clamp_probability(jnp.asarray(p, jnp.float32))
    v = jnp.floor((p - MIN_PROBABILITY) * (32766.0 / (MAX_PROBABILITY - MIN_PROBABILITY)) + 0.5)
    return (v + 1.0).astype(jnp.int32)


def value_to_probability(value: jnp.ndarray) -> jnp.ndarray:
    """Integer value in [0, 32767] -> probability; 0 (unknown) -> 0.1.

    Linear closed form of the reference's kValueToProbability table.
    """
    value = jnp.asarray(value)
    p = value.astype(jnp.float32) * _SCALE + (MIN_PROBABILITY - _SCALE)
    return jnp.where(value == UNKNOWN_VALUE, MIN_PROBABILITY, p)


def apply_odds(value: jnp.ndarray, update_odds: float) -> jnp.ndarray:
    """One odds-multiplication update of cell value(s).

    Equivalent to indexing the reference's ComputeLookupTableToApplyOdds
    table (probability_values.cc:74-84) without the update-marker offset:
    unknown cells take the probability of the raw odds; known cells multiply
    their odds.
    """
    known_p = probability_from_odds(update_odds * odds(value_to_probability(value)))
    unknown_p = probability_from_odds(jnp.asarray(update_odds, jnp.float32))
    new_p = jnp.where(value == UNKNOWN_VALUE, unknown_p, known_p)
    return probability_to_value(clamp_probability(new_p))


def compute_update_table(update_odds: float) -> jnp.ndarray:
    """Full 32768-entry update table (value -> new value), for cross-checking
    against the reference semantics and for table-gather update kernels."""
    values = jnp.arange(32768, dtype=jnp.int32)
    return apply_odds(values, update_odds)
