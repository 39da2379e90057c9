"""Batched multi-sequence mapping and device-mesh sharding.

The reference's scale-out story is hub-and-spoke gRPC (cartographer/cloud/,
C37): robots run local SLAM and upload to a server. The TPU-native
equivalent (SURVEY.md §2.4) is single-program sharded execution:

  * *batched mapping*: N independent sequences stepped in lockstep by one
    vmapped frontend step — one compiled program, N sets of submap grids
    resident in HBM (BASELINE config #5);
  * *sharded mapping*: the batch axis laid out over a `jax.sharding.Mesh`
    ('seq' axis), so grids and per-sequence state live on their shard's chip
    and XLA keeps every step chip-local (no collectives on the frontend hot
    path; the global pose-graph solve is where cross-chip reduction happens).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dliom_tpu.common.config import TrajectoryBuilderConfig
from dliom_tpu.frontend.local_trajectory_builder import (
    FrontendState,
    ScanInput,
    make_initial_state,
    step,
)


def make_batched_state(cfg: TrajectoryBuilderConfig, batch: int) -> FrontendState:
    """N independent frontend states stacked on a leading axis."""
    one = make_initial_state(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one
    )


def batched_step(cfg: TrajectoryBuilderConfig):
    """vmapped frontend step: (state[B], scan[B]) -> (state[B], result[B])."""
    return jax.vmap(functools.partial(step, cfg=cfg))


def shard_over_mesh(tree, mesh: Mesh, axis: str = "seq"):
    """Lay a batched pytree's leading axis over a mesh axis."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def make_mesh(n_devices: Optional[int] = None, axis: str = "seq") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def sharded_step(cfg: TrajectoryBuilderConfig, mesh: Mesh, axis: str = "seq"):
    """jit of the batched step with states/scans sharded over `axis`."""
    vstep = batched_step(cfg)

    def spec_of(x):
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))

    def run(state, scan):
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(spec_of, state)
        )
        return vstep(state, scan)

    return jax.jit(run)
