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
from dliom_tpu.common.platform import force_platform, mesh_platform
from dliom_tpu.frontend.lio import LioState, lio_step, make_lio_state
from dliom_tpu.frontend.local_trajectory_builder import (
    FrontendState,
    make_initial_state,
    step,
)
from dliom_tpu.imu import preintegration as pre
from dliom_tpu.mapping.brick_grid import BrickBank
from dliom_tpu.mapping.grid import GRID_DTYPE
from dliom_tpu.ops.pallas_apply import dense_bank_size
from dliom_tpu.mapping.submap import (
    InsertionBatch,
    brick_spec,
    brick_spec_low,
    grid_specs,
    write_insertion_batch,
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


# ---------------------------------------------------------------------------
# Full-LIO batching with SHARED flat grid banks.
#
# Plain vmap over lio_step is correct but slow: grid banks become (B, ·)
# operands, and TPU scatters on >1-D operands (and reshapes of them — TPU
# layouts are tiled, so (B, C) -> (B*C,) is a real relayout copy) leave the
# in-place fast path. Instead the banks live FLAT with 2B slots shared by all
# lanes (vmap in_axes=None); each lane reads with its `lane` offset, and grid
# WRITES (insertion + spawn clears) run outside the vmapped region as single
# flat kernels over all lanes' records.
# ---------------------------------------------------------------------------


def make_batched_lio_state(cfg: TrajectoryBuilderConfig, batch: int) -> LioState:
    """B lio states with shared flat banks (2B slots) + per-lane indices."""
    one = make_lio_state(
        cfg, pre.NavState.identity(), jnp.zeros(3), jnp.zeros(3)
    )
    hi, lo = grid_specs(cfg.submaps)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one
    )
    sm = state.frontend.submaps
    if cfg.submaps.use_brick_grid:
        bspec = brick_spec(cfg.submaps)
        brick = BrickBank(
            directory=jnp.full(2 * batch * bspec.num_dir_groups, -1, jnp.int32),
            pool=jnp.zeros(2 * batch * bspec.num_pool_cells, GRID_DTYPE),
            counts=jnp.zeros(2 * batch, jnp.int32),
            group_of_slot=jnp.zeros(2 * batch * bspec.num_pool_groups, jnp.int32),
            dropped=jnp.zeros(batch, jnp.int32),
            epochs=jnp.zeros(2 * batch, jnp.int32),
        )
        high_values = jnp.zeros(0, GRID_DTYPE)
    else:
        brick = None
        high_values = jnp.zeros(
            dense_bank_size(hi.num_cells, 2 * batch, hi.apply_groups),
            GRID_DTYPE,
        )
    if cfg.submaps.use_brick_grid_low:
        lbspec = brick_spec_low(cfg.submaps)
        low_brick = BrickBank(
            directory=jnp.full(2 * batch * lbspec.num_dir_groups, -1, jnp.int32),
            pool=jnp.zeros(2 * batch * lbspec.num_pool_cells, GRID_DTYPE),
            counts=jnp.zeros(2 * batch, jnp.int32),
            group_of_slot=jnp.zeros(2 * batch * lbspec.num_pool_groups, jnp.int32),
            dropped=jnp.zeros(batch, jnp.int32),
            epochs=jnp.zeros(2 * batch, jnp.int32),
        )
        low_values = jnp.zeros(0, GRID_DTYPE)
    else:
        low_brick = None
        low_values = jnp.zeros(
            dense_bank_size(lo.num_cells, 2 * batch, lo.apply_groups),
            GRID_DTYPE,
        )
    sm = sm._replace(
        high_values=high_values,
        high_brick=brick,
        low_values=low_values,
        low_brick=low_brick,
        # bank-level counter; aggregated in lane 0 (mesh-shardable shape,
        # same convention as BrickBank.dropped)
        lane=jnp.arange(batch, dtype=jnp.int32),
        dense_dropped=jnp.zeros(batch, jnp.int32),
    )
    return state._replace(frontend=state.frontend._replace(submaps=sm))


def _bank_axes(cfg: TrajectoryBuilderConfig, state: LioState):
    """vmap in/out axes pytree: lane-mapped (0) everywhere except the shared
    grid banks (None)."""
    axes = jax.tree.map(lambda _: 0, state)
    sm_axes = axes.frontend.submaps
    sm_axes = sm_axes._replace(
        high_values=None,
        low_values=None,
        dense_dropped=None,
        high_brick=(
            None
            if sm_axes.high_brick is None
            else jax.tree.map(lambda _: None, sm_axes.high_brick)
        ),
        low_brick=(
            None
            if sm_axes.low_brick is None
            else jax.tree.map(lambda _: None, sm_axes.low_brick)
        ),
    )
    return axes._replace(
        frontend=axes.frontend._replace(submaps=sm_axes)
    )


def clear_spawned_slots(cfg: TrajectoryBuilderConfig, state: LioState) -> LioState:
    """Apply pending spawn bank clears for every lane with flat 1-D writes
    (lax.cond + dynamic_update_slice per lane — the operand stays 1-D, so
    donation keeps the clears in place)."""
    sm = state.frontend.submaps
    batch = sm.lane.shape[0]
    hi, lo = grid_specs(cfg.submaps)
    bspec = brick_spec(cfg.submaps) if cfg.submaps.use_brick_grid else None
    high, low, brick = sm.high_values, sm.low_values, sm.high_brick
    lbrick = sm.low_brick
    for b in range(batch):
        spawn = sm.pending_spawn[b]
        new_slot = 2 * b + sm.num_created[b] % 2

        def clear_bank(vals, cells, slot=new_slot, dtype=None, fill=0):
            return jax.lax.dynamic_update_slice(
                vals, jnp.full(cells, fill, vals.dtype), (slot * cells,)
            )

        if cfg.submaps.use_brick_grid:
            if bspec.apply_groups > 0:
                # Grouped config: the insert kernel zero-fills re-allocated
                # groups (`fresh`), so only the directory entries need
                # clearing (see mapping/brick_grid.py reset_slot).
                from dliom_tpu.mapping.brick_grid import reset_slot

                brick = reset_slot(brick, bspec, new_slot, spawn)
            else:
                brick = jax.lax.cond(
                    spawn,
                    lambda br, s=new_slot: BrickBank(
                        directory=jax.lax.dynamic_update_slice(
                            br.directory,
                            jnp.full(bspec.num_dir_groups, -1, jnp.int32),
                            (s * bspec.num_dir_groups,),
                        ),
                        pool=jax.lax.dynamic_update_slice(
                            br.pool,
                            jnp.zeros(bspec.num_pool_cells, GRID_DTYPE),
                            (s * bspec.num_pool_cells,),
                        ),
                        counts=br.counts.at[s].set(0),
                        group_of_slot=br.group_of_slot,
                        dropped=br.dropped,
                        epochs=br.epochs,
                    ),
                    lambda br: br,
                    brick,
                )
        else:
            high = jax.lax.cond(
                spawn,
                lambda v, s=new_slot: clear_bank(v, hi.num_cells, s),
                lambda v: v,
                high,
            )
        if cfg.submaps.use_brick_grid_low:
            from dliom_tpu.mapping.brick_grid import reset_slot

            lbspec = brick_spec_low(cfg.submaps)
            if lbspec.apply_groups > 0:
                lbrick = reset_slot(lbrick, lbspec, new_slot, spawn)
            else:
                lbrick = jax.lax.cond(
                    spawn,
                    lambda br, s=new_slot: BrickBank(
                        directory=jax.lax.dynamic_update_slice(
                            br.directory,
                            jnp.full(lbspec.num_dir_groups, -1, jnp.int32),
                            (s * lbspec.num_dir_groups,),
                        ),
                        pool=jax.lax.dynamic_update_slice(
                            br.pool,
                            jnp.zeros(lbspec.num_pool_cells, GRID_DTYPE),
                            (s * lbspec.num_pool_cells,),
                        ),
                        counts=br.counts.at[s].set(0),
                        group_of_slot=br.group_of_slot,
                        dropped=br.dropped,
                        epochs=br.epochs,
                    ),
                    lambda br: br,
                    lbrick,
                )
        else:
            low = jax.lax.cond(
                spawn,
                lambda v, s=new_slot: clear_bank(v, lo.num_cells, s),
                lambda v: v,
                low,
            )
    sm = sm._replace(
        high_values=high, low_values=low, high_brick=brick, low_brick=lbrick
    )
    return state._replace(frontend=state.frontend._replace(submaps=sm))


def batched_lio_body(cfg: TrajectoryBuilderConfig, batch: int):
    """The (un-jitted) multi-sequence LIO step body: (state[B], scans[B]) ->
    (state[B], results[B]) with all B sequences' grid traffic in single
    flat kernels. Shared by the per-step entry, the chunked entry, and the
    shard_map local step."""

    def run(state: LioState, scans):
        # 1. spawn clears from the previous step's pending flags (flat)
        state = clear_spawned_slots(cfg, state)
        # 2. vmapped compute; banks shared, writes deferred
        axes = _bank_axes(cfg, state)
        new_state, results = jax.vmap(
            functools.partial(lio_step, cfg=cfg, defer_grid_writes=True),
            in_axes=(axes, 0),
            out_axes=(axes, 0),
        )(state, scans)
        # 3. one flat insert over all lanes' records (2B slots)
        ib = results.scan.insertion_batch
        flat = InsertionBatch(
            origins=ib.origins.reshape(2 * batch, 3),
            points=ib.points.reshape(2 * batch, *ib.points.shape[2:]),
            masks=ib.masks.reshape(2 * batch, -1),
            hi_masks=ib.hi_masks.reshape(2 * batch, -1),
        )
        sm = new_state.frontend.submaps
        sm = sm._replace(
            **write_insertion_batch(
                sm.high_values, sm.low_values, sm.high_brick, flat,
                cfg.submaps, low_brick=sm.low_brick,
                dense_dropped=sm.dense_dropped,
            )
        )
        new_state = new_state._replace(
            frontend=new_state.frontend._replace(submaps=sm)
        )
        return new_state, results

    return run


def make_batched_lio_step(cfg: TrajectoryBuilderConfig, batch: int):
    """Compiled multi-sequence LIO step. Donate the state for in-place bank
    updates."""
    return jax.jit(batched_lio_body(cfg, batch), donate_argnums=0)


def make_batched_lio_chunk(cfg: TrajectoryBuilderConfig, batch: int, chunk: int):
    """Chunked multi-sequence step: lax.scan over `chunk` stacked scan
    batches per dispatch (scans leaves carry a leading (chunk, B, ...)
    axis) — amortizes per-dispatch host overhead like make_jit_lio_chunk
    does for the single-sequence bench."""
    body = batched_lio_body(cfg, batch)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state, scans):
        return jax.lax.scan(body, state, scans)

    return run


def make_sharded_lio_state(
    cfg: TrajectoryBuilderConfig, batch: int, mesh: Mesh, axis: str = "seq"
) -> LioState:
    """Batched LIO state laid out lane-major over the mesh: each device owns
    `batch/D` sequences WITH their flat grid banks (every leaf's leading/flat
    axis is lane-major, so first-axis sharding keeps all of a sequence's
    state chip-local — the frontend hot path needs no collectives)."""
    n_dev = mesh.devices.size
    assert batch % n_dev == 0, (batch, n_dev)
    local = batch // n_dev
    state = make_batched_lio_state(cfg, batch)
    # lanes restart from 0 on each shard (banks are shard-local)
    sm = state.frontend.submaps._replace(
        lane=jnp.tile(jnp.arange(local, dtype=jnp.int32), n_dev)
    )
    state = state._replace(frontend=state.frontend._replace(submaps=sm))
    return shard_over_mesh(state, mesh, axis)


def sharded_lio_step(
    cfg: TrajectoryBuilderConfig, batch: int, mesh: Mesh, axis: str = "seq"
):
    """shard_map of the flat-bank batched LIO step: D devices each run
    batch/D sequences independently (ICI-free hot loop)."""
    from jax import shard_map

    n_dev = mesh.devices.size
    local = batch // n_dev

    platform = mesh_platform(mesh)

    _body = batched_lio_body(cfg, local)

    def local_step(state, scans):
        # the shared batched body at the per-shard batch size; kernel
        # dispatch pinned to the mesh's platform at trace time
        with force_platform(platform):
            return _body(state, scans)

    spec = P(axis)
    # check_vma off: lax.scan carries inside the step mix replicated
    # constants (e.g. identity quaternions) with shard-varying data, which
    # the VMA checker rejects even though every output is shard-local.
    try:
        smapped = shard_map(
            local_step, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_vma=False,
        )
    except TypeError:  # older JAX spelling
        smapped = shard_map(
            local_step, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_rep=False,
        )
    return jax.jit(smapped, donate_argnums=0)


def shard_over_mesh(tree, mesh: Mesh, axis: str = "seq"):
    """Lay a batched pytree's leading axis over a mesh axis."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "seq",
    platform: Optional[str] = None,
) -> Mesh:
    """Mesh over the first `n_devices` devices of `platform` (default: the
    process default backend). Pass platform='cpu' to build a virtual host
    mesh without ever initializing a TPU backend."""
    avail = jax.devices(platform) if platform else jax.devices()
    devices = avail[: n_devices or len(avail)]
    if n_devices and len(devices) < n_devices:
        raise RuntimeError(
            f"requested {n_devices} {platform or 'default'} devices, have "
            f"{len(avail)} (set --xla_force_host_platform_device_count "
            "before the backend initializes for virtual CPU meshes)"
        )
    return Mesh(devices, (axis,))


def sharded_step(cfg: TrajectoryBuilderConfig, mesh: Mesh, axis: str = "seq"):
    """jit of the batched step with states/scans sharded over `axis`."""
    vstep = batched_step(cfg)
    platform = mesh_platform(mesh)

    def spec_of(x):
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))

    def run(state, scan):
        with force_platform(platform):
            state = jax.lax.with_sharding_constraint(
                state, jax.tree.map(spec_of, state)
            )
            return vstep(state, scan)

    return jax.jit(run)
