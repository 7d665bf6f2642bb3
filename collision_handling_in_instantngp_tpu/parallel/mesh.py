"""Device-mesh construction and sharding specs.

The reference is single-process/single-GPU (functions.py:49-52); here
parallelism is mesh-first (SURVEY.md §2.4):

  * ``data`` axis — DP over the pixel axis: minibatch rows are sharded, model
    params replicated, gradient psums inserted by GSPMD and overlapped with the
    backward by XLA's latency-hiding scheduler.
  * ``model`` axis — optional TP over the hash-table SLOT axis (T) for
    scaled-table configs (BASELINE.json config 4): each device holds T/mp rows
    of every level's table; gathers/scatter-adds become collective-assisted.

Multi-host: ``jax.distributed.initialize()`` first (see initialize_distributed)
— then `jax.devices()` spans the pod slice and the same mesh code works
unchanged, with DCN-crossing collectives handled by the compiler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (idempotent). On a single host this is a no-op."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """2-D (data, model) mesh over the given devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the pixel rows of (num_batches, B, ...) arrays over the data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard flat (P, ...) arrays over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def table_sharding(mesh: Mesh, shard_tables: bool) -> NamedSharding:
    """(L, T, F) tables: optionally shard the slot axis T over the model axis."""
    return NamedSharding(mesh, P(None, MODEL_AXIS, None) if shard_tables else P())


def shard_state_and_batches(state, batches, mesh: Mesh, shard_tables: bool = False):
    """Place a TrainState (params replicated, tables optionally slot-sharded)
    and EpochBatches (pixels data-sharded) onto the mesh."""
    rep = replicated(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    if shard_tables:
        params = dict(state.params)
        params["tables"] = jax.device_put(
            params["tables"], table_sharding(mesh, True)
        )
        state = state._replace(params=params)

    bsh = batch_sharding(mesh)
    psh = pixel_sharding(mesh)
    sharded_batches = type(batches)(
        x=jax.device_put(batches.x, bsh),
        y=jax.device_put(batches.y, bsh),
        valid=jax.device_put(batches.valid, rep),
        scatter_idx=jax.device_put(batches.scatter_idx, psh),
        gather_idx=jax.device_put(batches.gather_idx, psh),
        og_image=jax.device_put(batches.og_image, psh),
        dedup_ids=(
            None if batches.dedup_ids is None
            else jax.device_put(batches.dedup_ids, bsh)
        ),
        dedup_counts=(
            None if batches.dedup_counts is None
            else jax.device_put(batches.dedup_counts, rep)
        ),
        # compaction fields: active is U_c-indexed (replicated, like counts);
        # base is per-pixel-row (data-sharded like the batch rows)
        dedup_active=(
            None if batches.dedup_active is None
            else jax.device_put(batches.dedup_active, rep)
        ),
        dedup_base=(
            None if batches.dedup_base is None
            else jax.device_put(batches.dedup_base, bsh)
        ),
        # cell tables are U_c/cell-indexed (replicated); pixel_cell is
        # per-pixel-row (data-sharded)
        dedup_cell_corners=(
            None if batches.dedup_cell_corners is None
            else tuple(
                jax.device_put(c, rep) for c in batches.dedup_cell_corners
            )
        ),
        dedup_pixel_cell=(
            None if batches.dedup_pixel_cell is None
            else jax.device_put(batches.dedup_pixel_cell, bsh)
        ),
    )
    return state, sharded_batches
