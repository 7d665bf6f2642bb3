"""Mesh-parallel training step.

The epoch function from train/train_step.py is already pure; running it
data-parallel is a matter of input placement: batch pixel rows sharded over the
``data`` mesh axis, params replicated (tables optionally slot-sharded over
``model``), outputs replicated. GSPMD then partitions the forward/backward and
inserts the gradient psums — scheduled by XLA to overlap with the backward.

This module packages that recipe plus a helper that verifies DP-invariance
(same loss as single-device execution) used by the tests.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from ..config import ExperimentConfig
from ..models import gngf
from ..train.train_step import EpochBatches, TrainState, make_epoch_fn
from .mesh import make_mesh, shard_state_and_batches


def make_parallel_epoch(
    exp: ExperimentConfig,
    statics: gngf.GNGFStatics,
    num_pixels: int,
    mesh: Optional[Mesh] = None,
    shard_tables: bool = False,
    freeze_hpd: bool = False,
):
    """Returns (state, epoch_fn, place) where place(state, batches) shards
    inputs onto the mesh and epoch_fn is the jitted epoch (same callable shape
    as the single-device one — GSPMD handles partitioning from input
    shardings)."""
    mesh = mesh if mesh is not None else make_mesh()
    init_state, make_jitted = make_epoch_fn(exp, statics, freeze_hpd=freeze_hpd)

    def init(key):
        state, tx = init_state(key)
        epoch_fn = make_jitted(tx, num_pixels)
        return state, epoch_fn

    def place(state: TrainState, batches: EpochBatches):
        return shard_state_and_batches(state, batches, mesh, shard_tables)

    return init, place, mesh
