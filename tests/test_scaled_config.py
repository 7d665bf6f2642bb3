"""Scaled-table configuration (BASELINE.json config 4): InstantNGP-paper-scale
tables must build, train, and stream the fused tail within the adaptive chunk
budget — on CPU with few pixels (the TPU bench covers throughput)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.config import (
    LossConfig,
    experiment_from_grid_id,
    instantngp_scaled_model,
)
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.ops.fused_hpd import _chunk_rows
from collision_handling_in_instantngp_tpu.train.loss import compute_loss


def test_scaled_preset_shapes():
    cfg = instantngp_scaled_model()
    assert cfg.hash_table_size == 2**14
    assert cfg.num_levels == 16
    statics = gngf.make_statics(cfg)
    assert statics.n_ls[0] == 16 and statics.n_ls[-1] == 512
    params = gngf.init_params(jax.random.PRNGKey(0), cfg)
    assert params["tables"].shape == (16, 2**14, 2)


def test_adaptive_chunking():
    # default T=256: full 4096-row chunks; T=2^14 x L=16: shrinks; floor 256
    assert _chunk_rows(4, 256) == 4096
    assert _chunk_rows(16, 2**14) == 256
    assert _chunk_rows(1, 64) == 4096


def test_scaled_model_forward_backward(rng):
    cfg = instantngp_scaled_model(hpd_hidden=(16, 32), mlp_hidden=(16,))
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.random((64, 2), dtype=np.float32))
    y = jnp.asarray(rng.random((64, 3), dtype=np.float32))
    lcfg = LossConfig(gamma=-2.0, epsilon=1.0, l_collisions=1e-3)

    def loss(params):
        out = gngf.forward(params, x, cfg, statics)
        aux = compute_loss(
            out.rgb, y, out.probs, jnp.zeros(16), jnp.ones(16), lcfg, 16,
            marginals=out.marginal,
        )
        return aux.total

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    g_tab = np.asarray(grads["tables"])
    assert g_tab.shape == (16, 2**14, 2)
    assert np.isfinite(g_tab).all()
    # the marginal should reach all 16 levels
    out = gngf.forward(params, x, cfg, statics)
    assert out.marginal.shape == (16, 2**14)
    np.testing.assert_allclose(
        np.asarray(out.marginal).sum(axis=1), np.ones(16), rtol=1e-4
    )


def test_scaled_vanilla_path(rng):
    cfg = instantngp_scaled_model(
        use_hash_function=True, hpd_hidden=(16,), mlp_hidden=(16,)
    )
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.random((64, 2), dtype=np.float32))
    out = gngf.forward(params, x, cfg, statics)
    idx = np.asarray(out.indices)
    assert idx.shape == (64, 16, 4)
    assert idx.min() >= 0 and idx.max() < 2**14


def test_topk_approx_recall_opt_in(rng):
    """topk_approx_recall switches the streamed tails to lax.approx_max_k
    (exact fallback on CPU) and the epoch still trains to finite loss."""
    import dataclasses

    import jax
    import numpy as np

    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id,
    )
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.train.train_step import (
        build_epoch_batches,
        make_epoch_fn,
    )

    exp = experiment_from_grid_id(4061)
    model = dataclasses.replace(
        exp.model, hash_table_size=256, hpd_hidden=(8, 16),
        topk_approx_recall=0.95, hpd_backend="unique_stream",
    )
    exp = dataclasses.replace(exp, model=model)
    statics = gngf.make_statics(model)
    p = 300
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.arange(p, dtype=np.int32)
    batches = build_epoch_batches(
        coords, targets, 1 / 3, perm, model_cfg=model, statics=statics
    )
    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(0))
    epoch = make_jitted(tx, p)
    for _ in range(2):
        state, metrics, _ = epoch(state, batches)
    assert np.isfinite(float(metrics.loss))
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()
