"""Fused HPD tail (ops/fused_hpd.py) vs the dense oracle: forward values and
the full VJP (dh, dW, db and downstream model grads) must match exactly —
the fusion is a memory-layout optimization, not a numerics change."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.config import LossConfig, ModelConfig
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.ops.fused_hpd import (
    hpd_tail,
    hpd_tail_dense_reference,
)
from collision_handling_in_instantngp_tpu.train.loss import compute_loss

L, N, H, T, K = 3, 1000, 16, 32, 4  # N deliberately not a chunk multiple


def _setup(rng):
    h = jnp.asarray(rng.standard_normal((L, N, H)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((H, T)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal(T).astype(np.float32) * 0.1)
    return h, w, b


def test_forward_matches_dense(rng):
    h, w, b = _setup(rng)
    marg, vals, idx = hpd_tail(h, w, b, K, "highest")
    marg_d, vals_d, idx_d = hpd_tail_dense_reference(h, w, b, K)
    np.testing.assert_allclose(np.asarray(marg), np.asarray(marg_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_d), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_d))


def test_vjp_matches_dense_autodiff(rng):
    """Gradient through marginal AND top-k values simultaneously (the real
    training composition: JS/KL loss on the marginal + blend softmax on the
    top-k values + straight-through scatter)."""
    h, w, b = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((L, N, K)).astype(np.float32))

    def fused_scalar(h, w, b):
        marg, vals, _ = hpd_tail(h, w, b, K, "highest")
        return jnp.sum(marg * gm) + jnp.sum(vals * gv)

    def dense_scalar(h, w, b):
        logits = jnp.matmul(h, w, precision="highest") + b
        p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
        marg = jnp.mean(p, axis=1)
        # dense straight-through: topk then treat values as gathered slots
        _, idx = jax.lax.top_k(p, K)
        vals = jnp.take_along_axis(p, idx, axis=-1)
        return jnp.sum(marg * gm) + jnp.sum(vals * gv)

    g_fused = jax.grad(fused_scalar, argnums=(0, 1, 2))(h, w, b)
    g_dense = jax.grad(dense_scalar, argnums=(0, 1, 2))(h, w, b)
    for gf, gd, name in zip(g_fused, g_dense, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gd), atol=2e-5, err_msg=name
        )


def test_full_model_fused_vs_dense(rng):
    """Whole-model loss and parameter gradients: fused_hpd=True vs False."""
    base = ModelConfig(
        hash_table_size=64, mlp_hidden=(16,), hpd_hidden=(8, 16), topk_k=4,
        fused_hpd=False,
    )
    fused_cfg = dataclasses.replace(base, fused_hpd=True)
    statics = gngf.make_statics(base)
    params = gngf.init_params(jax.random.PRNGKey(3), base)
    lcfg = LossConfig(gamma=-2.0, epsilon=1.0)

    x = jnp.asarray(rng.random((200, 2), dtype=np.float32))
    y = jnp.asarray(rng.random((200, 3), dtype=np.float32))
    pc = jnp.zeros(4)
    pm = jnp.ones(4)

    def make_loss(cfg):
        def f(params):
            out = gngf.forward(params, x, cfg, statics)
            aux = compute_loss(
                out.rgb, y, out.probs, pc, pm, lcfg, 4, marginals=out.marginal
            )
            return aux.total
        return f

    l_dense, g_dense = jax.value_and_grad(make_loss(base))(params)
    l_fused, g_fused = jax.value_and_grad(make_loss(fused_cfg))(params)

    np.testing.assert_allclose(float(l_fused), float(l_dense), rtol=1e-6)
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b_ in zip(flat_f, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-6)


def test_full_model_fused_keep_topk_only(rng):
    """keep_topk_only: loss marginalizes the top-k values; fused and dense
    paths must still agree."""
    base = ModelConfig(
        hash_table_size=64, mlp_hidden=(16,), hpd_hidden=(8, 16), topk_k=4,
        keep_topk_only=True, fused_hpd=False,
    )
    fused_cfg = dataclasses.replace(base, fused_hpd=True)
    statics = gngf.make_statics(base)
    params = gngf.init_params(jax.random.PRNGKey(3), base)
    lcfg = LossConfig(gamma=-2.0, epsilon=1.0)
    x = jnp.asarray(rng.random((100, 2), dtype=np.float32))
    y = jnp.asarray(rng.random((100, 3), dtype=np.float32))

    def make_loss(cfg):
        def f(params):
            out = gngf.forward(params, x, cfg, statics)
            aux = compute_loss(
                out.rgb, y, out.probs, jnp.zeros(4), jnp.ones(4), lcfg, 4,
                marginals=out.marginal,
            )
            return aux.total
        return f

    l_dense, g_dense = jax.value_and_grad(make_loss(base))(params)
    l_fused, g_fused = jax.value_and_grad(make_loss(fused_cfg))(params)
    np.testing.assert_allclose(float(l_fused), float(l_dense), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_dense)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-6)
