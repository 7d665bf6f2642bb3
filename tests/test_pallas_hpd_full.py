"""Fully-fused HPD kernel (ops/pallas/hpd_full.py) vs the unfused composition
(hidden stack + streaming tail) under the Pallas interpreter."""

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.fused_hpd import hpd_tail
from collision_handling_in_instantngp_tpu.ops.pallas.hpd_full import hpd_full

L, N, D, T, K = 2, 700, 2, 128, 4
WIDTHS = (D, 8, 16, T)


def _setup(rng):
    verts = jnp.asarray(rng.integers(0, 33, size=(L, N, D)).astype(np.float32))
    layers = []
    key_scale = [0.5, 0.3, 0.2]
    for i in range(len(WIDTHS) - 1):
        w = rng.standard_normal((WIDTHS[i], WIDTHS[i + 1])).astype(np.float32)
        b = rng.standard_normal(WIDTHS[i + 1]).astype(np.float32) * 0.1
        layers.append((jnp.asarray(w * key_scale[i]), jnp.asarray(b)))
    return verts, tuple(layers)


def _oracle(verts, layers, k):
    h = verts
    for w, b in layers[:-1]:
        h = jax.nn.relu(jnp.matmul(h, w, precision="highest") + b)
    return hpd_tail(h, layers[-1][0], layers[-1][1], k, "highest", "jax")


def test_full_forward_matches_oracle(rng):
    verts, layers = _setup(rng)
    marg_f, vals_f, idx_f = hpd_full(verts, layers, K, True)
    marg_o, vals_o, idx_o = _oracle(verts, layers, K)
    np.testing.assert_allclose(np.asarray(marg_f), np.asarray(marg_o), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vals_f), np.asarray(vals_o), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_o))


def test_full_vjp_matches_oracle(rng):
    verts, layers = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((L, N, K)).astype(np.float32))

    def fused_scalar(layers):
        marg, vals, _ = hpd_full(verts, layers, K, True)
        return jnp.sum(marg * gm) + jnp.sum(vals * gv)

    def oracle_scalar(layers):
        marg, vals, _ = _oracle(verts, layers, K)
        return jnp.sum(marg * gm) + jnp.sum(vals * gv)

    g_f = jax.grad(fused_scalar)(layers)
    g_o = jax.grad(oracle_scalar)(layers)
    for i, ((dwf, dbf), (dwo, dbo)) in enumerate(zip(g_f, g_o)):
        np.testing.assert_allclose(
            np.asarray(dwf), np.asarray(dwo), atol=5e-5, err_msg=f"dW{i}"
        )
        np.testing.assert_allclose(
            np.asarray(dbf), np.asarray(dbo), atol=5e-5, err_msg=f"db{i}"
        )
