"""Pallas fused-HPD-tail kernel vs the streaming-jax oracle, under the Pallas
interpreter (CPU). The real-TPU execution of the same kernel is exercised by
bench.py / training runs."""

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.fused_hpd import hpd_tail

L, N, H, T, K = 2, 1100, 128, 256, 4  # N not a multiple of the 512-row block


def _setup(rng):
    h = jnp.asarray(rng.standard_normal((L, N, H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((H, T)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(T).astype(np.float32) * 0.1)
    return h, w, b


def test_pallas_forward_matches_jax(rng):
    h, w, b = _setup(rng)
    marg_j, vals_j, idx_j = hpd_tail(h, w, b, K, "highest", "jax")
    marg_p, vals_p, idx_p = hpd_tail(h, w, b, K, "highest", "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(marg_p), np.asarray(marg_j), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_j), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))


def test_pallas_vjp_matches_jax(rng):
    h, w, b = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((L, N, K)).astype(np.float32))

    def scalar(backend):
        def f(h, w, b):
            marg, vals, _ = hpd_tail(h, w, b, K, "highest", backend)
            return jnp.sum(marg * gm) + jnp.sum(vals * gv)
        return f

    g_j = jax.grad(scalar("jax"), argnums=(0, 1, 2))(h, w, b)
    g_p = jax.grad(scalar("pallas_interpret"), argnums=(0, 1, 2))(h, w, b)
    for a, b_, name in zip(g_p, g_j, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, err_msg=name
        )


def test_pallas_k1(rng):
    """K=1 edge (grid axis topk_k includes 1)."""
    h, w, b = _setup(rng)
    marg_j, vals_j, idx_j = hpd_tail(h, w, b, 1, "highest", "jax")
    marg_p, vals_p, idx_p = hpd_tail(h, w, b, 1, "highest", "pallas_interpret")
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_j), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
