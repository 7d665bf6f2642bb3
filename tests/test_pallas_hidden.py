"""Fused hidden-stack kernel (ops/pallas/hidden.py) vs the jax ReLU MLP —
forward values and weight/bias VJPs, interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.pallas import hidden as ph

U, D = 1500, 2  # U not a block multiple; D below the pad-to-8
WIDTHS = (32, 64, 128)


def _setup(rng):
    x = jnp.asarray(
        rng.integers(0, 512, size=(U, D)).astype(np.float32)
    )
    layers = []
    d = D
    for w_ in WIDTHS:
        layers.append(
            (
                jnp.asarray(rng.standard_normal((d, w_)).astype(np.float32) * 0.3),
                jnp.asarray(rng.standard_normal((w_,)).astype(np.float32) * 0.1),
            )
        )
        d = w_
    return x, tuple(layers)


def _jax_stack(x, layers):
    h = x
    for w_, b_ in layers:
        h = jax.nn.relu(jnp.matmul(h, w_, precision="highest") + b_)
    return h


def test_supports_gate():
    assert ph.supports((2, 32, 64, 128))
    assert not ph.supports((2, 33, 64, 128))   # non-multiple-of-8 width
    assert not ph.supports((2, 1024, 64))      # too wide


def test_forward_matches_jax(rng):
    x, layers = _setup(rng)
    h_p = ph.hidden_stack_pallas(x, layers, "highest", True)
    h_j = _jax_stack(x, layers)
    # activations reach O(500); fp32 dot summation-order differences of
    # ~1e-4 absolute become large RELATIVE errors on post-ReLU values near
    # the threshold — bound the absolute error at the activation scale
    np.testing.assert_allclose(
        np.asarray(h_p), np.asarray(h_j), rtol=1e-5, atol=2e-3
    )


def test_vjp_matches_jax(rng):
    x, layers = _setup(rng)
    g = jnp.asarray(rng.standard_normal((U, WIDTHS[-1])).astype(np.float32))

    def loss_p(layers):
        return jnp.sum(ph.hidden_stack_pallas(x, layers, "highest", True) * g)

    def loss_j(layers):
        return jnp.sum(_jax_stack(x, layers) * g)

    g_p = jax.grad(loss_p)(layers)
    g_j = jax.grad(loss_j)(layers)
    for i, ((dw_p, db_p), (dw_j, db_j)) in enumerate(zip(g_p, g_j)):
        np.testing.assert_allclose(
            np.asarray(dw_p), np.asarray(dw_j), rtol=1e-4, atol=1e-2,
            err_msg=f"dW layer {i}",
        )
        np.testing.assert_allclose(
            np.asarray(db_p), np.asarray(db_j), rtol=1e-4, atol=1e-2,
            err_msg=f"db layer {i}",
        )


def test_high_precision_close(rng):
    x, layers = _setup(rng)
    h_hi = ph.hidden_stack_pallas(x, layers, "highest", True)
    h_h = ph.hidden_stack_pallas(x, layers, "high", True)
    np.testing.assert_allclose(
        np.asarray(h_h), np.asarray(h_hi), rtol=2e-3, atol=2e-2
    )
