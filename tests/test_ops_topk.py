"""Tests for the straight-through differentiable top-k (reference
models.py:5-42), including VJP parity with torch's autograd semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.topk import (
    differentiable_topk,
    differentiable_topk_noop_grad,
)


def test_forward_matches_lax_topk(rng):
    x = jnp.asarray(rng.random((5, 3, 16), dtype=np.float32))
    v, i = differentiable_topk(x, 4, 16)
    v2, i2 = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    # values sorted descending
    assert np.all(np.diff(np.asarray(v), axis=-1) <= 0)


def test_straight_through_vjp_scatter(rng):
    """Backward must scatter grad_values into a dense zeros tensor at the
    selected indices (reference models.py:27-35)."""
    x = jnp.asarray(rng.random((3, 8), dtype=np.float32))

    def f(x):
        v, _ = differentiable_topk(x, 2, 8)
        return jnp.sum(v * jnp.array([1.0, 10.0]))

    g = np.asarray(jax.grad(f)(x))
    _, idx = jax.lax.top_k(x, 2)
    idx = np.asarray(idx)
    expected = np.zeros((3, 8), np.float32)
    for r in range(3):
        expected[r, idx[r, 0]] = 1.0
        expected[r, idx[r, 1]] = 10.0
    np.testing.assert_array_equal(g, expected)


def test_vjp_matches_torch_autograd(rng):
    """Parity with the exact torch.autograd.Function the reference defines."""
    torch = __import__("torch")

    x_np = rng.random((4, 5, 7), dtype=np.float32)
    up_np = rng.random((4, 5, 3), dtype=np.float32)  # upstream grad for values

    # torch side: independent re-statement of the straight-through rule
    xt = torch.tensor(x_np, requires_grad=True)
    values, indices = torch.topk(xt, k=3, dim=-1, largest=True, sorted=True)
    values.backward(torch.tensor(up_np))
    torch_grad = xt.grad.numpy()

    def f(x):
        v, _ = differentiable_topk(x, 3, 7)
        return jnp.sum(v * jnp.asarray(up_np))

    jax_grad = np.asarray(jax.grad(f)(jnp.asarray(x_np)))
    np.testing.assert_allclose(jax_grad, torch_grad, rtol=1e-6)


def test_noop_variant_zero_grad(rng):
    """should_inplace_scatter=None quirk: backward is identically zero
    (reference models.py:30-31)."""
    x = jnp.asarray(rng.random((3, 8), dtype=np.float32))

    def f(x):
        v, _ = differentiable_topk_noop_grad(x, 2, 8)
        return jnp.sum(v)

    np.testing.assert_array_equal(np.asarray(jax.grad(f)(x)), np.zeros((3, 8)))


def test_k_equals_full_width(rng):
    x = jnp.asarray(rng.random((2, 6), dtype=np.float32))
    v, i = differentiable_topk(x, 6, 6)
    np.testing.assert_allclose(
        np.asarray(v), np.sort(np.asarray(x), axis=-1)[:, ::-1]
    )
