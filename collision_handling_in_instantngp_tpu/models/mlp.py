"""Functional MLP building blocks (pure pytrees, no framework Modules).

The reference builds its networks from ``nn.Sequential(Linear, act)`` stacks
(HPD: models.py:80-88, decoder: models.py:382-392). Here a network is a list of
``{"w": (in, out), "b": (out,)}`` dicts plus a pure ``apply``; everything jits
and shards as plain data.

Initialization matches torch ``nn.Linear`` defaults in distribution (not
bitwise — different PRNG): weights and biases ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
(torch's kaiming_uniform with a=sqrt(5) reduces to that bound), so randomly-
initialized training runs are statistically comparable to the reference.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

MLPParams = List[dict]


def init_mlp(
    key: jax.Array, widths: Sequence[int], dtype=jnp.float32
) -> MLPParams:
    """Create params for a linear stack with layer widths ``widths[0] -> ... ->
    widths[-1]`` (reference layer construction models.py:80-88, 384-392)."""
    layers = []
    for i in range(len(widths) - 1):
        fan_in, fan_out = int(widths[i]), int(widths[i + 1])
        key, wk, bk = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(fan_in)
        layers.append(
            {
                "w": jax.random.uniform(
                    wk, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
                ),
                "b": jax.random.uniform(
                    bk, (fan_out,), dtype, minval=-bound, maxval=bound
                ),
            }
        )
    return layers


def apply_mlp(
    params: MLPParams,
    x: jnp.ndarray,
    hidden_activation: str = "relu",
    final_activation: str = "none",
    precision: str = "highest",
) -> jnp.ndarray:
    """Apply the stack. ``x`` may have any leading batch dims; the contraction
    runs on the last axis (XLA collapses leading dims onto the MXU).

    hidden_activation: "relu" | "leaky_relu" (slope 0.01, torch default —
      reference models.py:388).
    final_activation: "none" | "softmax" | "sigmoid".
    precision: MXU precision for the matmuls — "highest" gives true-fp32
      results matching the fp32 torch reference; "default" enables the fast
      bf16-multiply path.
    """
    n = len(params)
    for i, layer in enumerate(params):
        x = jnp.matmul(x, layer["w"], precision=precision) + layer["b"]
        if i < n - 1:
            if hidden_activation == "relu":
                x = jax.nn.relu(x)
            elif hidden_activation == "leaky_relu":
                x = jax.nn.leaky_relu(x, negative_slope=0.01)
            else:
                raise ValueError(hidden_activation)
    if final_activation == "softmax":
        x = jax.nn.softmax(x, axis=-1)
    elif final_activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif final_activation != "none":
        raise ValueError(final_activation)
    return x
