"""HashProbDistribution (HPD) — the learned GNGF index network.

TPU-native equivalent of reference ``HashProbDistribution`` (models.py:45-123):
an MLP ``[d -> hpd_hidden... -> T]`` with ReLU hiddens and a Softmax head that
maps raw grid-vertex coordinates to a probability distribution over hash-table
slots, followed by nan sanitization (models.py:111) and the straight-through
top-k (models.py:116).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TopkScatterMode
from ..ops.topk import differentiable_topk, differentiable_topk_noop_grad
from .mlp import MLPParams, apply_mlp, init_mlp


def init_hpd(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> MLPParams:
    widths = (cfg.input_dim, *cfg.hpd_hidden, cfg.hash_table_size)
    return init_mlp(key, widths, dtype)


def apply_hpd(
    params: MLPParams, vertices: jnp.ndarray, cfg: ModelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full probs + top-k selection for every grid vertex.

    Args:
      params: HPD MLP params.
      vertices: (P, L, V, d) raw (integer-valued float) grid-vertex coords —
        the reference feeds these unnormalized (models.py:416-418).

    Returns:
      probs:       (P, L, V, T) softmax distribution (nan_to_num sanitized).
      topk_values: (P, L, V, K) descending.
      topk_indices:(P, L, V, K) int32.
    """
    probs = apply_mlp(
        params,
        vertices,
        hidden_activation="relu",
        final_activation="softmax",
        precision=cfg.matmul_precision,
    )
    probs = jnp.nan_to_num(probs)  # reference models.py:111
    if cfg.topk_scatter is TopkScatterMode.NOOP:
        values, indices = differentiable_topk_noop_grad(
            probs, cfg.topk_k, cfg.hash_table_size
        )
    else:
        values, indices = differentiable_topk(probs, cfg.topk_k, cfg.hash_table_size)
    return probs, values, indices
