"""Multi-resolution hash-table feature encoding.

TPU-native equivalent of reference ``MultiResHashEncoding`` (models.py:126-236).
The reference keeps L separate ``nn.Embedding(T, F)`` tables and loops a Python
gather per (level, k); here all levels live in ONE ``(L, T, F)`` array so the
entire lookup is a single fused gather (and its transpose a single deterministic
scatter-add in the backward — TPU reductions are deterministic, unlike CUDA
atomics). The table axis T can be sharded for scaled-table configs (see
parallel/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TopkBlendMode

# chunk rows for the one-hot table-gradient accumulation (see _gather_bwd)
_GRAD_CHUNK = 16384


def init_tables(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """(L, T, F) tables ~ U(-1e-4, 1e-4) (reference models.py:159-171)."""
    return jax.random.uniform(
        key,
        (cfg.num_levels, cfg.hash_table_size, cfg.feature_dim),
        dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _flat_gather(tables: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather features with per-level indices.

    tables: (L, T, F); indices: (P, L, ...) int -> (P, L, ..., F).
    Flattens the (L, T) axes so one gather serves every level (the level id is
    folded into the slot id), replacing the reference's per-level Python loop
    (models.py:182-207).

    Custom VJP: XLA lowers the natural backward (scatter-add of millions of
    per-row gradients into the tiny tables) to a serialized TPU scatter
    (~30 ms/batch measured). The VJP below accumulates the table gradient as
    a chunked one-hot MATMUL instead — the transpose of a gather is exactly
    ``one_hot(idx)^T @ grads`` — which runs on the MXU/VPU and is
    deterministic (sequential scan accumulation).
    """
    return _flat_gather_impl(tables, indices)


def _flat_gather_impl(tables, indices):
    l, t, f = tables.shape
    level_ids = jnp.arange(l, dtype=jnp.int32).reshape(
        (1, l) + (1,) * (indices.ndim - 2)
    )
    flat_idx = indices.astype(jnp.int32) + level_ids * t
    return jnp.take(tables.reshape(l * t, f), flat_idx, axis=0)


def _gather_fwd(tables, indices):
    return _flat_gather_impl(tables, indices), (indices, tables.shape)


def _gather_bwd(residuals, g):
    indices, (l, t, f) = residuals
    # rows grouped per level: (L, N) indices and (L, N, F) grads
    idx_ln = jnp.moveaxis(indices.astype(jnp.int32), 1, 0).reshape(l, -1)
    g_ln = jnp.moveaxis(g, 1, 0).reshape(l, -1, f)
    n = idx_ln.shape[1]
    chunk = max(1, min(_GRAD_CHUNK, (1 << 24) // max(l * t, 1)))
    pad = (-n) % chunk
    if pad:
        idx_ln = jnp.pad(idx_ln, ((0, 0), (0, pad)), constant_values=-1)
        g_ln = jnp.pad(g_ln, ((0, 0), (0, pad), (0, 0)))
    c = idx_ln.shape[1] // chunk
    idx_chunks = jnp.moveaxis(idx_ln.reshape(l, c, chunk), 1, 0)
    g_chunks = jnp.moveaxis(g_ln.reshape(l, c, chunk, f), 1, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)

    def body(acc, xs):
        idx_chunk, g_chunk = xs                      # (L, chunk), (L, chunk, F)
        onehot = (idx_chunk[:, :, None] == cols).astype(g_chunk.dtype)
        # (L, T, chunk) @ (L, chunk, F) -> (L, T, F) on the MXU
        acc = acc + jnp.einsum(
            "lct,lcf->ltf", onehot, g_chunk, precision="highest"
        )
        return acc, None

    dtables, _ = jax.lax.scan(
        body, jnp.zeros((l, t, f), g.dtype), (idx_chunks, g_chunks)
    )
    return dtables, None


_flat_gather.defvjp(_gather_fwd, _gather_bwd)


def lookup_vanilla(tables: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Spatial-hash path lookup (reference models.py:182-190).

    indices: (P, L, V) -> features (P, L, V, F).
    """
    return _flat_gather(tables, indices)


def blend_weights(probs_topk: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Per-candidate blend weights over the K axis (reference
    models.py:212-217; see config.TopkBlendMode)."""
    if cfg.topk_blend is TopkBlendMode.RAW_SUM:
        return probs_topk
    if cfg.topk_blend is TopkBlendMode.SOFTMAX_AVG:
        return jax.nn.softmax(probs_topk, axis=-1)
    if cfg.topk_blend is TopkBlendMode.WEIGHTED_AVG:
        return probs_topk / jnp.sum(probs_topk, axis=-1, keepdims=True)
    raise ValueError(cfg.topk_blend)


def blend_unique(
    tables: jnp.ndarray,
    idx_unique: jnp.ndarray,
    vals_unique: jnp.ndarray,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Blend the K candidate slots ONCE PER UNIQUE VERTEX (see ops/dedup.py).

    The reference gathers and blends per (pixel, level, corner, k) row
    (models.py:194-224) — >500x duplicated work since the HPD's top-k depends
    only on the vertex coords. Here the (U, K) candidates are looked up in
    every level's table and blended into a (L, U, F) per-vertex feature table
    that pixels then gather from (gather_rows).

    Args:
      idx_unique:  (U, K) slot ids per unique vertex.
      vals_unique: (U, K) selected probabilities (straight-through gradient).

    Returns:
      (L, U, F) blended per-vertex features.
    """
    u, k = idx_unique.shape
    l = tables.shape[0]
    # (U, L, K) broadcast so the shared-across-levels candidates hit every
    # level's table through the fused flat gather (deterministic one-hot bwd)
    idx_bcast = jnp.broadcast_to(idx_unique[:, None, :], (u, l, k))
    gathered = _flat_gather(tables, idx_bcast)                 # (U, L, K, F)
    w = blend_weights(vals_unique, cfg)                        # (U, K)
    return jnp.einsum(
        "ulkf,uk->luf", gathered, w, precision="highest"
    )


def gather_rows(per_level_table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel gather from a (L, U, F) per-vertex feature table.

    ids: (P, L, V) unique-vertex ids -> (P, L, V, F) features. Same fused
    flat-gather (and chunked one-hot segment-sum backward) as the hash-table
    lookup — the transpose of this gather is exactly the count-weighted
    accumulation that makes vertex dedup gradient-exact."""
    return _flat_gather(per_level_table, ids)


def lookup_topk_blend(
    tables: jnp.ndarray,
    indices_topk: jnp.ndarray,
    probs_topk: jnp.ndarray,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """GNGF path: gather the K candidate slots per vertex and blend.

    Args:
      indices_topk: (P, L, V, K) slot ids.
      probs_topk:   (P, L, V, K) selected probabilities (carry the straight-
        through gradient back into the HPD, see ops/topk.py).

    Returns:
      (P, L, V, F) blended features. Blend modes per reference
      models.py:212-217 (see config.TopkBlendMode).
    """
    feats = _flat_gather(tables, indices_topk)                    # (P, L, V, K, F)
    w = blend_weights(probs_topk, cfg)
    return jnp.sum(feats * w[..., None], axis=-2)
