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
from ..ops.fused_hpd import hpd_tail, hpd_tail_unique
from ..ops.topk import differentiable_topk, differentiable_topk_noop_grad
from .mlp import MLPParams, apply_mlp, init_mlp

# dense (U, T) probability tables past this many elements stream instead
# (scaled-table configs, BASELINE config 4)
DEDUP_DENSE_MAX_ELEMENTS = 1 << 25


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


def apply_hpd_unique(
    params: MLPParams,
    ucoords: jnp.ndarray,
    cfg: ModelConfig,
    counts=None,
):
    """HPD on UNIQUE vertices (ops/dedup.py): same math as :func:`apply_hpd`
    on (U, d) rows. Small tables run dense; scaled tables stream the tail so
    the (U, T) probability tensor never materializes.

    Args:
      ucoords: (U, d) unique integer vertex coords.
      counts: (L, U) per-level occurrence counts, or None (inference — no
        marginal needed).

    Returns:
      (marginal_raw, values, indices): marginal_raw is the UNNORMALIZED
      count-weighted (L, T) marginal (None when counts is None or under
      keep_topk_only — callers marginalize the values instead); values/indices
      are (U, K).
    """
    u = ucoords.shape[0]
    t = cfg.hash_table_size
    stream = cfg.hpd_backend == "unique_stream" or (
        cfg.hpd_backend == "auto" and u * t > DEDUP_DENSE_MAX_ELEMENTS
    )
    noop = cfg.topk_scatter is TopkScatterMode.NOOP

    if not stream:
        probs_u, values, indices = apply_hpd(params, ucoords, cfg)
        marginal_raw = None
        if counts is not None and not cfg.keep_topk_only:
            marginal_raw = jnp.matmul(counts, probs_u, precision="highest")
        return marginal_raw, values, indices

    # streaming-tail backend: the TPU kernel pair (ops/pallas/hpd_stream.py)
    # keeps each (R, TT) logits tile in VMEM — the jax scan's (R, T) HBM
    # round trips between matmul/softmax/top_k dominate at scaled T.
    # Exact-top-k only; approx_max_k stays on the jax path.
    from ..ops.pallas.hpd_stream import supports as _stream_supports
    from ..ops.pallas import hidden as _hidden

    tail_backend = "jax"
    if cfg.topk_approx_recall is None and _stream_supports(t, cfg.topk_k):
        if cfg.hpd_backend == "unique_stream_pallas":
            tail_backend = "pallas"
        elif cfg.hpd_backend == "unique_stream_pallas_interpret":
            tail_backend = "pallas_interpret"
        elif (
            cfg.hpd_backend in ("auto", "unique_stream")
            and jax.devices()[0].platform != "cpu"
        ):
            tail_backend = "pallas"

    hidden_widths = tuple(lay["w"].shape[0] for lay in params[:-1])
    if tail_backend != "jax" and len(params) >= 2 and _hidden.supports(
        hidden_widths + (params[-2]["w"].shape[1],)
    ):
        # fused hidden-stack kernel with in-kernel recompute backward: XLA
        # runs these tiny-contraction (K=2/32/64) matmuls ~30x off their
        # FLOP cost at scaled U, and jax.checkpoint pays the stack twice
        # more in the backward (ops/pallas/hidden.py)
        h = _hidden.hidden_stack_pallas(
            ucoords,
            tuple((lay["w"], lay["b"]) for lay in params[:-1]),
            cfg.matmul_precision,
            tail_backend == "pallas_interpret",
        )
    else:
        # remat the hidden stack (cheap to recompute vs storing the (U, H)
        # intermediates for scaled configs where HBM is the constraint)
        @jax.checkpoint
        def hidden_stack(rows, hidden_layers):
            h = rows
            for layer in hidden_layers:
                h = jax.nn.relu(
                    jnp.matmul(h, layer["w"], precision=cfg.matmul_precision)
                    + layer["b"]
                )
            return h

        h = hidden_stack(ucoords, params[:-1])
    counts_in = (
        counts
        if counts is not None
        else jnp.zeros((1, u), jnp.float32)
    )
    marginal_raw, values, indices = hpd_tail_unique(
        h, params[-1]["w"], params[-1]["b"], counts_in,
        cfg.topk_k, cfg.matmul_precision, noop, cfg.topk_approx_recall,
        tail_backend,
    )
    if counts is None or cfg.keep_topk_only:
        marginal_raw = None
    return marginal_raw, values, indices


def apply_hpd_fused(
    params: MLPParams, vertices: jnp.ndarray, cfg: ModelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Memory-fused HPD: same math as :func:`apply_hpd` + the loss marginal,
    but the dense (P, L, V, T) probs tensor never reaches HBM (see
    ops/fused_hpd.py). The straight-through top-k backward is built into the
    fused op's VJP.

    Returns:
      marginal:    (L, T) per-level marginal slot distribution (what the
                   JS/KL loss consumes, reference utils.py:138).
      topk_values: (P, L, V, K);  topk_indices: (P, L, V, K) int32.
    """
    p, l, v, d = vertices.shape
    # level-major rows so each level's marginal accumulates contiguously
    rows = jnp.transpose(vertices, (1, 0, 2, 3)).reshape(l, p * v, d)
    backend = cfg.hpd_backend
    if backend == "auto":
        # the iterative-argmax Pallas top-k degrades for very wide K (grid
        # axis reaches 128) and the single-tile kernels cap the table width
        # by VMEM (R*T fp32 tiles); the streaming jax backend covers the rest
        on_accel = jax.devices()[0].platform != "cpu"
        backend = (
            "pallas_full"
            if (on_accel and cfg.topk_k <= 32 and cfg.hash_table_size <= 2048)
            else "jax"
        )

    if backend.startswith("pallas_full"):
        # whole index network in one kernel — only the (L, N, d) vertices and
        # the (L, N, K) outputs touch HBM (ops/pallas/hpd_full.py)
        from ..ops.pallas.hpd_full import hpd_full

        layers = tuple((lay["w"], lay["b"]) for lay in params)
        marginal, vals, idx = hpd_full(
            rows, layers, cfg.topk_k,
            backend == "pallas_full_interpret",
        )
    else:
        # remat: the hidden activations are cheap to recompute relative to
        # storing (L, N, 32+64) intermediates for backward — matters for
        # scaled-table configs where HBM is the constraint
        @jax.checkpoint
        def hidden_stack(rows, hidden_layers):
            h = rows
            for layer in hidden_layers:
                h = jax.nn.relu(
                    jnp.matmul(h, layer["w"], precision=cfg.matmul_precision)
                    + layer["b"]
                )
            return h

        h = hidden_stack(rows, params[:-1])
        marginal, vals, idx = hpd_tail(
            h, params[-1]["w"], params[-1]["b"], cfg.topk_k,
            cfg.matmul_precision, backend, cfg.topk_approx_recall,
        )
    k = cfg.topk_k
    values = jnp.transpose(vals.reshape(l, p, v, k), (1, 0, 2, 3))
    indices = jnp.transpose(idx.reshape(l, p, v, k), (1, 0, 2, 3))
    return marginal, values, indices
