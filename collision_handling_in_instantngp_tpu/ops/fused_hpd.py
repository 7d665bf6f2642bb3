"""Fused HPD tail: last linear layer + softmax + straight-through top-k +
loss-marginal accumulation, WITHOUT materializing the dense (P, L, V, T)
probability tensor in HBM.

This is the defining memory/bandwidth optimization of the TPU rebuild
(SURVEY.md §2.2: the dense probs are ~940 MB fp32 per reference minibatch and
forced the reference into 1/3-image batches with ~70 manual ``del`` calls).
The training loss only ever consumes the MARGINAL slot distribution
``m_l = sum_{rows} p / (P*V)`` (reference utils.py:138,159), and the feature
blend only consumes the top-k values/indices — so the dense tensor is a pure
intermediate. This op streams over row chunks, emitting:

    marginal  (L, T)    — per-level marginal of softmax probabilities
    topk_vals (L, N, K) — top-k probabilities per row (descending)
    topk_idx  (L, N, K) — their slot ids

with the exact backward of the reference composition (softmax VJP of
[marginal-broadcast gradient + straight-through top-k scatter], reference
models.py:5-42 + utils.py:122-174):

    dL/dp_row   = g_marginal[l] / (P*V)  +  scatter(g_topk_row at idx_row)
    dL/dlogits  = p * (dL/dp - <dL/dp, p>)
    dL/dh       = dL/dlogits @ W^T ;  dW = h^T @ dL/dlogits ;  db = sum rows

Residuals: only ``h`` (the (L, N, H) last hidden activations) and the top-k
indices — the backward recomputes each chunk's softmax on the fly.

Backends:
  * "jax"    — lax.scan over row chunks (runs everywhere; the oracle)
  * "pallas" — TPU kernel (ops/pallas/hpd_tail.py) with the same contract
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

CHUNK_ROWS = 4096
# target elements per streamed (L, R, T) tile — bounds peak memory for
# scaled-table configs (BASELINE.json config 4: T up to 2^14+)
_TILE_BUDGET = 1 << 24
# widest K for the compare-accumulate scatter-free top-k gradient expansion
_SCATTER_FREE_MAX_K = 16


def _scatter_topk_grad(p_like, idx, gv):
    """Expand per-row top-k cotangents to the dense T axis WITHOUT a scatter.

    TPU scatters serialize; ``put_along_axis`` on a (R, T) tile measured
    ~100+ ms/batch at scaled shapes. For small static K the expansion is K
    vectorized compare-multiply passes over the tile (exact — each row's K
    indices are distinct). idx/gv: (..., K); returns shape of ``p_like``.

    Falls back to put_along_axis for wide K (grid axis reaches 128) where K
    compare passes would exceed the scatter cost."""
    k = idx.shape[-1]
    if k > _SCATTER_FREE_MAX_K:
        return jnp.put_along_axis(
            jnp.zeros_like(p_like), idx, gv.astype(p_like.dtype),
            axis=-1, inplace=False,
        )
    t = p_like.shape[-1]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (p_like.ndim - 1) + (t,), p_like.ndim - 1
    )
    out = jnp.zeros_like(p_like)
    for ki in range(k):
        hit = (idx[..., ki : ki + 1] == iota).astype(p_like.dtype)
        out = out + hit * gv[..., ki : ki + 1].astype(p_like.dtype)
    return out


def _chunk_rows(num_levels: int, t: int) -> int:
    rows = _TILE_BUDGET // max(num_levels * t, 1)
    return int(max(256, min(CHUNK_ROWS, rows)))


def _pad_rows(h: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = h.shape[1]
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    return h, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def hpd_tail(
    h: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    k: int,
    precision: str,
    backend: str = "jax",
    approx_recall=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming fused tail.

    Args:
      h: (L, N, H) last hidden activations, rows ordered level-major
         (N = P * V rows per level).
      w: (H, T) final-layer weight;  b: (T,) bias.
      k: top-k width (static).
      precision: matmul precision for the (R, H) @ (H, T) tiles.
      backend: "jax" (lax.scan streaming — runs everywhere),
               "pallas" (TPU kernel), "pallas_interpret" (kernel under the
               Pallas interpreter — CPU testing).

    Returns:
      marginal (L, T) float32, topk_vals (L, N, K), topk_idx (L, N, K) int32.
    """
    out, _ = _fwd_impl(h, w, b, k, precision, backend, approx_recall)
    return out


def _chunked(h: jnp.ndarray, chunk: int):
    l, n_pad, hd = h.shape
    c = n_pad // chunk
    # (L, C, R, H) -> (C, L, R, H) so scan carries one chunk of every level
    return jnp.moveaxis(h.reshape(l, c, chunk, hd), 1, 0)


def _topk(p, k, approx_recall):
    """Exact lax.top_k, or the TPU partial-reduction approx_max_k when an
    approximate recall target is configured (ModelConfig.topk_approx_recall
    — ~14x faster over T=2^14 lanes, opt-in)."""
    if approx_recall:
        return jax.lax.approx_max_k(p, k, recall_target=float(approx_recall))
    return jax.lax.top_k(p, k)


def _fwd_impl(h, w, b, k, precision, backend="jax", approx_recall=None):
    if backend.startswith("pallas"):
        from .pallas.hpd_tail import hpd_tail_pallas_fwd

        out = hpd_tail_pallas_fwd(
            h, w, b, k, interpret=(backend == "pallas_interpret")
        )
        return out, None
    l, n, hd = h.shape
    t = w.shape[1]
    chunk_rows = _chunk_rows(l, t)
    h_pad, n_valid = _pad_rows(h, chunk_rows)
    chunks = _chunked(h_pad, chunk_rows)              # (C, L, R, H)
    c = chunks.shape[0]

    def body(marg, xs):
        chunk_id, h_chunk = xs
        logits = jnp.matmul(h_chunk, w, precision=precision) + b   # (L, R, T)
        p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
        row_ids = chunk_id * chunk_rows + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk_rows, 1), 1
        )
        valid = (row_ids < n_valid).astype(p.dtype)                # (1, R, 1)
        marg = marg + jnp.sum(p * valid, axis=1)                   # (L, T)
        vals, idx = _topk(p, k, approx_recall)                     # (L, R, K)
        return marg, (vals, idx.astype(jnp.int32))

    marg0 = jnp.zeros((l, t), jnp.float32)
    marg, (vals, idx) = jax.lax.scan(
        body, marg0, (jnp.arange(c, dtype=jnp.int32), chunks)
    )
    # (C, L, R, K) -> (L, N, K)
    vals = jnp.moveaxis(vals, 0, 1).reshape(l, c * chunk_rows, k)[:, :n]
    idx = jnp.moveaxis(idx, 0, 1).reshape(l, c * chunk_rows, k)[:, :n]
    denom = jnp.asarray(n, jnp.float32)
    return (marg / denom, vals, idx), None


def _hpd_tail_fwd(h, w, b, k, precision, backend="jax", approx_recall=None):
    out, _ = _fwd_impl(h, w, b, k, precision, backend, approx_recall)
    _, _, idx = out
    return out, (h, w, b, idx)


def _hpd_tail_bwd(k, precision, backend, approx_recall, residuals, cotangents):
    h, w, b, idx = residuals
    g_marg, g_vals, _g_idx = cotangents
    if backend.startswith("pallas"):
        from .pallas.hpd_tail import hpd_tail_pallas_bwd

        return hpd_tail_pallas_bwd(
            h, w, b, idx, g_marg, g_vals, k,
            interpret=(backend == "pallas_interpret"),
        )
    l, n, hd = h.shape
    t = w.shape[1]
    chunk_rows = _chunk_rows(l, t)

    h_pad, n_valid = _pad_rows(h, chunk_rows)
    chunks = _chunked(h_pad, chunk_rows)
    c = chunks.shape[0]

    pad = c * chunk_rows - n
    if pad:
        g_vals = jnp.pad(g_vals, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
    g_vals_chunks = _chunked(g_vals, chunk_rows)      # (C, L, R, K)
    idx_chunks = _chunked(idx, chunk_rows)

    # d marginal / d p already includes the 1/N that the primal applied
    g_marg_row = (g_marg / n)[:, None, :]             # (L, 1, T)

    def body(carry, xs):
        dw, db = carry
        chunk_id, h_chunk, gv_chunk, idx_chunk = xs
        logits = jnp.matmul(h_chunk, w, precision=precision) + b
        p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))        # (L, R, T)
        row_ids = chunk_id * chunk_rows + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk_rows, 1), 1
        )
        valid = (row_ids < n_valid).astype(p.dtype)
        g_p = _scatter_topk_grad(p, idx_chunk, gv_chunk)
        g_p = (g_p + g_marg_row) * valid
        # softmax vjp (nan_to_num is identity for finite p)
        dlogits = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
        dh_chunk = jnp.matmul(dlogits, w.T, precision=precision)
        dw = dw + jnp.einsum(
            "lrh,lrt->ht", h_chunk, dlogits, precision=precision
        )
        db = db + jnp.sum(dlogits, axis=(0, 1))
        return (dw, db), dh_chunk

    (dw, db), dh_chunks = jax.lax.scan(
        body,
        (jnp.zeros((hd, t), h.dtype), jnp.zeros((t,), h.dtype)),
        (
            jnp.arange(c, dtype=jnp.int32),
            chunks,
            g_vals_chunks,
            idx_chunks,
        ),
    )
    dh = jnp.moveaxis(dh_chunks, 0, 1).reshape(l, c * chunk_rows, hd)[:, :n]
    return dh, dw, db


hpd_tail.defvjp(_hpd_tail_fwd, _hpd_tail_bwd)


def hpd_tail_dense_reference(h, w, b, k, precision="highest"):
    """Unfused oracle: materializes the dense probs (for tests only)."""
    logits = jnp.matmul(h, w, precision=precision) + b
    p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
    marginal = jnp.mean(p, axis=1)
    vals, idx = jax.lax.top_k(p, k)
    return marginal, vals, idx.astype(jnp.int32)


# --------------------------------------------------------------------------- #
# Unique-vertex streaming tail (scaled-table configs)                         #
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def hpd_tail_unique(
    h: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    counts: jnp.ndarray,
    k: int,
    precision: str,
    noop_topk: bool = False,
    approx_recall=None,
    backend: str = "jax",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming fused tail over UNIQUE vertices (see ops/dedup.py).

    The scaled-table analog of :func:`hpd_tail`: rows are the U unique grid
    vertices shared across levels, and the per-level loss marginal is the
    count-weighted sum ``m_l = counts_l @ p`` (the dedup identity for
    reference utils.py:138). The dense (U, T) probability tensor never reaches
    HBM — each chunk's softmax is recomputed in the backward.

    Args:
      h: (U, H) last hidden activations per unique vertex.
      w: (H, T) head weight;  b: (T,) bias.
      counts: (L, U) per-level vertex occurrence counts (constant geometry).
      k: top-k width.  precision: matmul precision.
      noop_topk: reference ``should_inplace_scatter=None`` quirk
        (models.py:31) — the straight-through top-k backward is dropped (the
        marginal gradient still flows).
      backend: "jax" (lax.scan streaming), "pallas" (TPU streaming kernels,
        ops/pallas/hpd_stream.py — exact top-k selection on logits, online
        softmax; T tiled past the single-tile kernels' cap),
        "pallas_interpret" (same kernels under the interpreter — CPU tests).
        The backward always runs the jax streaming VJP.

    Returns:
      marginal_raw (L, T) — UNNORMALIZED count-weighted marginal (callers
        divide by the per-level row count), topk vals (U, K), idx (U, K).
    """
    out, _ = _unique_fwd_impl(
        h, w, b, counts, k, precision, approx_recall, backend
    )
    return out


def _unique_chunk_rows(t: int) -> int:
    return int(max(256, min(CHUNK_ROWS, _TILE_BUDGET // max(t, 1))))


def _unique_fwd_impl(h, w, b, counts, k, precision, approx_recall=None,
                     backend="jax"):
    if backend.startswith("pallas"):
        from .pallas.hpd_stream import hpd_tail_unique_pallas_fwd

        out = hpd_tail_unique_pallas_fwd(
            h, w, b, counts, k, precision,
            interpret=(backend == "pallas_interpret"),
        )
        return out, None
    u, hd = h.shape
    t = w.shape[1]
    chunk = _unique_chunk_rows(t)
    pad = (-u) % chunk
    # padded rows carry zero counts -> zero marginal weight; their top-k
    # outputs are sliced off below
    h_pad = jnp.pad(h, ((0, pad), (0, 0)))
    counts_pad = jnp.pad(counts, ((0, 0), (0, pad)))
    c = h_pad.shape[0] // chunk
    h_chunks = h_pad.reshape(c, chunk, hd)
    counts_chunks = jnp.moveaxis(
        counts_pad.reshape(counts.shape[0], c, chunk), 1, 0
    )                                                       # (C, L, R)

    def body(marg, xs):
        h_chunk, counts_chunk = xs
        logits = jnp.matmul(h_chunk, w, precision=precision) + b     # (R, T)
        p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
        marg = marg + jnp.matmul(counts_chunk, p, precision=precision)
        vals, idx = _topk(p, k, approx_recall)
        return marg, (vals, idx.astype(jnp.int32))

    marg0 = jnp.zeros((counts.shape[0], t), jnp.float32)
    marg, (vals, idx) = jax.lax.scan(body, marg0, (h_chunks, counts_chunks))
    vals = vals.reshape(c * chunk, k)[:u]
    idx = idx.reshape(c * chunk, k)[:u]
    return (marg, vals, idx), None


def _unique_fwd(h, w, b, counts, k, precision, noop_topk=False,
                approx_recall=None, backend="jax"):
    if backend.startswith("pallas"):
        # keep the select kernel's (m, s) row statistics as residuals so the
        # backward kernels skip the online max/sum-exp sweep entirely
        from .pallas.hpd_stream import (
            fused_supports,
            hpd_stream_fused_fwd,
            hpd_stream_marginal,
            hpd_stream_select,
        )

        interp = backend == "pallas_interpret"
        if fused_supports(w.shape[1], k, h.shape[1]):
            # single-sweep kernel: logits cached in VMEM, the (R, H) @ (H, T)
            # matmul runs once instead of once per pass
            marg, vals, idx, m, s = hpd_stream_fused_fwd(
                h, w, b, counts, k, precision, interpret=interp
            )
        else:
            vals, idx, m, s = hpd_stream_select(
                h, w, b, k, precision, interpret=interp
            )
            marg = hpd_stream_marginal(
                h, w, b, counts, m, s, precision, interpret=interp
            )
        return (marg, vals, idx), (h, w, b, counts, idx, vals, m, s)
    out, _ = _unique_fwd_impl(
        h, w, b, counts, k, precision, approx_recall, backend
    )
    _, _, idx = out
    return out, (h, w, b, counts, idx)


def _unique_bwd(k, precision, noop_topk, approx_recall, backend, residuals,
                cotangents):
    if backend.startswith("pallas"):
        from .pallas.hpd_stream import (
            fused_supports,
            hpd_stream_fused_bwd,
            hpd_tail_unique_pallas_bwd,
        )

        h, w, b, counts, idx, vals, m, s = residuals
        g_marg, g_vals, _g_idx = cotangents
        bwd_fn = (
            hpd_stream_fused_bwd
            if fused_supports(w.shape[1], k, h.shape[1])
            else hpd_tail_unique_pallas_bwd
        )
        dh, dw, db = bwd_fn(
            h, w, b, counts, idx, vals, m, s, g_marg, g_vals, k,
            precision, noop_topk,
            interpret=(backend == "pallas_interpret"),
        )
        return dh, dw, db, jnp.zeros_like(counts)
    h, w, b, counts, idx = residuals
    g_marg, g_vals, _g_idx = cotangents
    u, hd = h.shape
    t = w.shape[1]
    l = counts.shape[0]
    chunk = _unique_chunk_rows(t)
    pad = (-u) % chunk
    h_pad = jnp.pad(h, ((0, pad), (0, 0)))
    counts_pad = jnp.pad(counts, ((0, 0), (0, pad)))
    idx_pad = jnp.pad(idx, ((0, pad), (0, 0)))
    gv_pad = jnp.pad(g_vals, ((0, pad), (0, 0)))
    c = h_pad.shape[0] // chunk

    h_chunks = h_pad.reshape(c, chunk, hd)
    counts_chunks = jnp.moveaxis(counts_pad.reshape(l, c, chunk), 1, 0)
    idx_chunks = idx_pad.reshape(c, chunk, k)
    gv_chunks = gv_pad.reshape(c, chunk, k)
    g_marg = g_marg.astype(jnp.float32)                     # (L, T)

    def body(carry, xs):
        dw, db = carry
        h_chunk, counts_chunk, idx_chunk, gv_chunk = xs
        logits = jnp.matmul(h_chunk, w, precision=precision) + b
        p = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))          # (R, T)
        # marginal cotangent: d m_l / d p_row = counts_l[row] * g_marg_l
        g_p = jnp.matmul(
            counts_chunk.T, g_marg, precision=precision
        )                                                            # (R, T)
        if not noop_topk:
            g_p = g_p + _scatter_topk_grad(p, idx_chunk, gv_chunk)
        dlogits = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
        dh_chunk = jnp.matmul(dlogits, w.T, precision=precision)
        dw = dw + jnp.matmul(h_chunk.T, dlogits, precision=precision)
        db = db + jnp.sum(dlogits, axis=0)
        return (dw, db), dh_chunk

    (dw, db), dh_chunks = jax.lax.scan(
        body,
        (jnp.zeros((hd, t), h.dtype), jnp.zeros((t,), h.dtype)),
        (h_chunks, counts_chunks, idx_chunks, gv_chunks),
    )
    dh = dh_chunks.reshape(c * chunk, hd)[:u]
    return dh, dw, db, jnp.zeros_like(counts)


hpd_tail_unique.defvjp(_unique_fwd, _unique_bwd)
