"""Pallas TPU kernels for the fused HPD tail (see ops/fused_hpd.py for the
contract and the math; this file is the TPU-native execution of it).

Forward kernel, grid (L, C) over (levels, row-blocks):
  one (R, H) @ (H, T) MXU tile -> softmax -> iterative top-k (K argmax passes
  on the VPU) -> masked marginal accumulation into a revisited (1, T) output
  block. The dense (N, T) probability tensor only ever exists as one (R, T)
  VMEM tile.

Backward kernel, same grid:
  recomputes the tile's softmax, rebuilds dL/dp from the marginal-broadcast
  gradient + the straight-through top-k scatter (one-hot compare against the
  saved indices), applies the softmax VJP, and emits dh tiles plus dW/db
  accumulated across the whole grid into revisited output blocks. TPU grid
  iteration is sequential, so revisited-block accumulation is deterministic —
  bitwise-stable gradients, unlike CUDA atomics (SURVEY.md §7 "scatter-add
  determinism").

Row blocks R=512 keep VMEM use ~ (R*T + R*H + H*T) * 4B ≈ 1 MB at the default
T=256, H=128 — far under the ~16 MB budget, leaving room for double buffering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512


def _pad_rows(h: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = h.shape[1]
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    return h, n


def _softmax_tile(logits: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.nan_to_num(p)  # reference models.py:111


def _fwd_kernel(h_ref, w_ref, b_ref, marg_ref, vals_ref, idx_ref, *, k, n_valid):
    # marg_ref holds the FULL (L, T) array (a (1, T) row block would violate
    # the TPU sublane-divisibility rule for L not divisible by 8); each grid
    # step updates its level's row with a dynamic-index store
    li = pl.program_id(0)
    c = pl.program_id(1)
    r, t = h_ref.shape[1], w_ref.shape[1]
    logits = (
        jnp.dot(h_ref[0], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )                                                   # (R, T)
    p = _softmax_tile(logits)

    # iterative top-k: K argmax/mask passes (K is small and static; large K
    # configs route to the jax backend upstream)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    work = p
    for kk in range(k):
        am = jnp.argmax(work, axis=-1)                  # (R,) first-index ties
        vals_ref[0, :, kk] = jnp.max(work, axis=-1)
        idx_ref[0, :, kk] = am.astype(jnp.int32)
        work = jnp.where(col_ids == am[:, None], -1.0, work)

    row_ids = c * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    masked = jnp.where(row_ids < n_valid, p, 0.0)
    contrib = jnp.sum(masked, axis=0, keepdims=True)    # (1, T)

    @pl.when(c == 0)
    def _():
        marg_ref[pl.ds(li, 1), :] = contrib

    @pl.when(c != 0)
    def _():
        marg_ref[pl.ds(li, 1), :] = marg_ref[pl.ds(li, 1), :] + contrib


def hpd_tail_pallas_fwd(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """h: (L, N, H), w: (H, T), b: (T,) ->
    (marginal (L, T), vals (L, N, K), idx (L, N, K))."""
    l, n, hd = h.shape
    t = w.shape[1]
    h_pad, n_valid = _pad_rows(h, BLOCK_ROWS)
    n_pad = h_pad.shape[1]
    c = n_pad // BLOCK_ROWS

    marg, vals, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n_valid=n_valid),
        grid=(l, c),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_ROWS, hd), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((hd, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((l, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, BLOCK_ROWS, k), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_ROWS, k), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, t), jnp.float32),
            jax.ShapeDtypeStruct((l, n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((l, n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t))
    return marg / n, vals[:, :n], idx[:, :n]


def _bwd_kernel(
    h_ref, w_ref, b_ref, idx_ref, gvals_ref, gmarg_ref,
    dh_ref, dw_ref, db_ref, *, k, n_valid,
):
    li = pl.program_id(0)
    c = pl.program_id(1)
    r, t = h_ref.shape[1], w_ref.shape[1]
    logits = (
        jnp.dot(h_ref[0], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    p = _softmax_tile(logits)

    row_ids = c * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    valid = (row_ids < n_valid).astype(jnp.float32)      # (R, 1)

    # dL/dp: marginal broadcast (already /N upstream) + top-k scatter;
    # gmarg_ref holds the full (L, T) array (sublane rule), dynamic row read
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    g_p = jnp.broadcast_to(gmarg_ref[pl.ds(li, 1), :], (r, t))
    for kk in range(k):
        g_p = g_p + jnp.where(
            col_ids == idx_ref[0, :, kk][:, None],
            gvals_ref[0, :, kk][:, None],
            0.0,
        )
    g_p = g_p * valid

    dlogits = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
    dh_ref[0] = jnp.dot(
        dlogits, w_ref[:].T, preferred_element_type=jnp.float32
    )

    dw_contrib = jnp.dot(
        h_ref[0].T, dlogits, preferred_element_type=jnp.float32
    )
    db_contrib = jnp.sum(dlogits, axis=0)

    is_first = jnp.logical_and(li == 0, c == 0)

    @pl.when(is_first)
    def _():
        dw_ref[:, :] = dw_contrib
        db_ref[0, :] = db_contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        dw_ref[:, :] = dw_ref[:, :] + dw_contrib
        db_ref[0, :] = db_ref[0, :] + db_contrib


def hpd_tail_pallas_bwd(
    h: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    idx: jnp.ndarray,
    g_marg: jnp.ndarray,
    g_vals: jnp.ndarray,
    k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dh (L, N, H), dw (H, T), db (T,))."""
    l, n, hd = h.shape
    t = w.shape[1]
    h_pad, n_valid = _pad_rows(h, BLOCK_ROWS)
    n_pad = h_pad.shape[1]
    c = n_pad // BLOCK_ROWS
    pad = n_pad - n
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        g_vals = jnp.pad(g_vals, ((0, 0), (0, pad), (0, 0)))
    g_marg_row = (g_marg / n).astype(jnp.float32)        # fold primal's 1/N

    dh, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n_valid=n_valid),
        grid=(l, c),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_ROWS, hd), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((hd, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, BLOCK_ROWS, k), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_ROWS, k), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((l, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, BLOCK_ROWS, hd), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((hd, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda li, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, n_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, t), jnp.float32),
            jax.ShapeDtypeStruct((1, t), jnp.float32),
        ],
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t), idx, g_vals, g_marg_row)
    return dh[:, :n], dw, db.reshape(t)
