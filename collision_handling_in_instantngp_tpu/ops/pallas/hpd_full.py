"""Fully-fused HPD kernel: the ENTIRE index network — hidden MLP stack + last
linear + softmax + straight-through top-k + loss marginal — in one Pallas
kernel pair.

v1 (ops/pallas/hpd_tail.py) fuses from the last hidden activation onward, so
the (L, N, H) hidden tensor (~470 MB fp32 for the reference workload) still
crosses HBM four times (forward write, residual read, plus the autodiff of the
hidden stack storing every ReLU activation). Here the only HBM-resident
per-row tensors are the (L, N, d=2) grid vertices (~7 MB) and the (L, N, K)
top-k outputs: each (R, d) vertex tile is pushed through every layer inside
VMEM, and the backward REPLAYS the stack from the vertices (cheap: the hidden
stack is ~1/4 of the tail's FLOPs) instead of loading saved activations.

Gradients: dW_i/db_i accumulate into revisited output blocks across the whole
sequential grid (deterministic on TPU). The grid vertices are data (the
reference marks them requires_grad_ but discards the gradient,
models.py:416), so no dverts is produced.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512


def _pad_rows(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[1]
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, n


def _softmax_tile(logits: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.nan_to_num(p)  # reference models.py:111


def _forward_stack(x, wb_refs, num_layers):
    """Run the MLP inside the kernel; returns (activations, logits).
    activations[i] is the INPUT of layer i."""
    acts = [x]
    for i in range(num_layers - 1):
        w, b = wb_refs[2 * i], wb_refs[2 * i + 1]
        x = jnp.maximum(
            jnp.dot(x, w[:, :], preferred_element_type=jnp.float32) + b[:],
            0.0,
        )
        acts.append(x)
    w, b = wb_refs[2 * (num_layers - 1)], wb_refs[2 * num_layers - 1]
    logits = jnp.dot(x, w[:, :], preferred_element_type=jnp.float32) + b[:]
    return acts, logits


def _fwd_kernel(*refs, k, n_valid, num_layers):
    verts_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * num_layers]
    marg_ref, vals_ref, idx_ref = refs[1 + 2 * num_layers :]

    li = pl.program_id(0)
    c = pl.program_id(1)
    r = verts_ref.shape[1]

    _, logits = _forward_stack(verts_ref[0], wb_refs, num_layers)
    t = logits.shape[-1]
    p = _softmax_tile(logits)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    work = p
    for kk in range(k):
        am = jnp.argmax(work, axis=-1)
        vals_ref[0, :, kk] = jnp.max(work, axis=-1)
        idx_ref[0, :, kk] = am.astype(jnp.int32)
        work = jnp.where(col_ids == am[:, None], -1.0, work)

    row_ids = c * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    contrib = jnp.sum(
        jnp.where(row_ids < n_valid, p, 0.0), axis=0, keepdims=True
    )

    @pl.when(c == 0)
    def _():
        marg_ref[pl.ds(li, 1), :] = contrib

    @pl.when(c != 0)
    def _():
        marg_ref[pl.ds(li, 1), :] = marg_ref[pl.ds(li, 1), :] + contrib


def _bwd_kernel(*refs, k, n_valid, num_layers):
    verts_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * num_layers]
    idx_ref, gvals_ref, gmarg_ref = refs[1 + 2 * num_layers : 4 + 2 * num_layers]
    grad_refs = refs[4 + 2 * num_layers :]          # dw0, db0, dw1, db1, ...

    li = pl.program_id(0)
    c = pl.program_id(1)
    r = verts_ref.shape[1]

    acts, logits = _forward_stack(verts_ref[0], wb_refs, num_layers)
    t = logits.shape[-1]
    p = _softmax_tile(logits)

    row_ids = c * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    valid = (row_ids < n_valid).astype(jnp.float32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    g_p = jnp.broadcast_to(gmarg_ref[pl.ds(li, 1), :], (r, t))
    for kk in range(k):
        g_p = g_p + jnp.where(
            col_ids == idx_ref[0, :, kk][:, None],
            gvals_ref[0, :, kk][:, None],
            0.0,
        )
    g_p = g_p * valid

    d = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))  # dlogits

    is_first = jnp.logical_and(li == 0, c == 0)
    for i in reversed(range(num_layers)):
        w_ref = wb_refs[2 * i]
        dw_ref, db_ref = grad_refs[2 * i], grad_refs[2 * i + 1]
        dw_contrib = jnp.dot(
            acts[i].T, d, preferred_element_type=jnp.float32
        )
        db_contrib = jnp.sum(d, axis=0, keepdims=True)

        @pl.when(is_first)
        def _(dw_ref=dw_ref, db_ref=db_ref, dw_c=dw_contrib, db_c=db_contrib):
            dw_ref[:, :] = dw_c
            db_ref[:, :] = db_c

        @pl.when(jnp.logical_not(is_first))
        def _(dw_ref=dw_ref, db_ref=db_ref, dw_c=dw_contrib, db_c=db_contrib):
            dw_ref[:, :] = dw_ref[:, :] + dw_c
            db_ref[:, :] = db_ref[:, :] + db_c

        if i > 0:
            d = jnp.dot(
                d, w_ref[:, :].T, preferred_element_type=jnp.float32
            ) * (acts[i] > 0.0).astype(jnp.float32)


def _flatten_layers(layers):
    flat = []
    for w, b in layers:
        flat.append(w)
        flat.append(b.reshape(1, -1))
    return flat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hpd_full(
    verts: jnp.ndarray,
    layers: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
    k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fully-fused HPD forward.

    Args:
      verts: (L, N, d) grid-vertex coordinates, level-major rows.
      layers: tuple of (w (in, out), b (out,)) for every layer, last one the
        (H, T) head.
      k: top-k width.

    Returns:
      (marginal (L, T), topk_vals (L, N, K), topk_idx (L, N, K)).
    """
    out, _ = _full_fwd_impl(verts, layers, k, interpret)
    return out


def _full_fwd_impl(verts, layers, k, interpret):
    l, n, d = verts.shape
    t = layers[-1][0].shape[1]
    m = len(layers)
    v_pad, n_valid = _pad_rows(verts, BLOCK_ROWS)
    n_pad = v_pad.shape[1]
    c = n_pad // BLOCK_ROWS
    flat_wb = _flatten_layers(layers)

    wb_specs = []
    for arr in flat_wb:
        wb_specs.append(
            pl.BlockSpec(arr.shape, lambda li, ci: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    marg, vals, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n_valid=n_valid, num_layers=m),
        grid=(l, c),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_ROWS, d), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
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
    )(v_pad, *flat_wb)
    return (marg / n, vals[:, :n], idx[:, :n]), None


def _hpd_full_fwd(verts, layers, k, interpret):
    out, _ = _full_fwd_impl(verts, layers, k, interpret)
    _, _, idx = out
    return out, (verts, layers, idx)


def _hpd_full_bwd(k, interpret, residuals, cotangents):
    verts, layers, idx = residuals
    g_marg, g_vals, _ = cotangents
    l, n, d = verts.shape
    m = len(layers)
    t = layers[-1][0].shape[1]

    v_pad, n_valid = _pad_rows(verts, BLOCK_ROWS)
    n_pad = v_pad.shape[1]
    c = n_pad // BLOCK_ROWS
    pad = n_pad - n
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        g_vals = jnp.pad(g_vals, ((0, 0), (0, pad), (0, 0)))
    flat_wb = _flatten_layers(layers)
    g_marg_row = (g_marg / n).astype(jnp.float32)

    wb_specs = [
        pl.BlockSpec(arr.shape, lambda li, ci: (0, 0), memory_space=pltpu.VMEM)
        for arr in flat_wb
    ]
    grad_specs = list(wb_specs)  # same shapes, full revisited blocks
    grad_shapes = [
        jax.ShapeDtypeStruct(arr.shape, jnp.float32) for arr in flat_wb
    ]

    grads_flat = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n_valid=n_valid, num_layers=m),
        grid=(l, c),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_ROWS, d), lambda li, ci: (li, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
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
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(v_pad, *flat_wb, idx, g_vals, g_marg_row)

    d_layers = tuple(
        (grads_flat[2 * i], grads_flat[2 * i + 1].reshape(-1))
        for i in range(m)
    )
    return jnp.zeros_like(verts), d_layers


hpd_full.defvjp(_hpd_full_fwd, _hpd_full_bwd)
