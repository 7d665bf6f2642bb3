"""Fused HPD hidden-stack kernel (the [d -> 32 -> 64 -> 128] ReLU MLP on
unique vertices).

XLA runs these tiny-contraction matmuls (K = 2/32/64) at ~30x their FLOP
cost at the scaled config — measured 12 ms forward per batch on v5e for
~1.7 GMAC of work, and the jax.checkpoint backward pays the stack twice more
(recompute + grad passes). This kernel fuses the whole stack per row block
with all weights VMEM-resident, and its backward recomputes the forward
in-kernel (no stored intermediates) and accumulates the tiny weight/bias
gradients into VMEM-resident outputs over the sequential row-block grid —
deterministic, no scatter.

The vertex coordinates are DATA (integer grid positions), so no dx is
produced — the VJP yields weight/bias gradients only (matching the jax path,
where ucoords enters as a constant).

Used by models/hpd.py apply_hpd_unique when the streaming Pallas tail is
active; parity vs the jax stack is pinned by tests/test_pallas_hidden.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hpd_stream import _kdot, _kdot_general, _kernel_precision

BLOCK_ROWS = 1024
# supported stack: every width a multiple of 8 after input padding, last
# width lane-tileable; weights stay fully VMEM-resident (tiny)
MAX_WIDTH = 512


def supports(widths: Sequence[int]) -> bool:
    """widths = (d, h1, ..., hn) of the HIDDEN stack (head excluded)."""
    return (
        len(widths) >= 2
        and all(w <= MAX_WIDTH for w in widths)
        and all(w % 8 == 0 for w in widths[1:])
    )


def _pad_input(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    d = x.shape[1]
    d_pad = max(8, -(-d // 8) * 8)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    return x, d_pad


def _fwd_kernel(x_ref, *refs, n_layers: int, precision: str):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    h_ref = refs[2 * n_layers]
    h = x_ref[:]
    for i in range(n_layers):
        h = jnp.maximum(_kdot(h, w_refs[i][:], precision) + b_refs[i][:], 0.0)
    h_ref[:] = h


def _bwd_kernel(x_ref, gh_ref, *refs, n_layers: int, precision: str):
    ci = pl.program_id(0)
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    dw_refs = refs[2 * n_layers : 3 * n_layers]
    db_refs = refs[3 * n_layers : 4 * n_layers]

    # recompute forward, keeping pre-activations (for the exact jax ReLU
    # gradient convention: lax.max routes the cotangent to the input when
    # pre >= 0) and post-activations (dW operands) — a few tiny VMEM values
    acts, pres = [x_ref[:]], []
    for i in range(n_layers):
        z = _kdot(acts[-1], w_refs[i][:], precision) + b_refs[i][:]
        pres.append(z)
        acts.append(jnp.maximum(z, 0.0))

    g = gh_ref[:]
    for i in reversed(range(n_layers)):
        g = jnp.where(pres[i] >= 0.0, g, 0.0)            # ReLU mask
        # dW_i = acts[i]^T @ g ; db_i = sum_rows g — same canonicalized
        # kernel precision as the forward recompute, so 'default'/'high'
        # gradients match the jax.checkpoint path's dtype semantics and
        # keep the bf16 MXU rate the mode is chosen for
        dw_c = _kdot_general(
            acts[i], g, (((0,), (0,)), ((), ())), precision
        )
        db_c = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(ci == 0)
        def _(i=i, dw_c=dw_c, db_c=db_c):
            dw_refs[i][:] = dw_c
            db_refs[i][:] = db_c

        @pl.when(ci != 0)
        def _(i=i, dw_c=dw_c, db_c=db_c):
            dw_refs[i][:] = dw_refs[i][:] + dw_c
            db_refs[i][:] = db_refs[i][:] + db_c

        if i > 0:
            # da = g @ W_i^T
            g = _kdot_general(
                g, w_refs[i][:], (((1,), (1,)), ((), ())), precision
            )


def _prep(x, layers):
    x_pad, d_pad = _pad_input(x)
    u = x.shape[0]
    u_pad = -(-u // BLOCK_ROWS) * BLOCK_ROWS
    x_pad = jnp.pad(x_pad, ((0, u_pad - u), (0, 0)))
    ws, bs = [], []
    for i, (w, b) in enumerate(layers):
        if i == 0 and w.shape[0] != d_pad:
            w = jnp.pad(w, ((0, d_pad - w.shape[0]), (0, 0)))
        ws.append(w)
        bs.append(b.reshape(1, -1))
    return x_pad, u_pad, ws, bs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hidden_stack_pallas(x, layers, precision: str = "highest",
                        interpret: bool = False):
    """x: (U, d) vertex coords; layers: tuple of (w, b) pairs (hidden stack
    only, head excluded) -> h (U, last_width). ReLU after every layer."""
    return _fwd_impl(x, layers, precision, interpret)


def _fwd_impl(x, layers, precision, interpret):
    precision = _kernel_precision(precision)
    n = len(layers)
    x_pad, u_pad, ws, bs = _prep(x, layers)
    out_w = ws[-1].shape[1]
    full = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda ci: (0, 0), memory_space=pltpu.VMEM
    )
    row = lambda width: pl.BlockSpec(
        (BLOCK_ROWS, width), lambda ci: (ci, 0), memory_space=pltpu.VMEM
    )
    h = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n, precision=precision),
        grid=(u_pad // BLOCK_ROWS,),
        in_specs=[row(x_pad.shape[1])]
        + [full(w.shape[0], w.shape[1]) for w in ws]
        + [full(1, b.shape[1]) for b in bs],
        out_specs=row(out_w),
        out_shape=jax.ShapeDtypeStruct((u_pad, out_w), jnp.float32),
        interpret=interpret,
    )(x_pad, *ws, *bs)
    return h[: x.shape[0]]


def _fwd_rule(x, layers, precision, interpret):
    return _fwd_impl(x, layers, precision, interpret), (x, layers)


def _bwd_rule(precision, interpret, res, gh):
    x, layers = res
    kprec = _kernel_precision(precision)
    n = len(layers)
    x_pad, u_pad, ws, bs = _prep(x, layers)
    gh_pad = jnp.pad(gh, ((0, u_pad - gh.shape[0]), (0, 0)))
    full = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda ci: (0, 0), memory_space=pltpu.VMEM
    )
    row = lambda width: pl.BlockSpec(
        (BLOCK_ROWS, width), lambda ci: (ci, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n, precision=kprec),
        grid=(u_pad // BLOCK_ROWS,),
        in_specs=[row(x_pad.shape[1]), row(gh_pad.shape[1])]
        + [full(w.shape[0], w.shape[1]) for w in ws]
        + [full(1, b.shape[1]) for b in bs],
        out_specs=[full(w.shape[0], w.shape[1]) for w in ws]
        + [full(1, b.shape[1]) for b in bs],
        out_shape=[
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws
        ]
        + [jax.ShapeDtypeStruct((1, b.shape[1]), jnp.float32) for b in bs],
        interpret=interpret,
    )(x_pad, gh_pad, *ws, *bs)
    dws, dbs = outs[:n], outs[n:]
    d = x.shape[1]
    grads = tuple(
        (
            dws[i][:d] if i == 0 else dws[i],
            dbs[i].reshape(-1),
        )
        for i in range(n)
    )
    # vertex coords are data (integer grid positions) — zero cotangent
    return jnp.zeros_like(x), grads


hidden_stack_pallas.defvjp(_fwd_rule, _bwd_rule)
