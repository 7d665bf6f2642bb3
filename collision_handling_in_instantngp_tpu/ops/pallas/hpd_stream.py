"""Pallas TPU kernels for the UNIQUE-vertex fused HPD tail at scaled table
widths (T past the single-tile kernels' 2048 cap — BASELINE config 4,
T=2^14+). See ops/fused_hpd.py:hpd_tail_unique for the op contract and
ops/dedup.py for why rows are unique grid vertices.

The jax streaming path (ops/fused_hpd.py:_unique_fwd_impl) is HBM-bound at
these shapes: each (R, T) logits/probs chunk makes several HBM round trips
between the matmul, the softmax, lax.top_k, and the marginal contraction
(measured on v5e: matmul 12 ms, +softmax 59 ms, +exact top_k 174 ms per
batch forward at T=2^14). These kernels keep every (R, TT) tile in VMEM.

Two kernels, both on grid (row-blocks C, T-tiles NT) — TPU grid iteration is
sequential and row-major, so per-row-block running state lives in scratch
across the inner T-tile sweep:

``select``   one (R, H) @ (H, TT) MXU tile per step; online max/sum-exp
             (flash-attention-style rescaling) plus a running exact top-k.
             Selection runs on RAW LOGITS — softmax is strictly monotonic
             per row, so top-k indices over probabilities equal top-k over
             logits (reference models.py:116 applies torch.topk to softmax
             output; same selection) — and the K probability values are
             normalized once at the sweep's end: exp(logit - m) / s.
             Also emits (m, s) per row, consumed by the marginal kernel
             (and reusable by a backward kernel).

``marginal`` recomputes each logits tile, forms p = exp(logit - m)/s, and
             accumulates the count-weighted per-level marginal
             m_l += counts_l @ p on the MXU into a VMEM-resident (L, T)
             block (constant index map -> deterministic sequential
             accumulation; SURVEY.md §7 "scatter-add determinism").

Exactness: identical math to the jax oracle up to summation order in the
online sum-exp (allclose; pinned by tests/test_pallas_hpd_stream.py). Tie
handling matches lax.top_k (lowest index wins): within a tile jnp.argmax
takes the first maximum, and the cross-tile merge concatenates the running
(earlier-tile, lower-index) candidates before the tile's, so jnp.argmax
again prefers them. The one divergence: two DISTINCT logits that round to
the SAME probability float tie under the oracle (index order) but compare
by logit here — degenerate at fp32, absent in practice.

VMEM at the default R=512, TT=2048, H=128: logits tile 4 MB + w tile 1 MB
+ h block 0.25 MB + scratch < 6 MB total, well under the ~16 MB budget.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512
LANE_TILE = 2048
# widest top-k the running-merge handles before the upstream jax fallback
MAX_K = 16


def supports(t: int, k: int) -> bool:
    """Shape gate: T must tile into full LANE_TILE-wide MXU passes and the
    2K-wide running merge must stay cheap (grid axis topk_k reaches 128 —
    those configs route to the jax backend upstream)."""
    return t % LANE_TILE == 0 and t >= LANE_TILE and 1 <= k <= MAX_K


def _pad_rows_2d(x: jnp.ndarray, block: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % block
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _kernel_precision(precision) -> str:
    """Canonicalize any form jax.lax accepts — string, Precision enum, or an
    (lhs, rhs) pair — to one of {'default', 'high', 'highest'}, so an enum
    caller can't slip an unhandled precision into the Mosaic lowering crash
    (hw_session_20260818_224639.log:28-46).

    Mosaic has no HIGH dot lowering; the kernels implement 'high' themselves
    as the same 3-pass bf16 hi/lo decomposition XLA uses (see _kdot) —
    measured 40.5 TF/s vs 24.5 TF/s for fp32 'highest' on v5e at the scaled
    dot shape (evidence/hw_r3_ablate.log mxu_probe v2)."""
    if precision is None:
        return "highest"
    import jax

    if isinstance(precision, (tuple, list)):
        # pallas dots take one precision; keep the more accurate side
        canon = max(
            (jax.lax.Precision(p) for p in precision),
            key=lambda p: p.value,
        )
    else:
        canon = jax.lax.Precision(precision)
    return {
        jax.lax.Precision.DEFAULT: "default",
        jax.lax.Precision.HIGH: "high",
        jax.lax.Precision.HIGHEST: "highest",
    }[canon]


def _kdot_general(a, b, dimension_numbers, precision):
    """In-kernel dot_general honoring 'high' via the 3-pass bf16 hi/lo
    decomposition (a = hi(a) + lo(a); a.b ~ hi.hi + hi.lo + lo.hi, each a
    1-pass bf16 MXU dot with fp32 accumulation — XLA's own HIGH algorithm,
    ~2^-22 relative error). DEFAULT/HIGHEST lower natively in Mosaic."""
    f = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    if precision != "high":
        return f(a, b, precision=precision)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    g = functools.partial(f, precision="default")
    return g(a_hi, b_hi) + g(a_hi, b_lo) + g(a_lo, b_hi)


def _kdot(a, b, precision):
    """Plain 2-D matmul form of :func:`_kdot_general`."""
    return _kdot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), precision
    )


def _select_kernel(
    h_ref, w_ref, b_ref,
    vals_ref, idx_ref, m_ref, s_ref,
    rv_scr, ri_scr, m_scr, s_scr,
    *, k: int, precision: str,
):
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    r, tt = h_ref.shape[0], w_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        rv_scr[:] = jnp.full_like(rv_scr, -jnp.inf)
        ri_scr[:] = jnp.zeros_like(ri_scr)

    logits = (
        _kdot(h_ref[:], w_ref[:], precision)
        + b_ref[:]
    )                                                          # (R, TT)

    # tile-local exact top-k on logits: K argmax/mask passes (first-index
    # ties); the first pass doubles as the online-softmax tile max
    col = jax.lax.broadcasted_iota(jnp.int32, (r, tt), 1)
    work = logits
    tvals, tidx = [], []
    for _ in range(k):
        am = jnp.argmax(work, axis=-1)                         # (R,)
        tvals.append(jnp.max(work, axis=-1))
        tidx.append(am.astype(jnp.int32) + j * tt)
        work = jnp.where(col == am[:, None], -jnp.inf, work)

    # online softmax statistics (rescale the running sum when the max moves)
    tile_max = tvals[0][:, None]                               # (R, 1)
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, tile_max)
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    m_scr[:] = m_new

    # merge tile candidates into the running top-k; running entries first so
    # argmax's first-maximum rule keeps lax.top_k's lowest-index tie order
    comb_v = jnp.concatenate([rv_scr[:]] + [v[:, None] for v in tvals], -1)
    comb_i = jnp.concatenate([ri_scr[:]] + [i[:, None] for i in tidx], -1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (r, 2 * k), 1)
    for kk in range(k):
        am = jnp.argmax(comb_v, axis=-1)
        hit = col2 == am[:, None]
        rv_scr[:, kk] = jnp.max(comb_v, axis=-1)
        ri_scr[:, kk] = jnp.sum(jnp.where(hit, comb_i, 0), axis=-1)
        comb_v = jnp.where(hit, -jnp.inf, comb_v)

    @pl.when(j == nt - 1)
    def _():
        # normalize only the K selected logits into probabilities
        vals_ref[:] = jnp.exp(rv_scr[:] - m_scr[:]) / s_scr[:]
        idx_ref[:] = ri_scr[:]
        m_ref[:] = m_scr[:]
        s_ref[:] = s_scr[:]


def hpd_stream_select(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, k: int,
    precision: str = "highest", interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """h: (U, H), w: (H, T), b: (T,) ->
    (vals (U, K), idx (U, K), m (U, 1), s (U, 1))."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    h_pad = _pad_rows_2d(h, BLOCK_ROWS)
    u_pad = h_pad.shape[0]
    c, nt = u_pad // BLOCK_ROWS, t // LANE_TILE

    vals, idx, m, s = pl.pallas_call(
        functools.partial(_select_kernel, k=k, precision=precision),
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, hd), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hd, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, k), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, k), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 1), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 1), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS, k), jnp.float32),
            pltpu.VMEM((BLOCK_ROWS, k), jnp.int32),
            pltpu.VMEM((BLOCK_ROWS, 1), jnp.float32),
            pltpu.VMEM((BLOCK_ROWS, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t))
    return vals[:u], idx[:u], m[:u], s[:u]


def _marginal_kernel(
    h_ref, w_ref, b_ref, cnt_ref, m_ref, s_ref, marg_ref,
    *, lane_tile: int, precision: str
):
    ci = pl.program_id(0)
    j = pl.program_id(1)
    logits = (
        _kdot(h_ref[:], w_ref[:], precision)
        + b_ref[:]
    )
    p = jnp.exp(logits - m_ref[:]) / s_ref[:]                  # (R, TT)
    contrib = _kdot(cnt_ref[:], p, precision)                                                          # (L, TT)

    @pl.when(ci == 0)
    def _():
        marg_ref[:, pl.ds(j * lane_tile, lane_tile)] = contrib

    @pl.when(ci != 0)
    def _():
        marg_ref[:, pl.ds(j * lane_tile, lane_tile)] = (
            marg_ref[:, pl.ds(j * lane_tile, lane_tile)] + contrib
        )


def hpd_stream_marginal(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, counts: jnp.ndarray,
    m: jnp.ndarray, s: jnp.ndarray, precision: str = "highest",
    interpret: bool = False,
) -> jnp.ndarray:
    """Count-weighted UNNORMALIZED marginal: (L, T) = counts (L, U) @ p.

    Padded rows (to the row-block multiple) carry zero counts, so they
    contribute nothing; L is padded to the sublane multiple and sliced."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    l = counts.shape[0]
    h_pad = _pad_rows_2d(h, BLOCK_ROWS)
    m_pad = _pad_rows_2d(m, BLOCK_ROWS)
    # padded rows get s=1 so p stays finite (their counts are zero — a zero
    # count times an inf/nan p would poison the MXU contraction)
    s_pad = jnp.where(_pad_rows_2d(s, BLOCK_ROWS) > 0, _pad_rows_2d(s, BLOCK_ROWS), 1.0)
    u_pad = h_pad.shape[0]
    l_pad = l + ((-l) % 8)
    counts_pad = jnp.pad(
        counts.astype(jnp.float32),
        ((0, l_pad - l), (0, u_pad - u)),
    )
    c, nt = u_pad // BLOCK_ROWS, t // LANE_TILE

    marg = pl.pallas_call(
        functools.partial(_marginal_kernel, lane_tile=LANE_TILE, precision=precision),
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, hd), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hd, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (l_pad, BLOCK_ROWS), lambda ci, j: (0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 1), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 1), lambda ci, j: (ci, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (l_pad, t), lambda ci, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((l_pad, t), jnp.float32),
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t), counts_pad, m_pad, s_pad)
    return marg[:l]


# --------------------------------------------------------------------------- #
# Fused single-sweep kernels                                                   #
# --------------------------------------------------------------------------- #
#
# The split kernels above recompute the (R, H) @ (H, T) logits matmul in every
# pass: select, marginal, B1 and B2 — 4x the fundamental FLOPs at fp32
# "highest" (the dominant per-batch cost at the scaled config). These fused
# variants cache the row block's full (R, T) logits (forward) / probabilities
# (backward) in a VMEM scratch: the grid collapses to row blocks only, each
# kernel sweeps the lane tiles twice in-kernel (statically unrolled), and the
# big matmul runs ONCE per row block per direction. The weight (H, T), bias
# and g_marg ride fully VMEM-resident (8 MB at H=128, T=2^14). Bitwise-
# equivalent or better than the split kernels (the marginal's p comes from
# the SAME cached f32 logits instead of a recompute).

# (R, T) fp32 cache per row block; R adapts to the table width
FUSED_CACHE_BYTES = 32 << 20
# full-resident (H, T) weight cap — past this the split kernels take over
FUSED_W_MAX_BYTES = 20 << 20


def _fused_rows(t: int) -> int:
    r = (FUSED_CACHE_BYTES // (4 * t)) // 8 * 8
    return int(max(8, min(512, r)))


def fused_supports(t: int, k: int, hd: int) -> bool:
    return (
        supports(t, k)
        and hd * t * 4 <= FUSED_W_MAX_BYTES
        and _fused_rows(t) >= 64
    )


# Per-tile top-k algorithm inside the fused forward sweep:
#   "argmax"  — K argmax/mask passes per lane tile (original form)
#   "colfold" — elementwise per-128-lane-column folds + one final lane phase
#               per ROW BLOCK. Bitwise-identical selection (identical
#               first-lowest-global-index tie rule, comparisons only — no
#               arithmetic on the selected values), but the hot loop has no
#               cross-lane reduction trees at all. Motivation: sweep_probe
#               measured the argmax variant's top-k+cache phase at 42-56
#               ms/batch at the scaled tail shape — ~4-5x the elementwise
#               cost of the same data (evidence/sweep_probe.json); the
#               per-(R,) lane-axis argmax/max trees are the pathology.
# Env-overridable for A/B probes (TOPK_SWEEP_VARIANT=argmax|colfold|auto).
# "auto" (default) picks colfold except at exact-fp32 'highest', where the
# sweep hides behind the slow native-fp32 dots and colfold's candidate
# scratch costs ~1% (A/B on v5e, hw_r5_queue.log 2026-08-20: 'highest'
# colfold 273.4K vs argmax 275.7K px/s; 'default' colfold 569.4K vs argmax
# 470.3K px/s — +21% where the bf16 dots expose the sweep).
TOPK_SWEEP_VARIANT = os.environ.get("TOPK_SWEEP_VARIANT", "auto")
# candidate scratch cap for colfold: nt*k*128 lanes of f32+i32 per block row
_COLFOLD_MAX_CAND_LANES = 8192


def _colfold_supported(t: int, k: int) -> bool:
    return (t // LANE_TILE) * k * 128 <= _COLFOLD_MAX_CAND_LANES


def _online_topk_sweep_colfold(
    h_ref, w_ref, b_ref, cache_scr, mh_scr, cv_scr, ci_scr,
    k, lane_tile, precision, r, t,
):
    """colfold sweep (see TOPK_SWEEP_VARIANT): per tile, k rounds of
    (elementwise max-fold over the lane_tile//128 sub-columns, first-index
    recovery, single-element mask) park per-column candidates in VMEM lane
    scratch; after all tiles, one k-pass lane phase picks the global top-k
    by (value, lowest global index) — exactly the argmax variant's tie rule.
    The online-softmax statistics and e-cache are byte-identical to the
    argmax variant (same exp/sum code)."""
    nt = t // lane_tile
    sub = lane_tile // 128
    m_run = jnp.full((r, 1), -jnp.inf, jnp.float32)
    s_run = jnp.zeros((r, 1), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    for j in range(nt):
        tile = pl.ds(j * lane_tile, lane_tile)
        logits = (
            _kdot(h_ref[:], w_ref[:, tile], precision)
            + b_ref[:, tile]
        )                                                      # (R, TT)
        work = [logits[:, 128 * s : 128 * (s + 1)] for s in range(sub)]
        tile_max = None
        for p in range(k):
            m = work[0]
            for s in range(1, sub):
                m = jnp.maximum(m, work[s])                    # (R, 128)
            # first (lowest) sub-column attaining m, per lane column
            ams = jnp.full((r, 128), sub, jnp.int32)
            for s in range(sub - 1, -1, -1):
                ams = jnp.where(work[s] == m, s, ams)
            # mask exactly the winning element of each column
            for s in range(sub):
                work[s] = jnp.where(ams == s, -jnp.inf, work[s])
            off = (j * k + p) * 128
            cv_scr[:, pl.ds(off, 128)] = m
            ci_scr[:, pl.ds(off, 128)] = (
                ams * 128 + lane + j * lane_tile
            )
            if p == 0:
                tile_max = jnp.max(m, axis=-1, keepdims=True)  # (R, 1)
        m_new = jnp.maximum(m_run, tile_max)
        e = jnp.exp(logits - m_new)                            # (R, TT)
        cache_scr[:, tile] = e
        mh_scr[:, j : j + 1] = m_new
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            e, axis=-1, keepdims=True
        )
        m_run = m_new
    # final lane phase: global top-k of the nt*k per-column candidates —
    # min-global-index tie rule reproduces argmax-first-occurrence exactly
    cv = cv_scr[:, : nt * k * 128]
    ci = ci_scr[:, : nt * k * 128]
    rv_cols, ri_cols = [], []
    for _ in range(k):
        m = jnp.max(cv, axis=-1)
        sel = jnp.min(jnp.where(cv == m[:, None], ci, t), axis=-1)
        rv_cols.append(m)
        ri_cols.append(sel)
        cv = jnp.where(ci == sel[:, None], -jnp.inf, cv)
    return m_run, s_run, jnp.stack(rv_cols, -1), jnp.stack(ri_cols, -1)


def _online_topk_sweep(h_ref, w_ref, b_ref, cache_scr, mh_scr, k, lane_tile,
                       precision, r, t):
    """Pass 1 shared by the fused forward: per lane tile, one MXU matmul,
    online max/sum-exp, and the running exact top-k merge — the same math as
    _select_kernel with the running state in registers (the tile loop is
    in-kernel, so no cross-step scratch is needed).

    The cache holds e_j = exp(logits - m_run_after_tile_j) (plus the per-tile
    m_run snapshots in mh_scr), not raw logits: the marginal pass then
    rescales each tile by the SCALAR exp(m_j - m_final) / s instead of
    re-running a full (R, TT) exp — and e_j is exactly the summand the online
    sum-exp needs anyway."""
    nt = t // lane_tile
    m_run = jnp.full((r, 1), -jnp.inf, jnp.float32)
    s_run = jnp.zeros((r, 1), jnp.float32)
    rv = jnp.full((r, k), -jnp.inf, jnp.float32)
    ri = jnp.zeros((r, k), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, lane_tile), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (r, 2 * k), 1)
    for j in range(nt):
        tile = pl.ds(j * lane_tile, lane_tile)
        logits = (
            _kdot(h_ref[:], w_ref[:, tile], precision)
            + b_ref[:, tile]
        )
        # first top-k pass doubles as the online-softmax tile max (one full
        # (R, TT) max reduction instead of two)
        work = logits
        tvals, tidx = [], []
        for _ in range(k):
            am = jnp.argmax(work, axis=-1)
            tvals.append(jnp.max(work, axis=-1))
            tidx.append(am.astype(jnp.int32) + j * lane_tile)
            work = jnp.where(col == am[:, None], -jnp.inf, work)

        tile_max = tvals[0][:, None]
        m_new = jnp.maximum(m_run, tile_max)
        e = jnp.exp(logits - m_new)                            # (R, TT)
        cache_scr[:, tile] = e
        mh_scr[:, j : j + 1] = m_new
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            e, axis=-1, keepdims=True
        )
        m_run = m_new
        comb_v = jnp.concatenate([rv] + [v[:, None] for v in tvals], -1)
        comb_i = jnp.concatenate([ri] + [i[:, None] for i in tidx], -1)
        rv_cols, ri_cols = [], []
        for _ in range(k):
            am = jnp.argmax(comb_v, axis=-1)
            hit = col2 == am[:, None]
            rv_cols.append(jnp.max(comb_v, axis=-1))
            ri_cols.append(jnp.sum(jnp.where(hit, comb_i, 0), axis=-1))
            comb_v = jnp.where(hit, -jnp.inf, comb_v)
        rv = jnp.stack(rv_cols, axis=-1)
        ri = jnp.stack(ri_cols, axis=-1)
    return m_run, s_run, rv, ri


def _fused_fwd_kernel(
    h_ref, w_ref, b_ref, cnt_ref,
    marg_ref, vals_ref, idx_ref, m_ref, s_ref,
    cache_scr, mh_scr, *topk_scr,
    k: int, lane_tile: int, need_marginal: bool, precision: str,
):
    ci = pl.program_id(0)
    r = h_ref.shape[0]
    t = w_ref.shape[1]
    if topk_scr:                                               # colfold
        cv_scr, ci_scr = topk_scr
        m_run, s_run, rv, ri = _online_topk_sweep_colfold(
            h_ref, w_ref, b_ref, cache_scr, mh_scr, cv_scr, ci_scr,
            k, lane_tile, precision, r, t,
        )
    else:
        m_run, s_run, rv, ri = _online_topk_sweep(
            h_ref, w_ref, b_ref, cache_scr, mh_scr, k, lane_tile, precision,
            r, t,
        )
    vals_ref[:] = jnp.exp(rv - m_run) / s_run
    idx_ref[:] = ri
    m_ref[:] = m_run
    s_ref[:] = s_run
    if need_marginal:
        for j in range(t // lane_tile):
            tile = pl.ds(j * lane_tile, lane_tile)
            # p = e_j * exp(m_j - m_final) / s — a per-row scalar rescale of
            # the cached tile instead of a fresh (R, TT) exp
            scale = jnp.exp(mh_scr[:, j : j + 1] - m_run) / s_run
            p = cache_scr[:, tile] * scale
            contrib = _kdot(cnt_ref[:], p, precision)

            @pl.when(ci == 0)
            def _():
                marg_ref[:, tile] = contrib

            @pl.when(ci != 0)
            def _():
                marg_ref[:, tile] = marg_ref[:, tile] + contrib


def hpd_stream_fused_fwd(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, counts: jnp.ndarray,
    k: int, precision: str = "highest", need_marginal: bool = True,
    interpret: bool = False,
):
    """One-matmul-per-row-block forward: returns
    (marginal_raw (L, T), vals (U, K), idx (U, K), m (U, 1), s (U, 1))."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    l = counts.shape[0]
    colfold = _colfold_supported(t, k) and (
        TOPK_SWEEP_VARIANT == "colfold"
        or (TOPK_SWEEP_VARIANT == "auto" and precision != "highest")
    )
    block = _fused_rows(t)
    h_pad = _pad_rows_2d(h, block)
    u_pad = h_pad.shape[0]
    l_pad = l + ((-l) % 8)
    counts_pad = jnp.pad(
        counts.astype(jnp.float32), ((0, l_pad - l), (0, u_pad - u))
    )
    c = u_pad // block
    row = lambda width: pl.BlockSpec(
        (block, width), lambda ci: (ci, 0), memory_space=pltpu.VMEM
    )
    full = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda ci: (0, 0), memory_space=pltpu.VMEM
    )
    marg, vals, idx, m, s = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel, k=k, lane_tile=LANE_TILE,
            need_marginal=need_marginal, precision=precision,
        ),
        grid=(c,),
        in_specs=[
            row(hd),
            full(hd, t),
            full(1, t),
            pl.BlockSpec(
                (l_pad, block), lambda ci: (0, ci), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            full(l_pad, t),
            row(k), row(k), row(1), row(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, t), jnp.float32),
            pltpu.VMEM((block, t // LANE_TILE), jnp.float32),
        ] + (
            [
                pltpu.VMEM(
                    (block, (t // LANE_TILE) * k * 128), jnp.float32
                ),
                pltpu.VMEM(
                    (block, (t // LANE_TILE) * k * 128), jnp.int32
                ),
            ]
            if colfold
            else []
        ),
        # e-cache (16M) + resident weight (8M at T=2^14) + marginal block +
        # double-buffered row blocks (+ colfold candidate lanes, ≤8M x2)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(96 if colfold else 72) * 1024 * 1024
        ),
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t), counts_pad)
    return marg[:l], vals[:u], idx[:u], m[:u], s[:u]


def _fused_bwd_kernel(
    h_ref, w_ref, b_ref, m_ref, s_ref, cntT_ref, gm_ref, idx_ref, gv_ref,
    vals_ref,
    dh_ref, dw_ref, db_ref,
    cache_scr,
    *, k: int, lane_tile: int, noop_topk: bool, precision: str,
):
    ci = pl.program_id(0)
    r = h_ref.shape[0]
    hd = h_ref.shape[1]
    t = w_ref.shape[1]
    l_pad = gm_ref.shape[0]
    nt = t // lane_tile

    # pass 1: recompute p from (m, s) residuals, cache it, accumulate the
    # per-row G[r, l] = <g_marg[l], p[r]> on the MXU
    g_rows = jnp.zeros((r, l_pad), jnp.float32)
    for j in range(nt):
        tile = pl.ds(j * lane_tile, lane_tile)
        logits = (
            _kdot(h_ref[:], w_ref[:, tile], precision)
            + b_ref[:, tile]
        )
        p = jnp.exp(logits - m_ref[:]) / s_ref[:]
        cache_scr[:, tile] = p
        # p (R, TT) x gm (L, TT) contracted over TT -> (R, L)
        g_rows = g_rows + _kdot_general(
            p, gm_ref[:, tile], (((1,), (1,)), ((), ())), precision
        )

    dot_r = jnp.sum(cntT_ref[:] * g_rows, axis=-1, keepdims=True)  # (R, 1)
    if not noop_topk:
        dot_r = dot_r + jnp.sum(
            gv_ref[:] * vals_ref[:], axis=-1, keepdims=True
        )

    # pass 2: dlogits from the cached p, emit dh / dw / db
    dh_acc = jnp.zeros((r, hd), jnp.float32)
    for j in range(nt):
        tile = pl.ds(j * lane_tile, lane_tile)
        p = cache_scr[:, tile]
        g_p = _kdot(cntT_ref[:], gm_ref[:, tile], precision)  # (R, TT)
        if not noop_topk:
            col = j * lane_tile + jax.lax.broadcasted_iota(
                jnp.int32, (r, lane_tile), 1
            )
            for ki in range(k):
                g_p = g_p + jnp.where(
                    col == idx_ref[:, ki][:, None],
                    gv_ref[:, ki][:, None], 0.0,
                )
        dl = p * (g_p - dot_r)                                 # (R, TT)
        # dl (R, TT) x w (H, TT) contracted over TT -> (R, H)
        dh_acc = dh_acc + _kdot_general(
            dl, w_ref[:, tile], (((1,), (1,)), ((), ())), precision
        )
        # h (R, H) x dl (R, TT) contracted over R -> (H, TT)
        dw_contrib = _kdot_general(h_ref[:], dl, (((0,), (0,)), ((), ())), precision)
        db_contrib = jnp.sum(dl, axis=0, keepdims=True)

        @pl.when(ci == 0)
        def _():
            dw_ref[:, tile] = dw_contrib
            db_ref[:, tile] = db_contrib

        @pl.when(ci != 0)
        def _():
            dw_ref[:, tile] = dw_ref[:, tile] + dw_contrib
            db_ref[:, tile] = db_ref[:, tile] + db_contrib

    dh_ref[:] = dh_acc


def hpd_stream_fused_bwd(
    h, w, b, counts, idx, vals, m, s, g_marg, g_vals, k,
    precision: str = "highest", noop_topk: bool = False,
    interpret: bool = False,
):
    """One-matmul-per-row-block backward (replaces the B1+B2 pair):
    returns (dh (U, H), dw (H, T), db (T,))."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    l = counts.shape[0]
    block = _fused_rows(t)
    h_pad = _pad_rows_2d(h, block)
    m_pad = _pad_rows_2d(m, block)
    s_raw = _pad_rows_2d(s, block)
    s_pad = jnp.where(s_raw > 0, s_raw, 1.0)
    idx_pad = _pad_rows_2d(idx, block)
    gv_pad = _pad_rows_2d(g_vals, block)
    vals_pad = _pad_rows_2d(vals, block)
    u_pad = h_pad.shape[0]
    l_pad = l + ((-l) % 8)
    countsT_pad = jnp.pad(
        counts.astype(jnp.float32).T, ((0, u_pad - u), (0, l_pad - l))
    )
    gm = jnp.pad(g_marg.astype(jnp.float32), ((0, l_pad - l), (0, 0)))
    c = u_pad // block
    row = lambda width: pl.BlockSpec(
        (block, width), lambda ci: (ci, 0), memory_space=pltpu.VMEM
    )
    full = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda ci: (0, 0), memory_space=pltpu.VMEM
    )
    dh, dw, db = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, k=k, lane_tile=LANE_TILE,
            noop_topk=noop_topk, precision=precision,
        ),
        grid=(c,),
        in_specs=[
            row(hd),
            full(hd, t),
            full(1, t),
            row(1), row(1),
            row(l_pad),
            full(l_pad, t),
            row(k), row(k), row(k),
        ],
        out_specs=[
            row(hd),
            full(hd, t),
            full(1, t),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, t), jnp.float32),
            jax.ShapeDtypeStruct((1, t), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block, t), jnp.float32)],
        # p cache (16M) + resident weight (8M) + resident dw accumulator (8M)
        # + g_marg (1M) + row blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=88 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        h_pad, w, b.reshape(1, t), m_pad, s_pad, countsT_pad, gm,
        idx_pad, gv_pad, vals_pad,
    )
    return dh[:u], dw, db.reshape(t)


def hpd_tail_unique_pallas_fwd(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, counts: jnp.ndarray,
    k: int, precision: str = "highest", need_marginal: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward of ops/fused_hpd.py:hpd_tail_unique on the TPU kernels:
    (marginal_raw (L, T), vals (U, K), idx (U, K)). The backward reuses the
    jax streaming VJP (identical residual contract: h, w, b, counts, idx)."""
    if fused_supports(w.shape[1], k, h.shape[1]):
        marg, vals, idx, _m, _s = hpd_stream_fused_fwd(
            h, w, b, counts, k, precision=precision,
            need_marginal=need_marginal, interpret=interpret,
        )
        if not need_marginal:
            marg = jnp.zeros((counts.shape[0], w.shape[1]), jnp.float32)
        return marg, vals, idx
    vals, idx, m, s = hpd_stream_select(
        h, w, b, k, precision=precision, interpret=interpret
    )
    if need_marginal:
        marg = hpd_stream_marginal(
            h, w, b, counts, m, s, precision=precision, interpret=interpret
        )
    else:
        marg = jnp.zeros((counts.shape[0], w.shape[1]), jnp.float32)
    return marg, vals, idx


# --------------------------------------------------------------------------- #
# Backward kernels                                                            #
# --------------------------------------------------------------------------- #
#
# Backward math (ops/fused_hpd.py:_unique_bwd, reference models.py:5-42 +
# utils.py:122-174 composition), per row r with p = exp(logits - m)/s:
#
#   g_p[r, :] = sum_l counts[l, r] * g_marg[l, :]  (+ top-k scatter of g_vals)
#   dot[r]    = <g_p[r], p[r]>
#             = sum_l counts[l, r] * G[r, l]  +  sum_k g_vals[r, k] * vals[r, k]
#     with G[r, l] = <g_marg[l], p[r]>   (and the second term dropped under
#     the reference's noop-scatter quirk, which also drops the scatter)
#   dlogits   = p * (g_p - dot)
#   dh = dlogits @ w^T ;  dw = h^T @ dlogits ;  db = sum_r dlogits
#
# The dot[r] needs the whole row before dlogits exists, so the backward is
# two sweeps: B1 accumulates G per row block (p @ g_marg^T tiles on the MXU),
# the (U,) dot closes in plain jnp from G/counts/vals, then B2 recomputes
# each p tile and emits dh (per-block scratch), dw/db (VMEM-resident
# (H, T)/(1, T) blocks with constant index maps — sequential deterministic
# accumulation). m/s come from the forward select kernel, so no extra
# max/sum-exp sweep is needed.

BWD_BLOCK_ROWS = 256


def _p_tile(h_ref, w_ref, b_ref, m_ref, s_ref, precision):
    logits = (
        _kdot(h_ref[:], w_ref[:], precision)
        + b_ref[:]
    )
    return jnp.exp(logits - m_ref[:]) / s_ref[:]


def _bwd_g_kernel(h_ref, w_ref, b_ref, m_ref, s_ref, gmT_ref, g_out_ref,
                  g_scr, *, precision):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        g_scr[:] = jnp.zeros_like(g_scr)

    p = _p_tile(h_ref, w_ref, b_ref, m_ref, s_ref, precision)
    g_scr[:] = g_scr[:] + _kdot(p, gmT_ref[:], precision)                                                          # (R, L_pad)

    @pl.when(j == nt - 1)
    def _():
        g_out_ref[:] = g_scr[:]


def _bwd_main_kernel(
    h_ref, w_ref, b_ref, m_ref, s_ref, cntT_ref, gm_ref, idx_ref, gv_ref,
    dot_ref, dh_ref, dw_ref, db_ref, dh_scr,
    *, k: int, lane_tile: int, noop_topk: bool, precision: str,
):
    ci = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    r = h_ref.shape[0]

    @pl.when(j == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    p = _p_tile(h_ref, w_ref, b_ref, m_ref, s_ref, precision)  # (R, TT)
    g_p = _kdot(
        cntT_ref[:], gm_ref[:, pl.ds(j * lane_tile, lane_tile)], precision
    )                                                          # (R, TT)
    if not noop_topk:
        col = j * lane_tile + jax.lax.broadcasted_iota(
            jnp.int32, (r, lane_tile), 1
        )
        for ki in range(k):
            g_p = g_p + jnp.where(
                col == idx_ref[:, ki][:, None], gv_ref[:, ki][:, None], 0.0
            )
    dl = p * (g_p - dot_ref[:])                                # (R, TT)

    dh_scr[:] = dh_scr[:] + _kdot(dl, w_ref[:].T, precision)
    dw_contrib = _kdot(h_ref[:].T, dl, precision)                                                          # (H, TT)
    db_contrib = jnp.sum(dl, axis=0, keepdims=True)            # (1, TT)

    tile = pl.ds(j * lane_tile, lane_tile)

    @pl.when(ci == 0)
    def _():
        dw_ref[:, tile] = dw_contrib
        db_ref[:, tile] = db_contrib

    @pl.when(ci != 0)
    def _():
        dw_ref[:, tile] = dw_ref[:, tile] + dw_contrib
        db_ref[:, tile] = db_ref[:, tile] + db_contrib

    @pl.when(j == nt - 1)
    def _():
        dh_ref[:] = dh_scr[:]


def hpd_tail_unique_pallas_bwd(
    h, w, b, counts, idx, vals, m, s, g_marg, g_vals, k,
    precision: str = "highest", noop_topk: bool = False,
    interpret: bool = False,
):
    """Returns (dh (U, H), dw (H, T), db (T,)) — see module docstring."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    l = counts.shape[0]
    block = BWD_BLOCK_ROWS
    h_pad = _pad_rows_2d(h, block)
    m_pad = _pad_rows_2d(m, block)
    s_raw = _pad_rows_2d(s, block)
    s_pad = jnp.where(s_raw > 0, s_raw, 1.0)   # padded rows: finite p
    idx_pad = _pad_rows_2d(idx, block)
    gv_pad = _pad_rows_2d(g_vals, block)
    u_pad = h_pad.shape[0]
    l_pad = l + ((-l) % 8)
    countsT_pad = jnp.pad(
        counts.astype(jnp.float32).T, ((0, u_pad - u), (0, l_pad - l))
    )                                                          # (U_pad, L_pad)
    gm = jnp.pad(g_marg.astype(jnp.float32), ((0, l_pad - l), (0, 0)))
    c, nt = u_pad // block, t // LANE_TILE

    row_spec = lambda width: pl.BlockSpec(
        (block, width), lambda ci, j: (ci, 0), memory_space=pltpu.VMEM
    )
    # B1: per-row G = p @ g_marg^T, accumulated across T tiles in scratch
    g_rows = pl.pallas_call(
        functools.partial(_bwd_g_kernel, precision=precision),
        grid=(c, nt),
        in_specs=[
            row_spec(hd),
            pl.BlockSpec(
                (hd, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            row_spec(1),
            row_spec(1),
            pl.BlockSpec(
                (LANE_TILE, l_pad), lambda ci, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=row_spec(l_pad),
        out_shape=jax.ShapeDtypeStruct((u_pad, l_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, l_pad), jnp.float32)],
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t), m_pad, s_pad, gm.T)

    # dot[r] closes in plain jnp (everything here is (U,)-thin)
    dot = jnp.sum(countsT_pad[:u, :l] * g_rows[:u, :l], axis=-1)
    if not noop_topk:
        dot = dot + jnp.sum(g_vals * vals, axis=-1)
    dot_pad = _pad_rows_2d(dot[:, None], block)                # (U_pad, 1)

    dh, dw, db = pl.pallas_call(
        functools.partial(
            _bwd_main_kernel, k=k, lane_tile=LANE_TILE,
            noop_topk=noop_topk, precision=precision,
        ),
        grid=(c, nt),
        in_specs=[
            row_spec(hd),
            pl.BlockSpec(
                (hd, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE_TILE), lambda ci, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            row_spec(1),
            row_spec(1),
            row_spec(l_pad),
            pl.BlockSpec(
                (l_pad, t), lambda ci, j: (0, 0), memory_space=pltpu.VMEM
            ),
            row_spec(k),
            row_spec(k),
            row_spec(1),
        ],
        out_specs=[
            row_spec(hd),
            pl.BlockSpec(
                (hd, t), lambda ci, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t), lambda ci, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, t), jnp.float32),
            jax.ShapeDtypeStruct((1, t), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block, hd), jnp.float32)],
        # the VMEM-resident (H, T) dw block plus double-buffered tiles sit
        # just past Mosaic's conservative 16M default scoped budget (measured
        # 21.2M); v5e VMEM accommodates it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=72 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        h_pad, w, b.reshape(1, t), m_pad, s_pad, countsT_pad, gm,
        idx_pad, gv_pad, dot_pad,
    )
    return dh[:u], dw, db.reshape(t)


# --------------------------------------------------------------------------- #
# Cost-decomposition probes (VERDICT r4 weak #6)                               #
# --------------------------------------------------------------------------- #
# The per-stage attribution's "tail VPU sweep ~23 ms" row was arithmetic
# (U*T*K compares at an assumed 4 T op/s), not a measurement. These probe
# variants run the REAL fused-forward kernel structure with later phases
# removed, so telescoped differences measure each phase in place:
#
#   dots     per lane tile: the (R, H) @ (H, TT) MXU matmul + a 1-pass sum
#            (the cheapest possible reduction that keeps the dot alive)
#   softmax  + online max / exp / sum-exp (no top-k, no e-cache write)
#   then hpd_stream_fused_fwd(need_marginal=False) adds the K-pass top-k
#   merge and the e-cache write, and need_marginal=True adds the marginal
#   accumulation — four rungs, three measured deltas.


def _fused_probe_kernel(h_ref, w_ref, b_ref, m_ref, s_ref, *,
                        lane_tile: int, precision: str, variant: str):
    r = h_ref.shape[0]
    t = w_ref.shape[1]
    nt = t // lane_tile
    if variant == "dots":
        acc = jnp.zeros((r, 1), jnp.float32)
        for j in range(nt):
            tile = pl.ds(j * lane_tile, lane_tile)
            logits = _kdot(h_ref[:], w_ref[:, tile], precision) + b_ref[:, tile]
            acc = acc + jnp.sum(logits, axis=-1, keepdims=True)
        m_ref[:] = acc
        s_ref[:] = acc
    else:  # online softmax (max + exp + sum-exp), the fused fwd's substrate
        m_run = jnp.full((r, 1), -jnp.inf, jnp.float32)
        s_run = jnp.zeros((r, 1), jnp.float32)
        for j in range(nt):
            tile = pl.ds(j * lane_tile, lane_tile)
            logits = _kdot(h_ref[:], w_ref[:, tile], precision) + b_ref[:, tile]
            m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1, keepdims=True))
            s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
                jnp.exp(logits - m_new), axis=-1, keepdims=True
            )
            m_run = m_new
        m_ref[:] = m_run
        s_ref[:] = s_run


def hpd_stream_fused_probe(
    h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    precision: str = "highest", variant: str = "softmax",
    interpret: bool = False,
):
    """(m, s) per row under the reduced kernel — see module comment above."""
    precision = _kernel_precision(precision)
    u, hd = h.shape
    t = w.shape[1]
    block = _fused_rows(t)
    h_pad = _pad_rows_2d(h, block)
    u_pad = h_pad.shape[0]
    c = u_pad // block
    row = lambda width: pl.BlockSpec(
        (block, width), lambda ci: (ci, 0), memory_space=pltpu.VMEM
    )
    full = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda ci: (0, 0), memory_space=pltpu.VMEM
    )
    m, s = pl.pallas_call(
        functools.partial(
            _fused_probe_kernel, lane_tile=LANE_TILE,
            precision=precision, variant=variant,
        ),
        grid=(c,),
        in_specs=[row(hd), full(hd, t), full(1, t)],
        out_specs=[row(1), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=72 * 1024 * 1024
        ),
        interpret=interpret,
    )(h_pad, w, b.reshape(1, t))
    return m[:u], s[:u]
