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
import os

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


_BLEND_CHUNK_BUDGET = 1 << 24


# past this many U*T elements the blend switches from the fused-gather form
# to the chunked selection-matrix (S-matrix) form: at scaled tables the
# gather's (U, L, K, F) value (F=2 on lanes -> 64x tile padding) measured
# 8.06 GB of HBM temp — an OOM by itself — while S @ tables is MXU work on
# (R, T) chunks that never materializes anything K- or F-minor at full U
_BLEND_SMATRIX_MIN_ELEMENTS = 1 << 25


def _selection_matrix(idx_chunk, w_chunk, t, dtype):
    """S[r, t] = sum_k w[r, k] * 1[idx[r, k] == t] — K scatter-free compare
    passes (top-k ids are distinct per row, so this equals the K-blend)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    s = jnp.zeros((idx_chunk.shape[0], t), dtype)
    for ki in range(idx_chunk.shape[1]):
        hit = (idx_chunk[:, ki : ki + 1] == iota).astype(dtype)
        s = s + hit * w_chunk[:, ki : ki + 1]
    return s


@jax.custom_vjp
def _blend_core(tables, idx_unique, w):
    """gather + K-blend on unique vertices: (L,T,F) tables, (U,K) ids shared
    by every level, (U,K) blend weights -> (L,U,F)."""
    return _blend_core_impl(tables, idx_unique, w)


# large-regime blend backend: "gather" (default — row-gather + K-weighted
# sum + segment-sum table grad) or "smatrix" (the round-2 one-hot MXU form).
# v5e at the scaled shapes (evidence/hw_r3_ablate.log gather_probe): raw row
# gather 8.5 ms vs S-matrix fwd 30 ms (the (R, T) S chunks are matmul
# operands, so XLA materializes them through HBM at a measured ~272 GB/s
# write bandwidth); segment-sum dt 22.5 ms vs S-matrix bwd 51 ms.
BLEND_LARGE_BACKEND = "gather"

# table-gradient reduction inside the gather backend: "segment_sum" (XLA
# scatter-add) or "vmem_serial" (Pallas kernel holding the (T, L*F) = 2 MB
# accumulator VMEM-resident for the whole reduction —
# ops/pallas/scatter_probe.py; candidate from the r4 floor table's 22.5 ms
# segment-sum row). Both are deterministic; they accumulate in different
# orders, so flipping the backend changes fp32 trajectories within rounding
# (same class as a precision-mode change, not a semantics change).
# Env-overridable for A/B probes (BLEND_SCATTER_BACKEND=segment_sum|vmem_serial).
BLEND_SCATTER_BACKEND = os.environ.get(
    "BLEND_SCATTER_BACKEND", "segment_sum"
)
# interpret-mode twin for CPU tests of the pallas path
BLEND_SCATTER_INTERPRET = False


def _blend_core_impl(tables, idx_unique, w):
    l, t, f = tables.shape
    u, k = idx_unique.shape
    if u * t <= _BLEND_SMATRIX_MIN_ELEMENTS:
        idx_bcast = jnp.broadcast_to(idx_unique[:, None, :], (u, l, k))
        gathered = _flat_gather_impl(tables, idx_bcast)        # (U, L, K, F)
        return jnp.einsum("ulkf,uk->luf", gathered, w, precision="highest")
    if BLEND_LARGE_BACKEND == "gather":
        # out[l,u,f] = sum_k w[u,k] * tables[l, idx[u,k], f] via one row
        # gather of the (T, L*F) layout — L*F rides the minor axis so the
        # gathered value tiles densely (the (U, L, K, F) gather form pads
        # F=2 to the 128-lane tile, a 64x HBM blow-up)
        tables2 = tables.transpose(1, 0, 2).reshape(t, l * f)
        rows = jnp.take(tables2, idx_unique.reshape(-1), axis=0)
        rows = rows.reshape(u, k, l * f)
        out = jnp.sum(rows * w[:, :, None], axis=1)            # (U, LF)
        return out.reshape(u, l, f).transpose(1, 0, 2)
    # scaled tables: out[l,u,f] = sum_t S[u,t] * tables[l,t,f], S chunked
    chunk = max(256, min(u, _BLEND_CHUNK_BUDGET // max(t, 1)))
    pad = (-u) % chunk
    idx_p = jnp.pad(idx_unique, ((0, pad), (0, 0)), constant_values=0)
    w_p = jnp.pad(w, ((0, pad), (0, 0)))
    c = idx_p.shape[0] // chunk

    def body(_, xs):
        idx_chunk, w_chunk = xs
        s = _selection_matrix(idx_chunk, w_chunk, t, w.dtype)  # (R, T)
        out_chunk = jnp.einsum(
            "rt,ltf->lrf", s, tables, precision="highest"
        )
        return None, out_chunk

    _, out_chunks = jax.lax.scan(
        body, None,
        (idx_p.reshape(c, chunk, k), w_p.reshape(c, chunk, k)),
    )                                                          # (C, L, R, F)
    return jnp.moveaxis(out_chunks, 0, 1).reshape(l, c * chunk, f)[:, :u]


def _blend_core_fwd(tables, idx_unique, w):
    out = _blend_core_impl(tables, idx_unique, w)
    # Residuals deliberately EXCLUDE the gathered (U, L, K, F) features: with
    # F on lanes that residual tiles to (8, 128) with a 64x padding blow-up
    # (measured 8.06 GB of HBM temp at the scaled config — an OOM by itself).
    # The tables are a live parameter already; the backward recomputes what
    # it needs per chunk.
    return out, (tables, idx_unique, w)


def _blend_core_bwd(res, g):
    """Shared-index table gradient: the SAME (U, K) candidates feed every
    level, so one scatter-free S-matrix per row chunk (S[r, t] = sum_k
    1[idx=t] * w — K compare passes, no scatter, no explicit (R, T, K)
    one-hot) serves all levels through a single (L*F, R) @ (R, T) MXU
    contraction. The generic per-level one-hot VJP degrades to thousands of
    64-row scan steps at scaled tables (T=2^14, L=16) — measured ~700 ms per
    batch; this form is ~30 ms."""
    tables, idx, w = res                                       # g: (L, U, F)
    l, t, f = tables.shape
    u, k = idx.shape
    if (
        u * t > _BLEND_SMATRIX_MIN_ELEMENTS
        and BLEND_LARGE_BACKEND == "gather"
    ):
        # dt[t, lf] = sum_{(u,k): idx=t} w * g2[u]  (deterministic TPU
        # scatter-add); dw[u,k] = <tables2[idx[u,k]], g2[u]>
        tables2 = tables.transpose(1, 0, 2).reshape(t, l * f)
        g2 = g.transpose(1, 0, 2).reshape(u, l * f)
        rows = jnp.take(tables2, idx.reshape(-1), axis=0)
        dw = jnp.sum(
            rows.reshape(u, k, l * f) * g2[:, None, :], axis=-1
        )                                                      # (U, K)
        scaled = (w[:, :, None] * g2[:, None, :]).reshape(u * k, l * f)
        if BLEND_SCATTER_BACKEND == "vmem_serial":
            from ..ops.pallas.scatter_probe import scatter_add_vmem

            dt2 = scatter_add_vmem(
                scaled, idx.reshape(-1), t,
                interpret=BLEND_SCATTER_INTERPRET,
            )                                                  # (T, LF)
        else:
            dt2 = jax.ops.segment_sum(
                scaled, idx.reshape(-1), num_segments=t
            )                                                  # (T, LF)
        dt = dt2.reshape(t, l, f).transpose(1, 0, 2)
        return dt, None, dw
    chunk = max(256, min(u, _BLEND_CHUNK_BUDGET // max(t, 1)))
    pad = (-u) % chunk
    idx_p = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=0)
    w_p = jnp.pad(w, ((0, pad), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    c = idx_p.shape[0] // chunk
    idx_c = idx_p.reshape(c, chunk, k)
    w_c = w_p.reshape(c, chunk, k)
    g_c = jnp.moveaxis(g_p.reshape(l, c, chunk, f), 1, 0)      # (C, L, R, F)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)

    smatrix_form = u * t > _BLEND_SMATRIX_MIN_ELEMENTS

    def body(acc, xs):
        idx_chunk, w_chunk, g_chunk = xs
        s = _selection_matrix(idx_chunk, w_chunk, t, g.dtype)  # (R, T)
        acc = acc + jnp.einsum(
            "lrf,rt->ltf", g_chunk, s, precision="highest"
        )
        # d w per chunk — never materializes anything (U, ...)-shaped (the
        # whole-array gather form persisted a (U, L, K, F) value whose
        # F-on-lanes layout pads 64x: measured 8.06 GB of HBM temp at the
        # scaled config, an OOM by itself):
        if smatrix_form:
            # dw[r,k] = B[r, idx[r,k]] with B = sum_{l,f} tables*g (MXU),
            # extracted by K compare passes (no gather)
            bmat = jnp.einsum(
                "ltf,lrf->rt", tables, g_chunk, precision="highest"
            )
            dw_chunk = jnp.stack(
                [
                    jnp.sum(
                        jnp.where(
                            idx_chunk[:, ki : ki + 1] == iota, bmat, 0.0
                        ),
                        axis=-1,
                    )
                    for ki in range(k)
                ],
                axis=-1,
            )
        else:
            gath = _flat_gather_impl(
                tables,
                jnp.broadcast_to(idx_chunk[:, None, :], (chunk, l, k)),
            )                                                  # (R, L, K, F)
            dw_chunk = jnp.einsum(
                "rlkf,lrf->rk", gath, g_chunk, precision="highest"
            )
        return acc, dw_chunk

    dt, dw_chunks = jax.lax.scan(
        body, jnp.zeros((l, t, f), g.dtype), (idx_c, w_c, g_c)
    )
    dw = dw_chunks.reshape(c * chunk, k)[:u]
    return dt, None, dw


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


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
    that pixels then gather from (gather_rows). The blend-weight jacobian
    (softmax / weighted-avg / raw modes) flows through autodiff; the
    gather+contract core carries the shared-index custom VJP
    (_blend_core_bwd).

    Args:
      idx_unique:  (U, K) slot ids per unique vertex.
      vals_unique: (U, K) selected probabilities (straight-through gradient).

    Returns:
      (L, U, F) blended per-vertex features.
    """
    w = blend_weights(vals_unique, cfg)                        # (U, K)
    return _blend_core(tables, idx_unique, w)


@jax.custom_vjp
def _gather_rows_rev(per_level_table, ids, rev, local_maps):
    return _flat_gather_impl(per_level_table, ids)


def _gather_rows_rev_fwd(per_level_table, ids, rev, local_maps):
    out = _flat_gather_impl(per_level_table, ids)
    return out, (per_level_table.shape, rev, local_maps)


def _gather_rows_rev_bwd(res, g):
    (l, u, f), rev, local_maps = res
    # (P, L, V, F) -> per-level (N, F) flat rows (N = P * V, row = p * V + v)
    g_levels = jnp.moveaxis(g, 1, 0).reshape(l, -1, f)
    dt_levels = []
    for li in range(l):
        rows = rev[li]                                       # (U_l, M_l)
        gl = g_levels[li]
        gathered = jnp.take(gl, jnp.clip(rows, 0), axis=0)   # (U_l, M_l, F)
        mask = (rows >= 0).astype(gl.dtype)[..., None]
        summed = jnp.sum(gathered * mask, axis=1)            # (U_l, F)
        local, valid = local_maps[li]                        # (U,), (U,)
        dt_levels.append(
            jnp.where(
                valid[:, None], jnp.take(summed, local, axis=0), 0.0
            )
        )
    return jnp.stack(dt_levels), None, None, None


_gather_rows_rev.defvjp(_gather_rows_rev_fwd, _gather_rows_rev_bwd)


_CELL_CHUNK_BUDGET = 1 << 23


def _cells_fwd_impl(per_level_table, ids, n_ls, side):
    """Cell-table forward: gather (P, L) 2x2-patch rows instead of
    (P, L, V) single-vertex rows.

    TPU gathers are row-granular and crawl on 8-byte (F=2 fp32) rows
    (~1.5 GB/s effective, measured); a pixel's V=4 corners are one 2x2 patch
    of the vertex grid, so pre-building a per-level (cells, V*F) table with
    four static slice-shifts makes each gathered row 4x wider and cuts the
    row count 4x. Values are identical to the per-vertex gather."""
    l, u, f = per_level_table.shape
    p, _, v = ids.shape
    parts, offs, cum = [], [], 0
    for li in range(l):
        c_l = int(n_ls[li]) + 1
        grid = per_level_table[li].reshape(side, side, f)
        patch = jnp.stack(
            [
                grid[oi : oi + c_l, oj : oj + c_l]
                for vi in range(v)
                for oi, oj in ((vi & 1, vi >> 1),)
            ],
            axis=2,
        )                                             # (c_l, c_l, V, F)
        parts.append(patch.reshape(c_l * c_l, v * f))
        offs.append(cum)
        cum += c_l * c_l
    flat = jnp.concatenate(parts, axis=0)             # (total_cells, V*F)
    base = ids[:, :, 0]                               # corner v=0 = cell base
    ci, cj = jnp.divmod(base, side)
    c_ls = jnp.asarray([int(n) + 1 for n in n_ls], jnp.int32)
    cell = ci * c_ls[None, :] + cj + jnp.asarray(offs, jnp.int32)[None, :]
    rows = jnp.take(flat, cell, axis=0)               # (P, L, V*F)
    return rows.reshape(p, l, v, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows_cells(per_level_table, ids, n_ls, side):
    # NOTE: the per-vertex _flat_gather_impl wins over _cells_fwd_impl inside
    # the full epoch program (13.9M vs 10.9M px/s measured end-to-end): XLA
    # fuses the narrow gather with the downstream blend/interp, which the
    # explicit cell-table construction defeats. _cells_fwd_impl kept above
    # for layout experiments.
    return _flat_gather_impl(per_level_table, ids)


def _gather_rows_cells_fwd(per_level_table, ids, n_ls, side):
    return (
        _flat_gather_impl(per_level_table, ids),
        (per_level_table.shape, ids),
    )


def _gather_rows_cells_bwd(n_ls, side, res, g):
    """Cell-structured exact segment-sum for the dedup per-pixel gather.

    A pixel's V=4 corner rows at level l share one CELL (corner v = cell +
    offset), so summing grads by vertex factorizes: (1) one-hot over the
    (n_l+1)^2 cells contracts the (P, V*F) grads on the MXU — 4x fewer rows
    and ~(U/cells_l)x narrower than a one-hot over vertices on the shared
    global grid; (2) each corner offset is a static shift of the resulting
    cell grid into the (n_l+2)^2 vertex grid. Exact up to summation order.

    (A gather-based reverse-map variant — build_reverse_maps_np — measures
    2.6x faster in isolation but 3x SLOWER inside the full epoch program on
    TPU: row-granular gathers schedule poorly inside the batch scan. Kept for
    reference behind gather_rows(rev=...).)"""
    (l, u, f), ids_arr = res
    p = g.shape[0]
    v = g.shape[2]
    gi_g, gj_g = jnp.divmod(jnp.arange(u, dtype=jnp.int32), side)
    dt_levels = []
    for li in range(l):
        n_l = int(n_ls[li])
        c_l = n_l + 1                                 # cell-grid side
        s_l = n_l + 2                                 # vertex-grid side
        # corner v=0 has offset (0,0): its global id IS the cell's base vertex
        base = ids_arr[:, li, 0]
        ci, cj = jnp.divmod(base, side)
        cell = ci * c_l + cj                          # (P,) local cell id
        gl = g[:, li].reshape(p, v * f)               # (P, V*F)
        s = _cell_segment_sum(cell, gl, c_l * c_l)
        s = s.reshape(c_l, c_l, v, f)
        # scatter the V corner contributions by static grid shifts
        acc = jnp.zeros((s_l, s_l, f), g.dtype)
        for vi in range(v):
            oi, oj = vi & 1, vi >> 1                  # corner order (0,0),
            acc = acc + jnp.pad(                      # (1,0),(0,1),(1,1) —
                s[:, :, vi],                          # ops/grid.py offsets
                ((oi, 1 - oi), (oj, 1 - oj), (0, 0)),
            )
        # local (s_l, s_l) vertex grid -> global (U,) shared-grid layout
        valid = (gi_g < s_l) & (gj_g < s_l)
        flat = acc.reshape(s_l * s_l, f)
        local = jnp.where(valid, gi_g * s_l + gj_g, 0)
        dt_levels.append(
            jnp.where(valid[:, None], jnp.take(flat, local, axis=0), 0.0)
        )
    return jnp.stack(dt_levels), None


_gather_rows_cells.defvjp(_gather_rows_cells_fwd, _gather_rows_cells_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gather_rows_cells_compact(per_level_table, ids_local, active, base,
                               n_ls, side):
    """Compact-table variant of _gather_rows_cells (active-vertex compaction,
    ops/dedup.py): the table holds only the batch's touched vertices, ids are
    indices into it, and the cell structure the backward needs comes from the
    per-row GLOBAL base ids + the active->global map."""
    return _flat_gather_impl(per_level_table, ids_local)


def _gather_rows_cells_compact_fwd(per_level_table, ids_local, active, base,
                                   n_ls, side):
    return (
        _flat_gather_impl(per_level_table, ids_local),
        (per_level_table.shape, active, base),
    )


def _cell_segment_sum(cell, gl, num_cells):
    """Per-level segment-sum of (P, V*F) row grads by (P,) cell id.

    Two regimes: the chunked one-hot MXU contraction (cost ~ P * cells) wins
    when rows dominate, but at scaled fine levels rows << cells (57K pixel
    rows vs 263K cells at n_l=512) and the one-hot materializes a
    (chunk, cells) fp32 operand per scan step (~270 MB at the finest level)
    — there a plain scatter-add (cost ~ rows; TPU scatters execute
    sequentially, so it is deterministic) is the cheaper transpose. Scatter
    cost is ~7.5 ns/row (ops/collisions.py measurement: ~30 ms per 4M rows),
    so past a one-hot operand of (chunk, 32K) the scatter wins regardless of
    the row count; the flagship's small grids (<= 33^2 cells) stay on the
    MXU one-hot, which measures faster there."""
    p, vf = gl.shape
    if p < num_cells // 4 or num_cells > 32768:
        return jnp.zeros((num_cells, vf), gl.dtype).at[cell].add(gl)
    chunk = max(256, min(p, _CELL_CHUNK_BUDGET // max(num_cells, 1)))
    pad = (-p) % chunk
    cell_pad = jnp.pad(cell, (0, pad), constant_values=-1)
    gl_pad = jnp.pad(gl, ((0, pad), (0, 0)))
    c = cell_pad.shape[0] // chunk
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, num_cells), 1)

    def body(acc, xs):
        cell_chunk, g_chunk = xs
        onehot = (cell_chunk[:, None] == cols).astype(g_chunk.dtype)
        return acc + jnp.einsum(
            "rc,rk->ck", onehot, g_chunk, precision="highest"
        ), None

    s, _ = jax.lax.scan(
        body,
        jnp.zeros((num_cells, vf), gl.dtype),
        (cell_pad.reshape(c, chunk), gl_pad.reshape(c, chunk, vf)),
    )
    return s


def _cells_compact_grad(n_ls, side, active, base, g):
    """Same cell-structured segment-sum as _gather_rows_cells_bwd — the
    per-level (s_l, s_l) vertex grid is built identically — but the final
    map lands on the COMPACT rows: each active global id (i, j) reads its
    level-local vertex cell, and -1 padding rows are masked to zero so the
    duplicate-of-row-0 padding never double-counts gradient. Shared by the
    per-vertex and cell-table compact gather VJPs (their forwards read the
    same values, so the cotangent contract is identical)."""
    l = g.shape[1]
    f = g.shape[3]
    p = g.shape[0]
    v = g.shape[2]
    ids_cl = jnp.clip(active, 0)
    gi_c, gj_c = jnp.divmod(ids_cl, side)                    # (U_c,)
    real = active >= 0
    dt_levels = []
    for li in range(l):
        n_l = int(n_ls[li])
        c_l = n_l + 1
        s_l = n_l + 2
        ci, cj = jnp.divmod(base[:, li], side)
        cell = ci * c_l + cj                                 # (P,)
        gl = g[:, li].reshape(p, v * f)
        s = _cell_segment_sum(cell, gl, c_l * c_l)
        s = s.reshape(c_l, c_l, v, f)
        acc = jnp.zeros((s_l, s_l, f), g.dtype)
        for vi in range(v):
            oi, oj = vi & 1, vi >> 1
            acc = acc + jnp.pad(
                s[:, :, vi], ((oi, 1 - oi), (oj, 1 - oj), (0, 0))
            )
        valid = real & (gi_c < s_l) & (gj_c < s_l)
        flat = acc.reshape(s_l * s_l, f)
        local = jnp.where(valid, gi_c * s_l + gj_c, 0)
        dt_levels.append(
            jnp.where(valid[:, None], jnp.take(flat, local, axis=0), 0.0)
        )
    return jnp.stack(dt_levels)


def _gather_rows_cells_compact_bwd(n_ls, side, res, g):
    _shape, active, base = res
    return _cells_compact_grad(n_ls, side, active, base, g), None, None, None


_gather_rows_cells_compact.defvjp(
    _gather_rows_cells_compact_fwd, _gather_rows_cells_compact_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gather_cells_table_compact(per_level_table, pixel_cell, cell_corners,
                                active, base, n_ls, side):
    """Cell-TABLE per-pixel gather (ModelConfig.dedup_cell_gather): build a
    per-level (C_l, V*F) compact cell table (one narrow gather over the
    touched cells), then fetch each (pixel, level)'s whole 2x2 patch as ONE
    wide row — 4x fewer per-pixel gather rows than the per-vertex form, same
    values. The backward is the shared cell-structured compact segment-sum
    (_cells_compact_grad)."""
    return _gather_cells_table_impl(per_level_table, pixel_cell, cell_corners)


def _gather_cells_table_impl(per_level_table, pixel_cell, cell_corners):
    l, u_c, f = per_level_table.shape
    p = pixel_cell.shape[0]
    parts = []
    for li in range(l):
        corners = cell_corners[li]                       # (C_l, V)
        c_l, v = corners.shape
        cell_vals = jnp.take(
            per_level_table[li], corners.reshape(-1), axis=0
        ).reshape(c_l, v * f)                            # (C_l, V*F)
        rows = jnp.take(cell_vals, pixel_cell[:, li], axis=0)   # (P, V*F)
        parts.append(rows.reshape(p, v, f))
    return jnp.stack(parts, axis=1)                      # (P, L, V, F)


def _gather_cells_table_compact_fwd(per_level_table, pixel_cell, cell_corners,
                                    active, base, n_ls, side):
    return (
        _gather_cells_table_impl(per_level_table, pixel_cell, cell_corners),
        (active, base),
    )


def _gather_cells_table_compact_bwd(n_ls, side, res, g):
    active, base = res
    return (
        _cells_compact_grad(n_ls, side, active, base, g),
        None, None, None, None,
    )


_gather_cells_table_compact.defvjp(
    _gather_cells_table_compact_fwd, _gather_cells_table_compact_bwd
)


def gather_rows(
    per_level_table: jnp.ndarray,
    ids: jnp.ndarray,
    rev=None,
    local_maps=None,
    cell_info=None,
    active=None,
    base=None,
    cell_corners=None,
    pixel_cell=None,
) -> jnp.ndarray:
    """Per-pixel gather from a (L, U, F) per-vertex feature table.

    ids: (P, L, V) unique-vertex ids -> (P, L, V, F) features. Under
    active-vertex compaction (ops/dedup.py) the table holds only the batch's
    touched vertices, ids index into it, and ``active``/``base`` supply the
    global-grid structure the cell backward needs.

    The transpose of this gather is the segment-sum of per-row cotangents by
    vertex — the step that makes vertex dedup gradient-exact. Backwards, by
    preference:

    * cell_info=(n_ls tuple, side) (2-D, V=4): the cell-structured one-hot
      backward (_gather_rows_cells_bwd) — ~10x less HBM traffic than the
      global one-hot; no precomputed data needed.
    * rev/local_maps (ops/dedup.py build_reverse_maps_np): reverse-map
      gather+sum — fastest in isolation but schedules poorly inside the
      full epoch program (measured); kept for experimentation.
    * fallback: the chunked one-hot matmul VJP of the fused flat gather —
      correct everywhere but streams a (L, R, U) one-hot per chunk
      (~GBs/batch at the default config).
    """
    if cell_info is not None and ids.ndim == 3 and ids.shape[-1] == 4:
        n_ls, side = cell_info
        if active is not None and cell_corners is not None:
            return _gather_cells_table_compact(
                per_level_table, pixel_cell, cell_corners, active, base,
                tuple(n_ls), int(side),
            )
        if active is not None:
            return _gather_rows_cells_compact(
                per_level_table, ids, active, base, tuple(n_ls), int(side)
            )
        return _gather_rows_cells(per_level_table, ids, tuple(n_ls), int(side))
    if rev is None:
        return _flat_gather(per_level_table, ids)
    return _gather_rows_rev(per_level_table, ids, rev, local_maps)


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
