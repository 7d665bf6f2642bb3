"""Unique-vertex deduplication of the GNGF index network.

The TPU-first observation this module encodes: the HPD MLP's input is the raw
INTEGER grid-vertex coordinate pair (reference models.py:416-418 feeds the
(P, L, V, 2) corner coords straight into the index network, which is SHARED
across levels — no level feature enters the MLP). With coords normalized to
[0, 1] (reference main.py:50-51) every vertex of every level lives on the
integer grid ``{0..n_max+1}^d`` — at the default config that is 34^2 = 1,156
distinct points, while the reference (and a naive port) evaluates the MLP on
P*L*V = 918,464 duplicated rows per batch, >500x redundant work.

Evaluating the HPD (+ softmax + top-k + table blend) ONCE per unique vertex
and gathering per pixel is mathematically identical: duplicated rows produce
identical outputs, and the reverse-mode gradient of a gather is exactly the
count-weighted segment-sum of the per-row cotangents. The per-level loss
marginal ``sum_rows probs / (P*V)`` (reference utils.py:138) becomes a single
(L, U) @ (U, T) matmul against the static per-level vertex-occurrence counts.

The dedup geometry (vertex ids + counts) is static per batch — the reference
never re-shuffles pixels (main.py:56-58) — so the trainer precomputes it once
on the host (numpy) and the jitted epoch never recomputes it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class DedupGeometry(NamedTuple):
    """Static per-batch vertex deduplication tables.

    ids:    (..., L, V) int32 — global unique-grid id of every row's vertex
            (id = row * side + col on the shared {0..side-1}^2 integer grid),
            or, when ``active`` is set, the COMPACT index into ``active``.
    counts: (L, U) float32 — number of (pixel, corner) rows of each level that
            map to each unique vertex (U = U_c under compaction; padded
            entries carry zero counts). Feeds the loss marginal and the
            collision statistics.
    rev:    optional per-level tuple of (U_l, M_l) int32 REVERSE maps (-1 pad):
            for each LEVEL-LOCAL vertex id, the flat (p * V + v) row indices
            that land on it. Rows partition exactly (each row has one vertex
            per level), so the gather_rows backward becomes a masked gather +
            sum instead of a ~GB-scale one-hot contraction (see
            encoding.gather_rows). Level-local ids keep the padding ~10%
            ((n_l+2)^2 slots instead of the shared (n_max+2)^2 grid).
    active: optional (U_c,) int32 — ACTIVE-vertex compaction (scaled tables):
            the sorted global ids of the vertices this batch actually touches,
            padded with -1. A 1/3-image batch touches only ~61% of the shared
            (n_max+2)^2 grid at the scaled config; untouched vertices carry
            zero counts (no marginal contribution) and no pixel gathers their
            features, so skipping them is EXACT while every U-proportional
            stage (HPD hidden stack, select/marginal/backward kernel sweeps,
            table blend) shrinks by the same factor.
    base:   optional (..., L) int32 — GLOBAL id of each row's v=0 corner (the
            cell base vertex). Only needed under compaction: the cell-
            structured gather backward (encoding._gather_rows_cells_bwd)
            derives the cell from the global grid layout, which compact ids
            no longer encode.
    """

    ids: jnp.ndarray
    counts: jnp.ndarray
    rev: Optional[Tuple[jnp.ndarray, ...]] = None
    active: Optional[jnp.ndarray] = None
    base: Optional[jnp.ndarray] = None
    # cell-table gather (ModelConfig.dedup_cell_gather): per-level (C_l, V)
    # compact corner ids of each touched cell + (P, L) per-row cell indices
    cell_corners: Optional[Tuple[jnp.ndarray, ...]] = None
    pixel_cell: Optional[jnp.ndarray] = None


def grid_side(n_max: int) -> int:
    """Side of the shared integer vertex grid. ``floor(x * n_l)`` for
    x in [0, 1] reaches n_l, plus the +1 corner offset -> max coord n_l + 1,
    so the grid is {0 .. n_max+1} per dim."""
    return int(n_max) + 2


def num_unique(n_max: int, input_dim: int = 2) -> int:
    return grid_side(n_max) ** input_dim


def unique_vertex_coords(n_max: int, input_dim: int = 2) -> np.ndarray:
    """(U, d) float32 — every integer vertex of the shared grid, id-ordered
    (row-major), exactly the raw coords the reference feeds the HPD."""
    side = grid_side(n_max)
    axes = np.meshgrid(*([np.arange(side)] * input_dim), indexing="ij")
    return np.stack(axes, axis=-1).reshape(-1, input_dim).astype(np.float32)


def vertex_ids(corners: jnp.ndarray, side: int) -> jnp.ndarray:
    """(..., d) float integer-valued corner coords -> (...,) int32 global ids.

    Coords are clipped into the grid so out-of-range inputs (possible only for
    un-normalized or batchnormed coords, which disable the dedup path) can
    never produce out-of-bounds gathers."""
    c = jnp.clip(corners.astype(jnp.int32), 0, side - 1)
    ids = c[..., 0]
    for i in range(1, c.shape[-1]):
        ids = ids * side + c[..., i]
    return ids


def vertex_ids_np(corners: np.ndarray, side: int) -> np.ndarray:
    c = np.clip(corners.astype(np.int32), 0, side - 1)
    ids = c[..., 0]
    for i in range(1, c.shape[-1]):
        ids = ids * side + c[..., i]
    return ids.astype(np.int32)


def counts_np(ids: np.ndarray, num_levels: int, u: int) -> np.ndarray:
    """Host-side per-level occurrence counts: (..., L, V) ids -> (L, U) f32."""
    ids = np.moveaxis(ids, -2, 0).reshape(num_levels, -1)
    return np.stack(
        [np.bincount(ids[l], minlength=u).astype(np.float32)
         for l in range(num_levels)]
    )


_COUNT_CHUNK = 4096


def counts_jnp(ids: jnp.ndarray, num_levels: int, u: int) -> jnp.ndarray:
    """In-jit fallback of :func:`counts_np` (generic forward callers without
    precomputed geometry). Chunked one-hot sum — scatter-free (TPU scatters
    serialize; see ops/collisions.py)."""
    ids = jnp.moveaxis(ids, -2, 0).reshape(num_levels, -1)
    n = ids.shape[1]
    chunk = max(1, min(_COUNT_CHUNK, (1 << 24) // max(num_levels * u, 1)))
    pad = (-n) % chunk
    idx = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    c = idx.shape[1] // chunk
    chunks = jnp.moveaxis(idx.reshape(num_levels, c, chunk), 1, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, u), 2)

    def body(acc, idx_chunk):
        hits = jnp.sum(
            (idx_chunk[:, :, None] == cols).astype(jnp.float32), axis=1
        )
        return acc + hits, None

    counts, _ = jax.lax.scan(
        body, jnp.zeros((num_levels, u), jnp.float32), chunks
    )
    return counts


def build_geometry_np(
    coords: np.ndarray, n_ls: np.ndarray, offsets: np.ndarray, n_max: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (ids, counts) for a batch of normalized coords.

    Float math is done in float32 to bit-match the on-device
    ops.grid.scale_to_grid floor."""
    x = coords.astype(np.float32)
    scaled = x[:, None, :] * n_ls[None, :, None].astype(np.float32)
    corners = np.floor(scaled)[:, :, None, :] + offsets[None, None, :, :].astype(
        np.float32
    )
    side = grid_side(n_max)
    ids = vertex_ids_np(corners, side)                       # (P, L, V)
    counts = counts_np(ids, len(n_ls), side ** coords.shape[-1])
    return ids, counts


def compact_geometry_np(
    ids: np.ndarray, num_levels: int, u_c: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side ACTIVE-vertex compaction of one batch's dedup geometry.

    Args:
      ids: (P, L, V) int32 GLOBAL vertex ids (build_geometry_np).
      u_c: static compact row count (>= this batch's touched count; callers
        take the max over batches and round up so scan shapes stay static).

    Returns:
      active     (U_c,) int32 sorted touched global ids, -1 padded.
      ids_local  (P, L, V) int32 indices into ``active``.
      counts_c   (L, U_c) float32 per-level occurrence counts (0 on padding).
      base       (P, L) int32 global id of the v=0 corner (the cell base).
    """
    touched = np.unique(ids)
    if touched.size > u_c:
        raise ValueError(
            f"u_c={u_c} smaller than this batch's touched count {touched.size}"
        )
    active = np.full((u_c,), -1, dtype=np.int32)
    active[: touched.size] = touched
    ids_local = np.searchsorted(touched, ids).astype(np.int32)
    flat = np.moveaxis(ids_local, -2, 0).reshape(num_levels, -1)
    counts_c = np.stack(
        [np.bincount(flat[l], minlength=u_c).astype(np.float32)
         for l in range(num_levels)]
    )
    return active, ids_local, counts_c, ids[:, :, 0].astype(np.int32)


def cell_geometry_np(
    ids: np.ndarray, active: np.ndarray, side: int
) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
    """Host-side per-level CELL tables for the cell-table gather
    (ModelConfig.dedup_cell_gather) under active-vertex compaction.

    A (pixel, level)'s V=4 corners are one 2x2 patch whose base vertex is
    corner v=0; gathering the patch as ONE (V*F)-wide cell row quarters the
    row count of the per-pixel gather. Every corner of a pixel's cell is by
    construction in ``active``.

    Args:
      ids: (P, L, V) int32 GLOBAL vertex ids (build_geometry_np).
      active: (U_c,) int32 sorted touched ids, -1 padded
        (compact_geometry_np).

    Returns:
      corner_locals: per-level (C_l, V) int32 — COMPACT row ids of each
        touched cell's corners (cells sorted by base id).
      pixel_cell:    (P, L) int32 — each row's index into its level's cells.
    """
    p, num_levels, v = ids.shape
    touched = active[active >= 0]
    corner_locals, pixel_cols = [], []
    for li in range(num_levels):
        base = ids[:, li, 0]
        cells, pixel_idx = np.unique(base, return_inverse=True)
        ci, cj = np.divmod(cells, side)
        corners = np.stack(
            [
                (ci + (vi & 1)) * side + (cj + (vi >> 1))
                for vi in range(v)
            ],
            axis=-1,
        )                                               # (C_l, V) global ids
        corner_locals.append(
            np.searchsorted(touched, corners).astype(np.int32)
        )
        pixel_cols.append(pixel_idx.astype(np.int32))
    return tuple(corner_locals), np.stack(pixel_cols, axis=-1)


def active_coords(active: jnp.ndarray, side: int) -> jnp.ndarray:
    """(U_c,) global ids (-1 padded) -> (U_c, 2) float32 integer vertex
    coords, the compact analog of :func:`unique_vertex_coords` (padded rows
    map to (0, 0) — their counts are zero and nothing gathers them)."""
    ids = jnp.clip(active, 0)
    gi, gj = jnp.divmod(ids, side)
    return jnp.stack([gi, gj], axis=-1).astype(jnp.float32)


def local_sides(n_ls) -> Tuple[int, ...]:
    """Per-level local vertex-grid side: level l's corners live in
    {0 .. n_l+1}^d (floor(x*n_l) <= n_l, +1 corner offset)."""
    return tuple(int(n) + 2 for n in np.asarray(n_ls))


def local_of_global_np(n_ls, side: int):
    """Static per-level map from GLOBAL grid id to LEVEL-LOCAL id.

    Returns a tuple over levels of ((U,) int32 local id — clipped to 0 for
    out-of-level vertices, (U,) bool validity). Depends only on the
    resolution ladder, not on batch data."""
    u = side * side
    gi, gj = np.divmod(np.arange(u, dtype=np.int32), side)
    out = []
    for s_l in local_sides(n_ls):
        valid = (gi < s_l) & (gj < s_l)
        local = np.where(valid, gi * s_l + gj, 0).astype(np.int32)
        out.append((local, valid))
    return tuple(out)


def build_reverse_maps_np(ids: np.ndarray, n_ls, side: int):
    """Per-level reverse maps for the gather_rows backward.

    ids: (P, L, V) GLOBAL vertex ids. Returns a tuple over levels of
    (U_l, M_l) int32 arrays (-1 padded): row r = p * V + v appears exactly
    once in level l's map, at its LEVEL-LOCAL vertex id."""
    p, num_levels, v = ids.shape
    n = p * v
    sides_l = local_sides(n_ls)
    out = []
    for l in range(num_levels):
        gid = ids[:, l, :].reshape(n)
        gi, gj = np.divmod(gid, side)
        s_l = sides_l[l]
        local = gi * s_l + gj                       # always in range: the
        u_l = s_l * s_l                             # level's corners are < s_l
        counts = np.bincount(local, minlength=u_l)
        m_l = max(1, int(counts.max()))
        order = np.argsort(local, kind="stable").astype(np.int32)
        sorted_ids = local[order]
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(n) - starts[sorted_ids]
        rev = np.full((u_l, m_l), -1, dtype=np.int32)
        rev[sorted_ids, within] = order
        out.append(rev)
    return tuple(out)


# ------------------------- statistics on unique ids ------------------------- #

def used_slot_presence(
    idx_unique: jnp.ndarray, counts: jnp.ndarray, hash_table_size: int
) -> jnp.ndarray:
    """(L, K, T) bool: does any level-l-occupied vertex select slot t as its
    k-th candidate? The dedup form of the per-(k, level) used-slot sets that
    feed collision counting (reference models.py:586-607): a slot is "used" at
    (l, k) iff some vertex with count_{l,v} > 0 has idx_unique[v, k] == t.
    """
    u, k = idx_unique.shape
    # bf16 operands are exact for 0/1 indicators and the MXU accumulates in
    # fp32 — halves the (U, K, T) contraction's traffic at scaled tables
    onehot = (
        idx_unique[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, hash_table_size), 2)
    ).astype(jnp.bfloat16)                                   # (U, K, T)
    present = (counts > 0).astype(jnp.bfloat16)              # (L, U)
    hits = jnp.einsum(
        "lu,ukt->lkt", present, onehot,
        preferred_element_type=jnp.float32,
    )
    return hits > 0


def collisions_from_presence(
    presence: jnp.ndarray, n_ls: jnp.ndarray
) -> jnp.ndarray:
    """(L, K, T) used-slot presence -> (L,) clamped mean collisions, the
    reference formula (models.py:586-607): per (l, k) collisions =
    (n_l+1)^2 - #used, mean over k, clamp >= 0."""
    uniques = jnp.sum(presence.astype(jnp.float32), axis=-1)         # (L, K)
    total_vertices = ((n_ls.astype(jnp.int32) + 1) ** 2).astype(jnp.float32)
    coll = jnp.mean(total_vertices[:, None] - uniques, axis=1)
    return jnp.maximum(coll, 0.0)


def slot_counts_dedup(
    idx_unique: jnp.ndarray, counts: jnp.ndarray, hash_table_size: int
) -> jnp.ndarray:
    """(L, T) slot-usage histogram over all (pixel, corner, k) rows — the
    dedup form of ops.collisions.slot_counts: each unique vertex contributes
    its per-level row count to each of its K selected slots."""
    onehot_sum = jnp.sum(
        (
            idx_unique[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, hash_table_size), 2)
        ).astype(jnp.float32),
        axis=1,
    )                                                         # (U, T)
    hist = jnp.einsum("lu,ut->lt", counts, onehot_sum, precision="highest")
    return jnp.rint(hist).astype(jnp.int32)
