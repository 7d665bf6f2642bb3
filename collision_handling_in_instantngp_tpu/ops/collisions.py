"""Device-side collision counting and slot-usage statistics.

TPU-native reformulation of reference `calc_hash_collisions` (models.py:568-619)
and `_calc_counts_per_level` (models.py:530-566). The reference round-trips to
the host (``np.unique`` + ``collections.Counter``) in the middle of training;
here every statistic is a fixed-shape scatter-add (bincount) that stays on
device, is deterministic on TPU, and shards cleanly over the pixel axis (the
per-slot partial counts just psum).

Identities used:
  * #unique slot values used   == count_nonzero(bincount(idx, T))
  * total vertices at level l  == (n_l + 1)^2  (the reference writes this as
    ``4 + (n+1-2)*4 + (n+1-2)**2``, models.py:581)
  * collisions per level       == (n_l+1)^2 - #unique   (clamped >= 0)
  * min possible collisions    == max(0, (n_l+1)^2 - T)  (models.py:609-617)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def slot_counts(indices: jnp.ndarray, hash_table_size: int) -> jnp.ndarray:
    """Histogram of slot usage per level.

    Args:
      indices: (P, L, ...) int slot ids; all axes but L are flattened.
      hash_table_size: T.

    Returns:
      (L, T) int32 counts — the device-side equivalent of the host-side
      ``np.unique(level, return_counts=True)`` at reference functions.py:318-325.
    """
    l = indices.shape[1]
    per_level = jnp.moveaxis(indices, 1, 0).reshape(l, -1)          # (L, N)
    t = hash_table_size
    n = per_level.shape[1]
    chunk = max(1, min(_ONEHOT_CHUNK, (1 << 24) // max(l * t, 1)))
    pad = (-n) % chunk
    idx = jnp.pad(per_level.astype(jnp.int32), ((0, 0), (0, pad)),
                  constant_values=-1)
    c = idx.shape[1] // chunk
    chunks = jnp.moveaxis(idx.reshape(l, c, chunk), 1, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)

    def body(counts, idx_chunk):
        hits = jnp.sum(
            (idx_chunk[:, :, None] == cols).astype(jnp.int32), axis=1
        )
        return counts + hits, None

    counts, _ = jax.lax.scan(body, jnp.zeros((l, t), jnp.int32), chunks)
    return counts


_ONEHOT_CHUNK = 8192


def _presence_per_group(
    flat_indices: jnp.ndarray, hash_table_size: int
) -> jnp.ndarray:
    """(G, N) slot ids -> (G, T) bool presence masks.

    TPU note: scatter-adds serialize on TPU (~100 ms for the epoch-sized
    inputs here); an OR-reduction of chunked one-hot compares is pure
    vectorized VPU work and an order of magnitude faster. Memory is bounded
    by the (G, chunk, T) compare tile.
    """
    g, n = flat_indices.shape
    t = hash_table_size
    chunk = max(1, min(_ONEHOT_CHUNK, (1 << 24) // max(g * t, 1)))
    pad = (-n) % chunk
    idx = jnp.pad(flat_indices.astype(jnp.int32), ((0, 0), (0, pad)),
                  constant_values=-1)  # -1 matches no slot
    c = idx.shape[1] // chunk
    chunks = jnp.moveaxis(idx.reshape(g, c, chunk), 1, 0)  # (C, G, chunk)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)

    def body(presence, idx_chunk):
        hits = jnp.any(idx_chunk[:, :, None] == cols, axis=1)  # (G, T)
        return jnp.logical_or(presence, hits), None

    presence, _ = jax.lax.scan(
        body, jnp.zeros((g, t), dtype=bool), chunks
    )
    return presence


def _unique_counts_per_group(
    flat_indices: jnp.ndarray, num_groups: int, hash_table_size: int
) -> jnp.ndarray:
    """#distinct slot values per group. flat_indices: (G, N) -> (G,) int32."""
    del num_groups  # shape-derived
    presence = _presence_per_group(flat_indices, hash_table_size)
    return jnp.sum(presence.astype(jnp.int32), axis=1)


def min_possible_collisions(n_ls: jnp.ndarray, hash_table_size: int) -> jnp.ndarray:
    """max(0, (n_l+1)^2 - T) per level (reference models.py:609-617);
    [0, 0, 185, 833] for the default T=256, n_ls=[8,12,20,32]."""
    total_vertices = (n_ls.astype(jnp.int32) + 1) ** 2
    return jnp.maximum(total_vertices - hash_table_size, 0)


def hash_collisions_vanilla(
    indices: jnp.ndarray, n_ls: jnp.ndarray, hash_table_size: int
) -> jnp.ndarray:
    """Collisions for the spatial-hash path (reference models.py:574-585).

    Args:
      indices: (P, L, V) slot ids.
      n_ls: (L,) resolutions.

    Returns:
      (L,) float32 collisions = (n_l+1)^2 - #unique. NOTE: the reference does
      NOT clamp this branch (clamping happens only in the GNGF branch,
      models.py:607) — negative values are possible when P*V < #unique possible
      and are preserved for parity.
    """
    l = indices.shape[1]
    per_level = jnp.moveaxis(indices, 1, 0).reshape(l, -1)
    uniques = _unique_counts_per_group(per_level, l, hash_table_size)
    total_vertices = (n_ls.astype(jnp.int32) + 1) ** 2
    return (total_vertices - uniques).astype(jnp.float32)


def hash_collisions_gngf(
    indices_topk: jnp.ndarray, n_ls: jnp.ndarray, hash_table_size: int
) -> jnp.ndarray:
    """Collisions for the GNGF path (reference models.py:586-607).

    Per k-candidate, per level: (n_l+1)^2 - #unique slot ids over all (pixel,
    corner) pairs; then MEAN over k and clamp at zero.

    Args:
      indices_topk: (P, L, V, K) slot ids.

    Returns:
      (L,) float32 clamped mean collisions.

    Divergence from reference (documented, sane semantics): the reference
    computes this on a block-diagonally-initialized ``torch.empty`` buffer where
    each minibatch writes only its own (rows x k-block) slice, so most entries
    are uninitialized memory (reference functions.py:174-216). Here the counts
    use the actual top-k indices of every pixel. The term is constant w.r.t.
    parameters either way (no gradient, utils.py:108), so training dynamics are
    unaffected; only the logged collision metric becomes meaningful.
    """
    p, l, v, k = indices_topk.shape
    # (K, L, P*V) -> groups (K*L)
    per_kl = jnp.transpose(indices_topk, (3, 1, 0, 2)).reshape(k * l, p * v)
    uniques = _unique_counts_per_group(per_kl, k * l, hash_table_size)
    total_vertices = (n_ls.astype(jnp.int32) + 1) ** 2                   # (L,)
    coll = total_vertices[None, :] - uniques.reshape(k, l)               # (K, L)
    coll = jnp.mean(coll.astype(jnp.float32), axis=0)
    return jnp.maximum(coll, 0.0)


def unique_cell_slot_counts(
    best_indices: jnp.ndarray,
    corners: jnp.ndarray,
    n_ls: np.ndarray,
    hash_table_size: int,
) -> jnp.ndarray:
    """Slot-usage counts with duplicate pixels in the same grid cell removed.

    Device-side, sane reformulation of reference `_calc_counts_per_level`
    (models.py:530-566), which deduped cells with a host ``np.unique`` over the
    corner-coordinate tuples and then Counter'd slot ids (indexing a (P*V,)
    array with pixel-level indices — a reference indexing bug we do not copy).

    Here: per level, each pixel's cell key is its floor corner ``i*(n_l+1)+j``;
    a scatter-min elects one representative pixel per occupied cell, and the
    counts histogram its V corner slot ids.

    Args:
      best_indices: (P, L, V) slot ids (GNGF callers pass k=0 candidates,
        models.py:432-435; vanilla callers pass the hash ids).
      corners: (P, L, V, d) corner coords from ops.grid.scale_to_grid.
      n_ls: (L,) resolutions — NUMPY (static), so the cell-table size is a
        compile-time constant.

    Returns:
      (L, T) int32 counts.
    """
    n_ls = np.asarray(n_ls)
    p, l, v = best_indices.shape
    base = corners[:, :, 0, :].astype(jnp.int32)                  # (P, L, d) floor corner
    stride = jnp.asarray((n_ls.astype(np.int32) + 1)[None, :])    # cells per row
    cell_key = base[..., 0] * stride + base[..., 1]               # (P, L)
    max_cells = int((np.max(n_ls) + 1) ** 2) if n_ls.size else 0

    # representative pixel per (level, cell): scatter-min of pixel index
    level_off = (jnp.arange(l, dtype=jnp.int32) * max_cells)[None, :]
    flat_cell = (cell_key + level_off).reshape(-1)                # (P*L,)
    pix_ids = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[:, None], (p, l)
    ).reshape(-1)
    rep = (
        jnp.full(l * max_cells, p, dtype=jnp.int32).at[flat_cell].min(pix_ids)
    )                                                             # (L*max_cells,)
    rep = rep.reshape(l, max_cells)
    occupied = rep < p
    rep_safe = jnp.minimum(rep, p - 1)

    # gather the representative pixel's V slot ids per level and histogram them
    per_level_idx = jnp.moveaxis(best_indices, 1, 0)              # (L, P, V)
    rep_slots = jnp.take_along_axis(
        per_level_idx, rep_safe[:, :, None], axis=1
    )                                                             # (L, max_cells, V)
    t_off = (jnp.arange(l, dtype=jnp.int32) * hash_table_size)[:, None, None]
    flat_slots = (rep_slots.astype(jnp.int32) + t_off).reshape(-1)
    weights = jnp.broadcast_to(
        occupied[:, :, None], rep_slots.shape
    ).reshape(-1).astype(jnp.int32)
    counts = (
        jnp.zeros(l * hash_table_size, dtype=jnp.int32).at[flat_slots].add(weights)
    )
    return counts.reshape(l, hash_table_size)
