"""GeneralNeuralGaugeFields — the composite neural-field model.

TPU-native equivalent of reference ``GeneralNeuralGaugeFields``
(models.py:239-655). Pipeline (reference forward, models.py:394-484):

  coords (P, d) in [0,1]
    -> [optional BatchNorm1d, off by default]        (models.py:396-399)
    -> scale_to_grid: scaled (P,L,d), corners (P,L,V,d)   (models.py:403)
    -> GNGF: HPD probs + straight-through top-k      (models.py:416-423)
       | vanilla: XOR-prime fast hash                (models.py:412-414)
    -> table gather (+ top-k blend on the GNGF path) (models.py:447-455)
    -> bilinear interpolation -> (P, L*F)            (models.py:461)
    -> MLP decoder + sigmoid -> (P, 3|1)             (models.py:469-471)

Parameters are one pytree ``{"hpd", "tables", "mlp"[, "batchnorm"]}``; the
whole forward is pure and jit/pjit-able. Collision statistics are separate
pure functions (see ops/collisions.py) rather than host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig, TopkScatterMode
from ..ops import collisions as coll_ops
from ..ops import dedup as dedup_ops
from ..ops.grid import resolution_ladder, scale_to_grid, voxel_corner_offsets
from ..ops.hashing import fast_hash
from ..ops.interpolate import bilinear_coeffs, interpolate
from . import encoding as enc
from .hpd import apply_hpd, apply_hpd_fused, apply_hpd_unique, init_hpd
from .mlp import apply_mlp, init_mlp

BN_EPS = 1e-5       # torch BatchNorm1d defaults (reference models.py:340)
BN_MOMENTUM = 0.1


class GNGFStatics(NamedTuple):
    """Static (non-trained) geometry constants, kept as numpy so they embed as
    jit-time constants."""

    n_ls: np.ndarray       # (L,) int32 — reference models.py:311-317
    offsets: np.ndarray    # (V, d) int32 — reference models.py:321-334
    unique_coords: Optional[np.ndarray] = None
                           # (U, d) float32 — the shared integer vertex grid
                           # for the dedup path (ops/dedup.py); None when
                           # dedup is inapplicable to the config


class ForwardOut(NamedTuple):
    rgb: jnp.ndarray                       # (P, out_channels) sigmoid outputs
    probs: Optional[jnp.ndarray]           # dense loss probs: (P,L,V,T) full or
                                           # (P,L,V,K) if keep_topk_only; None on
                                           # the vanilla path (models.py:475-484)
                                           # and on the fused/dedup paths
    marginal: Optional[jnp.ndarray]        # (L, T) (or (L, K) under
                                           # keep_topk_only on the dedup path)
                                           # per-level marginal slot
                                           # distribution — the only thing the
                                           # JS/KL loss needs
    indices: jnp.ndarray                   # (P,L,V,K) GNGF | (P,L,V) vanilla
    topk_values: Optional[jnp.ndarray]     # (P,L,V,K) | None (dedup path)
    corners: jnp.ndarray                   # (P,L,V,d) grid-vertex coords
    bn_state: Optional[dict]               # updated running stats, if batchnorm
    idx_unique: Optional[jnp.ndarray] = None    # (U, K) dedup-path candidates
    dedup_counts: Optional[jnp.ndarray] = None  # (L, U) dedup-path row counts


def dedup_enabled(cfg: ModelConfig) -> bool:
    """Whether the unique-vertex dedup path applies (see ops/dedup.py): the
    GNGF path with statically-bounded vertex coords (no batchnorm). Small
    tables evaluate the (U, T) probabilities densely; scaled tables stream
    the fused tail over unique rows (models/hpd.py apply_hpd_unique)."""
    return (
        cfg.dedup_vertices
        and not cfg.use_hash_function
        and not cfg.batchnorm_input
    )


def make_statics(cfg: ModelConfig) -> GNGFStatics:
    return GNGFStatics(
        n_ls=resolution_ladder(cfg.n_min, cfg.n_max, cfg.num_levels),
        offsets=voxel_corner_offsets(cfg.input_dim),
        unique_coords=(
            dedup_ops.unique_vertex_coords(cfg.n_max, cfg.input_dim)
            if dedup_enabled(cfg)
            else None
        ),
    )


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    """Build the full parameter pytree. Split order is fixed so a given seed
    always produces the same model (reference seeds torch globally with 65535,
    functions.py:43-47)."""
    k_hpd, k_tab, k_mlp = jax.random.split(key, 3)
    params = {
        "tables": enc.init_tables(k_tab, cfg, dtype),
        "mlp": init_mlp(
            k_mlp,
            (cfg.encoded_dim, *cfg.mlp_hidden, cfg.out_channels),
            dtype,
        ),
    }
    if not cfg.use_hash_function:
        params["hpd"] = init_hpd(k_hpd, cfg, dtype)
    if cfg.batchnorm_input:
        params["batchnorm"] = {
            "scale": jnp.ones((cfg.input_dim,), dtype),
            "bias": jnp.zeros((cfg.input_dim,), dtype),
        }
    return params


def init_bn_state(cfg: ModelConfig, dtype=jnp.float32) -> Optional[dict]:
    if not cfg.batchnorm_input:
        return None
    return {
        "mean": jnp.zeros((cfg.input_dim,), dtype),
        "var": jnp.ones((cfg.input_dim,), dtype),
    }


def _batchnorm(
    params: dict, state: dict, x: jnp.ndarray, train: bool
) -> Tuple[jnp.ndarray, dict]:
    """Training-mode BatchNorm1d over (P, d) (reference models.py:340, 396-399)."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
    return y * params["scale"] + params["bias"], new_state


def forward(
    params: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    statics: GNGFStatics,
    bn_state: Optional[dict] = None,
    train: bool = True,
    dedup: Optional[dedup_ops.DedupGeometry] = None,
    need_indices: bool = True,
) -> ForwardOut:
    """Full model forward (reference models.py:394-484).

    dedup: optional precomputed per-batch vertex-dedup geometry (static for
    fixed batches — the trainer precomputes it host-side); when None and the
    dedup path applies, ids/counts are derived in-graph.
    need_indices=False (dedup path only) skips materializing the per-row
    (P, L, V, K) selected-slot tensor — it feeds histogram statistics, not
    training math, and costs ~15 MB of HBM writes per batch."""
    n_ls = jnp.asarray(statics.n_ls)
    offsets = jnp.asarray(statics.offsets)

    new_bn_state = bn_state
    if cfg.batchnorm_input:
        if bn_state is None:
            # inference callers (render_image/make_renderer) may not thread
            # running stats; fall back to the fresh-init stats rather than
            # dereferencing None
            bn_state = init_bn_state(cfg)
        x, new_bn_state = _batchnorm(params["batchnorm"], bn_state, x, train)

    scaled, corners = scale_to_grid(x, n_ls, offsets)
    # geometry is data, not a differentiation path (reference @torch.no_grad,
    # models.py:486); stop_gradient keeps autodiff from tracing through it
    scaled = jax.lax.stop_gradient(scaled)
    corners = jax.lax.stop_gradient(corners)

    marginal = None
    idx_unique = None
    dedup_counts = None
    # dedup must SAVE work: engage when the duplicated row count exceeds the
    # unique-vertex count (always true for real images; tiny render/test
    # tiles fall back to the per-row paths), or when precomputed geometry was
    # handed in
    use_dedup = (
        dedup_enabled(cfg)
        and statics.unique_coords is not None
        and (
            dedup is not None
            or x.shape[0] * cfg.num_corners * cfg.num_levels
            > statics.unique_coords.shape[0]
        )
    )
    if cfg.use_hash_function:
        indices = fast_hash(corners, cfg.hash_table_size)          # (P,L,V)
        feats = enc.lookup_vanilla(params["tables"], indices)      # (P,L,V,F)
        probs, topk_values = None, None
    elif use_dedup:
        # unique-vertex dedup (ops/dedup.py): the index network runs on the
        # (n_max+2)^d shared integer grid — count-weighted-gradient-identical
        # to the reference's per-row evaluation (models.py:416-423) at a
        # fraction of the work; pixels gather their vertices' blended features
        side = dedup_ops.grid_side(cfg.n_max)
        active = dedup.active if dedup is not None else None
        if active is not None:
            # active-vertex compaction (ops/dedup.py): evaluate only the
            # vertices this batch touches (~61% of the shared grid at the
            # scaled config) — exact: untouched vertices have zero counts and
            # no pixel gathers their features
            ucoords = dedup_ops.active_coords(active, side)
        else:
            ucoords = jnp.asarray(statics.unique_coords)
        u = ucoords.shape[0]
        if dedup is not None:
            ids, counts = dedup.ids, dedup.counts
        else:
            ids = dedup_ops.vertex_ids(corners, side)
            counts = (
                dedup_ops.counts_jnp(ids, cfg.num_levels, u) if train else None
            )
        marginal_raw, vals_u, idx_u = apply_hpd_unique(
            params["hpd"], ucoords, cfg, counts=counts
        )
        feats_u = enc.blend_unique(params["tables"], idx_u, vals_u, cfg)
        cell_info = None
        if cfg.input_dim == 2 and cfg.num_corners == 4:
            cell_info = (tuple(int(n) for n in statics.n_ls), side)
        feats = enc.gather_rows(
            feats_u, ids, cell_info=cell_info, active=active,
            base=dedup.base if dedup is not None else None,
            cell_corners=(
                dedup.cell_corners
                if dedup is not None and cfg.dedup_cell_gather
                else None
            ),
            pixel_cell=dedup.pixel_cell if dedup is not None else None,
        )                                                          # (P,L,V,F)
        if need_indices:
            indices = jnp.take(idx_u, ids, axis=0)                 # (P,L,V,K)
        else:
            indices = jnp.zeros((0,), jnp.int32)
        probs, topk_values = None, None
        if counts is not None:
            # per-level loss marginal (reference utils.py:138) as a single
            # counts-weighted reduction; under keep_topk_only the marginal
            # runs over the K selected values instead (functions.py:230)
            rows = x.shape[0] * cfg.num_corners
            if cfg.keep_topk_only:
                marginal = (
                    jnp.matmul(counts, vals_u, precision="highest") / rows
                )
            else:
                marginal = marginal_raw / rows
        idx_unique, dedup_counts = idx_u, counts
    else:
        # the NOOP straight-through quirk (reference models.py:31) zeroes the
        # top-k backward; the fused op implements the standard scatter, so
        # that parity-quirk config routes to the dense path
        use_fused = cfg.fused_hpd and cfg.topk_scatter is not TopkScatterMode.NOOP
        if use_fused:
            marginal, topk_values, topk_indices = apply_hpd_fused(
                params["hpd"], corners, cfg
            )
            probs = None
        else:
            probs, topk_values, topk_indices = apply_hpd(
                params["hpd"], corners, cfg
            )
        feats = enc.lookup_topk_blend(
            params["tables"], topk_indices, topk_values, cfg
        )
        indices = topk_indices

    coeffs = bilinear_coeffs(scaled, offsets)
    h = interpolate(feats, coeffs)                                 # (P, L*F)

    rgb = apply_mlp(
        params["mlp"],
        h,
        hidden_activation=cfg.hidden_activation.value,
        final_activation="sigmoid",
        precision=cfg.matmul_precision,
    )

    if cfg.use_hash_function:
        loss_probs, loss_marginal = None, None
    elif use_dedup:
        # the dedup path always emits the pre-reduced marginal (over T, or
        # over the K selected values under keep_topk_only)
        loss_probs, loss_marginal = None, marginal
    else:
        # keep_topk_only: the loss marginalizes the (small) top-k values
        # instead of the full distribution (reference models.py:475-484) —
        # identical on the fused and dense paths
        loss_probs = topk_values if cfg.keep_topk_only else probs
        loss_marginal = marginal if not cfg.keep_topk_only else None

    return ForwardOut(
        rgb=rgb,
        probs=loss_probs,
        marginal=loss_marginal,
        indices=indices,
        topk_values=topk_values,
        corners=corners,
        bn_state=new_bn_state,
        idx_unique=idx_unique,
        dedup_counts=dedup_counts,
    )


# ----------------------------- statistics ---------------------------------- #

def calc_hash_collisions(
    indices: jnp.ndarray, cfg: ModelConfig, statics: GNGFStatics
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(collisions, min_possible_collisions), both (L,) — reference
    models.py:568-619, fully on device."""
    n_ls = jnp.asarray(statics.n_ls)
    if cfg.use_hash_function:
        coll = coll_ops.hash_collisions_vanilla(indices, n_ls, cfg.hash_table_size)
    else:
        coll = coll_ops.hash_collisions_gngf(indices, n_ls, cfg.hash_table_size)
    min_poss = coll_ops.min_possible_collisions(n_ls, cfg.hash_table_size).astype(
        jnp.float32
    )
    return coll, min_poss


def calc_counts_per_level(
    indices: jnp.ndarray, corners: jnp.ndarray, cfg: ModelConfig, statics: GNGFStatics
) -> jnp.ndarray:
    """(L, T) slot-usage counts over unique grid cells — device-side analog of
    reference `_calc_counts_per_level` (models.py:530-566). GNGF callers pass
    the best (k=0) candidate ids like the reference (models.py:432-435)."""
    best = indices[..., 0] if not cfg.use_hash_function else indices
    return coll_ops.unique_cell_slot_counts(
        best, corners, jnp.asarray(statics.n_ls), cfg.hash_table_size
    )
