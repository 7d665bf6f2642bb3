"""The jitted training epoch.

TPU-native re-design of reference ``train_step`` (functions.py:139-355). The
reference runs a Python loop over minibatches with per-batch host sync
(``.item()``, ``.detach().cpu()``); here ONE jitted call executes the whole
epoch — a ``lax.scan`` over statically-shaped minibatches performing forward,
loss, backward, and the three-group Adam update — then assembles the full-image
prediction and the collision statistics on device. The host touches only the
final scalar metrics.

Batching follows the reference (functions.py:166, 183-194): the pixel set is
split into ``ceil(1/batch_fraction)`` fixed slices of a FIXED shuffle
permutation (built once, never re-shuffled). If the pixel count is not
divisible by the batch count, the tail batch is padded with the first pixels of
the permutation so shapes stay static, and the padded rows are MASKED out of
the MSE (per-batch ``valid`` counts) so each pixel carries exactly one unit of
gradient weight per epoch. The reference silently DROPS the remainder instead
(functions.py:187) — our form trains every pixel; divisible sizes, like all
three reference images, match exactly.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..models import gngf
from ..ops import collisions as coll_ops
from ..ops import dedup as dedup_ops
from .loss import compute_loss
from .optimizer import make_optimizer


class EpochBatches(NamedTuple):
    """Device-resident, pre-sliced epoch inputs (built once per run).

    ``num_pixels`` (the un-padded P) is NOT carried here — it is a static
    closure argument of the jitted epoch (see make_epoch_fn/make_jitted) so it
    never becomes a tracer."""

    x: jnp.ndarray            # (num_batches, B, d)
    y: jnp.ndarray            # (num_batches, B, C)
    valid: jnp.ndarray        # (num_batches,) int32 — count of non-padded
                              # leading rows per batch; the MSE masks the rest
                              # so duplicated tail pixels carry no extra
                              # gradient weight
    scatter_idx: jnp.ndarray  # (num_batches * B,) pixel index of each row
    gather_idx: jnp.ndarray   # (P,) row index of each pixel (inverse of
                              # scatter_idx) — image assembly uses a GATHER,
                              # which TPU executes far faster than the
                              # equivalent scatter
    og_image: jnp.ndarray     # (P, C) int32 original image, pixel order —
                              # lets PSNR/accuracy run on device (the reference
                              # ships the full image to the host every epoch,
                              # functions.py:332-335 + 690-694)
    dedup_ids: Optional[jnp.ndarray] = None     # (nb, B, L, V) int32 unique-
                              # vertex ids (ops/dedup.py) — static per batch,
                              # precomputed host-side; None disables precompute
                              # (the forward derives them in-graph instead)
    dedup_counts: Optional[jnp.ndarray] = None  # (nb, L, U) float32 per-level
                              # vertex occurrence counts (loss marginal +
                              # collision statistics)
    dedup_rev: Optional[Tuple[jnp.ndarray, ...]] = None
                              # per-level (nb, U_l, M_l) int32 reverse maps
                              # (-1 pad) for the gather_rows backward
                              # (ops/dedup.py build_reverse_maps_np)
    dedup_active: Optional[jnp.ndarray] = None  # (nb, U_c) int32 touched
                              # global vertex ids (-1 pad) — active-vertex
                              # compaction (ops/dedup.py compact_geometry_np);
                              # when set, dedup_ids hold COMPACT indices and
                              # dedup_counts are (nb, L, U_c)
    dedup_base: Optional[jnp.ndarray] = None    # (nb, B, L) int32 global v=0
                              # corner ids (cell bases) for the compact
                              # gather backward
    dedup_cell_corners: Optional[Tuple[jnp.ndarray, ...]] = None
                              # per-level (nb, C_l_pad, V) int32 compact
                              # corner ids of touched cells — cell-table
                              # gather (ModelConfig.dedup_cell_gather)
    dedup_pixel_cell: Optional[jnp.ndarray] = None  # (nb, B, L) int32 per-row
                              # cell indices for the cell-table gather


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    bn_state: Optional[dict]
    prev_collisions: jnp.ndarray      # (L,) float32 — feeds next epoch's loss
    prev_min_possible: jnp.ndarray    # (L,) float32 (constant after epoch 0)


class HyperParams(NamedTuple):
    """Per-config hyper-parameters carried as 0-d device arrays so the jitted
    epoch program is SHARED across grid-search configs.

    The reference's 48,000-config grid varies loss weights (l_mse, l_js_kl,
    l_collisions, gamma/epsilon) and two learning rates (HPD_lr, MLP_lr) —
    none of which change tensor shapes. Baked as Python constants they force
    one XLA compile per config; as dynamic scalars the whole grid collapses
    to the handful of SHAPE classes (topk_k x keep_topk_only), ~12 compiles
    for the full sweep (train/grid_search.py compile cache).

    Field names mirror LossConfig so the loss functions accept either."""

    gamma: jnp.ndarray
    epsilon: jnp.ndarray
    l_mse: jnp.ndarray
    l_js_kl: jnp.ndarray
    l_collisions: jnp.ndarray
    delta: jnp.ndarray
    hpd_lr: jnp.ndarray
    mlp_lr: jnp.ndarray
    # not a reference grid axis (params.py:37 fixes it at 1e-4), but dynamic
    # so scaled-table lr studies sweep it inside ONE vmapped ensemble program
    encoding_lr: jnp.ndarray

    @classmethod
    def from_exp(cls, exp: ExperimentConfig) -> "HyperParams":
        lcfg, ocfg = exp.loss, exp.optimizer
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            gamma=f(lcfg.gamma), epsilon=f(lcfg.epsilon), l_mse=f(lcfg.l_mse),
            l_js_kl=f(lcfg.l_js_kl), l_collisions=f(lcfg.l_collisions),
            delta=f(lcfg.delta), hpd_lr=f(ocfg.hpd_lr), mlp_lr=f(ocfg.mlp_lr),
            encoding_lr=f(ocfg.encoding_lr),
        )


class SpanMetrics(NamedTuple):
    """Per-epoch scalar metrics for a jitted multi-epoch span (leading axis =
    epochs in the span). The full-image prediction and slot indices are NOT
    stacked (they would be span x ~50 MB of HBM); the span fn returns only the
    LAST epoch's alongside these."""

    loss: jnp.ndarray                 # (S,)
    mse: jnp.ndarray                  # (S,)
    js_kl_per_level: jnp.ndarray      # (S, L)
    coll_loss_per_level: jnp.ndarray  # (S, L)
    collisions: jnp.ndarray           # (S, L)
    min_possible: jnp.ndarray         # (S, L)
    int_sq_err: jnp.ndarray           # (S,)
    match_count: jnp.ndarray          # (S,)


class EpochMetrics(NamedTuple):
    loss: jnp.ndarray                 # scalar, mean over batches (functions.py:288)
    mse: jnp.ndarray                  # scalar, mean over batches
    js_kl_per_level: jnp.ndarray      # (L,) mean over batches
    coll_loss_per_level: jnp.ndarray  # (L,) mean over batches
    collisions: jnp.ndarray           # (L,) this epoch's collision counts
    min_possible: jnp.ndarray         # (L,)
    image: jnp.ndarray                # (P, C) full-image prediction, pixel order
    int_sq_err: jnp.ndarray           # scalar: mean squared error of the
                                      # uint8-truncated image vs the original
                                      # (feeds PSNR, reference functions.py:134)
    match_count: jnp.ndarray          # scalar int: exactly-equal values
                                      # (feeds accuracy, functions.py:130)


def build_epoch_batches(
    coords: np.ndarray,
    targets: np.ndarray,
    batch_fraction: float,
    shuffled_indices: np.ndarray,
    og_image: Optional[np.ndarray] = None,
    model_cfg=None,
    statics: Optional[gngf.GNGFStatics] = None,
    compact_dedup: bool = True,
) -> EpochBatches:
    """Slice the (fixed) shuffled pixel stream into static minibatches.

    og_image: (P, C) or (h, w[, C]) integer original image for on-device
    PSNR/accuracy; defaults to round-tripping ``targets * 255``.
    model_cfg/statics: pass both to precompute the per-batch vertex-dedup
    geometry host-side (ids + counts are static because batches never
    re-shuffle); omitted -> the jitted forward derives them in-graph."""
    p = coords.shape[0]
    num_batches = int(np.ceil(1.0 / batch_fraction))
    b = int(np.ceil(p / num_batches))
    pad = num_batches * b - p
    perm = np.concatenate([shuffled_indices, shuffled_indices[:pad]])
    x = coords[perm].reshape(num_batches, b, -1)
    y = targets[perm].reshape(num_batches, b, -1)
    if og_image is None:
        og = np.rint(targets * 255).astype(np.int32)
    else:
        og = og_image.reshape(p, -1).astype(np.int32)
    inverse = np.zeros(p, dtype=np.int32)
    # rows are written in order; for padded duplicates the FIRST occurrence
    # wins (matches the scatter semantics where later writes would overwrite
    # with identical pixels)
    inverse[perm[::-1]] = np.arange(len(perm) - 1, -1, -1, dtype=np.int32)
    valid = np.full((num_batches,), b, dtype=np.int32)
    valid[-1] = b - pad

    dedup_ids = dedup_counts = dedup_rev = None
    dedup_active = dedup_base = None
    dedup_cell_corners = dedup_pixel_cell = None
    if (
        model_cfg is not None
        and statics is not None
        and gngf.dedup_enabled(model_cfg)
        and statics.unique_coords is not None
        # precompute only when dedup actually engages (rows > unique count)
        and b * model_cfg.num_corners * model_cfg.num_levels
        > statics.unique_coords.shape[0]
    ):
        ids_list, counts_list = [], []
        for bi in range(num_batches):
            ids_b, counts_b = dedup_ops.build_geometry_np(
                x[bi], statics.n_ls, statics.offsets, model_cfg.n_max
            )
            ids_list.append(ids_b)
            counts_list.append(counts_b)
        u = statics.unique_coords.shape[0]
        # active-vertex compaction: a sub-image batch touches only part of
        # the shared vertex grid (~61% at the scaled config's 1/3 batches);
        # compact every U-proportional stage to the touched rows when that
        # actually shrinks them (flagship-scale grids are fully touched).
        # U_c is shared across batches so the epoch scan stays statically
        # shaped; the kernels pad rows to their own block multiples
        # internally, so 256 here is just a friendly alignment.
        u_c = max(
            int(np.unique(ids_b).size)
            for ids_b in ids_list
        )
        u_c_pad = -(-u_c // 256) * 256
        if (
            compact_dedup
            # engage only when the saving is meaningful — the flagship's 1/3
            # batches touch ~89% of its tiny grid, where the compact
            # indirection isn't worth it; the scaled config touches ~61%
            and u_c_pad < 0.85 * u
            and model_cfg.input_dim == 2
            and model_cfg.num_corners == 4
        ):
            act_l, idl_l, cnt_l, base_l = [], [], [], []
            for ids_b in ids_list:
                a, il, cc, bb = dedup_ops.compact_geometry_np(
                    ids_b, model_cfg.num_levels, u_c_pad
                )
                act_l.append(a)
                idl_l.append(il)
                cnt_l.append(cc)
                base_l.append(bb)
            dedup_ids = jnp.asarray(np.stack(idl_l))
            dedup_counts = jnp.asarray(np.stack(cnt_l))
            dedup_active = jnp.asarray(np.stack(act_l))
            dedup_base = jnp.asarray(np.stack(base_l))
            if model_cfg.dedup_cell_gather:
                # per-level cell tables, padded to the max cell count over
                # batches (padded cells reference compact row 0; no pixel
                # indexes them)
                per_batch = [
                    dedup_ops.cell_geometry_np(ids_b, a, side=model_cfg.n_max + 2)
                    for ids_b, a in zip(ids_list, act_l)
                ]
                num_levels = model_cfg.num_levels
                corners_stacked = []
                for li in range(num_levels):
                    c_pad = max(cb[0][li].shape[0] for cb in per_batch)
                    lvl = [
                        np.pad(
                            cb[0][li],
                            ((0, c_pad - cb[0][li].shape[0]), (0, 0)),
                        )
                        for cb in per_batch
                    ]
                    corners_stacked.append(jnp.asarray(np.stack(lvl)))
                dedup_cell_corners = tuple(corners_stacked)
                dedup_pixel_cell = jnp.asarray(
                    np.stack([cb[1] for cb in per_batch])
                )
        else:
            dedup_ids = jnp.asarray(np.stack(ids_list))
            dedup_counts = jnp.asarray(np.stack(counts_list))
        # NOTE: the gather_rows backward needs no precomputed reverse map —
        # the cell-structured one-hot (encoding._gather_rows_cells_bwd)
        # derives everything from ids in-graph; dedup_rev stays None unless
        # experimenting with the reverse-map variant

    return EpochBatches(
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        valid=jnp.asarray(valid),
        scatter_idx=jnp.asarray(perm.astype(np.int32)),
        gather_idx=jnp.asarray(inverse),
        og_image=jnp.asarray(og),
        dedup_ids=dedup_ids,
        dedup_counts=dedup_counts,
        dedup_rev=dedup_rev,
        dedup_active=dedup_active,
        dedup_base=dedup_base,
        dedup_cell_corners=dedup_cell_corners,
        dedup_pixel_cell=dedup_pixel_cell,
    )


def stack_epoch_batches(batches_list) -> EpochBatches:
    """Stack per-member EpochBatches on a leading ensemble axis (trainer
    fit_ensemble with per-member pixel shuffles).

    Members share all dense shapes (same image, same batch_fraction); only
    the COMPACTED dedup geometry can disagree — each member's shuffle touches
    a different number of grid vertices/cells, so U_c_pad / C_l_pad differ.
    Those are padded up to the ensemble max with their existing pad
    conventions (counts 0, active -1, cell corner rows 0 — padded rows are
    never indexed), which leaves every member's geometry semantically
    unchanged. Mixed compaction engagement across members is a caller error
    (build all members with the same compact_dedup flag)."""
    ref = batches_list[0]
    n = len(batches_list)
    if n == 1:
        return jax.tree_util.tree_map(lambda x: x[None], ref)
    for b in batches_list[1:]:
        assert (b.dedup_active is None) == (ref.dedup_active is None), (
            "mixed compaction engagement across ensemble members"
        )
        assert (b.dedup_ids is None) == (ref.dedup_ids is None)

    def pad_axis(arrs, axis, fill):
        m = max(a.shape[axis] for a in arrs)
        out = []
        for a in arrs:
            d = m - a.shape[axis]
            if d:
                pad = [(0, 0)] * a.ndim
                pad[axis] = (0, d)
                a = jnp.pad(a, pad, constant_values=fill)
            out.append(a)
        return jnp.stack(out)

    def plain(field):
        vals = [getattr(b, field) for b in batches_list]
        return jnp.stack(vals) if vals[0] is not None else None

    counts = active = cells = None
    if ref.dedup_counts is not None:
        counts = pad_axis([b.dedup_counts for b in batches_list], 2, 0.0)
    if ref.dedup_active is not None:
        active = pad_axis([b.dedup_active for b in batches_list], 1, -1)
    if ref.dedup_cell_corners is not None:
        cells = tuple(
            pad_axis([b.dedup_cell_corners[l] for b in batches_list], 1, 0)
            for l in range(len(ref.dedup_cell_corners))
        )
    return EpochBatches(
        x=plain("x"), y=plain("y"), valid=plain("valid"),
        scatter_idx=plain("scatter_idx"), gather_idx=plain("gather_idx"),
        og_image=plain("og_image"),
        dedup_ids=plain("dedup_ids"),
        dedup_counts=counts,
        dedup_rev=None,
        dedup_active=active,
        dedup_base=plain("dedup_base"),
        dedup_cell_corners=cells,
        dedup_pixel_cell=plain("dedup_pixel_cell"),
    )


def make_epoch_fn(
    exp: ExperimentConfig,
    statics: gngf.GNGFStatics,
    freeze_hpd: bool = False,
    dynamic_hypers: bool = False,
):
    """Build (init_state_fn, jitted epoch_fn, optimizer).

    epoch_fn(state, batches) -> (state', metrics, indices_all) where
    indices_all is (P_padded, L, V[, K]) int32 — the epoch's selected slots,
    kept on device for histogram epochs.

    dynamic_hypers=True: loss weights and the HPD/MLP learning rates enter as
    a :class:`HyperParams` runtime argument instead of trace-time constants —
    the jitted program (and its XLA compile) is then shared by every grid
    config with the same shapes (see HyperParams). The jitted callables take
    an extra trailing ``hypers`` argument, and the optimizer is built with
    unit HPD/MLP lrs (updates are rescaled by the dynamic lrs before
    application; bitwise-identical because optax's scale(-lr) is the final
    chain op)."""
    mcfg, lcfg = exp.model, exp.loss
    if dynamic_hypers:
        import dataclasses as _dc

        opt_cfg = _dc.replace(
            exp.optimizer, hpd_lr=1.0, mlp_lr=1.0, encoding_lr=1.0
        )
    else:
        opt_cfg = exp.optimizer
    tx = None  # created lazily against a params tree in init_state

    use_dedup = gngf.dedup_enabled(mcfg)

    def loss_fn(
        params, bn_state, bx, by, nvalid, dedup, prev_coll, prev_min, hypers,
        need_indices=True,
    ):
        out = gngf.forward(
            params, bx, mcfg, statics, bn_state=bn_state, train=True,
            dedup=dedup, need_indices=need_indices,
        )
        lw = hypers if dynamic_hypers else lcfg
        aux = compute_loss(
            out.rgb, by, out.probs, prev_coll, prev_min, lw, mcfg.num_levels,
            marginals=out.marginal, valid_rows=nvalid,
        )
        return aux.total, (aux, out)

    def epoch_fn(
        state: TrainState, batches: EpochBatches, num_pixels, tx_update,
        hypers=None, collect_indices=True,
    ):
        # mirror forward's work-based gate (gngf.forward): dedup engages when
        # geometry was precomputed, or when the duplicated row count exceeds
        # the unique-vertex count; batch shape is static under jit so this
        # resolves at trace time
        dedup_active = (
            use_dedup
            and statics.unique_coords is not None
            and (
                batches.dedup_ids is not None
                or batches.x.shape[1] * mcfg.num_corners * mcfg.num_levels
                > statics.unique_coords.shape[0]
            )
        )

        # indices are only consumed by histogram statistics; non-dedup paths
        # still need them in-epoch for collision counting
        need_idx = collect_indices or not dedup_active
        grad_fn = jax.value_and_grad(
            functools.partial(loss_fn, need_indices=need_idx), has_aux=True
        )

        def body(carry, batch):
            params, opt_state, bn_state = carry
            (bx, by, nvalid, dids, dcounts, drev, dactive, dbase,
             dcells, dpixcell) = batch
            dedup = (
                dedup_ops.DedupGeometry(
                    dids, dcounts, drev, dactive, dbase, dcells, dpixcell
                )
                if dids is not None
                else None
            )
            (_, (aux, out)), grads = grad_fn(
                params, bn_state, bx, by, nvalid, dedup,
                state.prev_collisions, state.prev_min_possible, hypers,
            )
            updates, opt_state = tx_update(grads, opt_state, params)
            if dynamic_hypers:
                updates = dict(updates)
                # keys here are PARAM-TREE keys (optimizer.param_labels maps
                # "tables" -> the "encoding" lr group), not group names
                for group, lr in (
                    ("hpd", hypers.hpd_lr), ("mlp", hypers.mlp_lr),
                    ("tables", hypers.encoding_lr),
                ):
                    if group in updates:
                        updates[group] = jax.tree_util.tree_map(
                            lambda u: u * lr, updates[group]
                        )
            params = optax.apply_updates(params, updates)
            if dedup_active:
                # per-batch used-slot presence: the collision statistic
                # reduces to tiny (L, U) x (U, K, T) contractions on unique
                # vertices instead of a scan over every pixel row
                presence = dedup_ops.used_slot_presence(
                    out.idx_unique, out.dedup_counts, mcfg.hash_table_size
                )
            else:
                presence = jnp.zeros((), jnp.bool_)
            scan_out = (
                out.rgb,
                out.indices,
                presence,
                aux.total,
                aux.mse,
                aux.js_kl_per_level,
                aux.coll_per_level,
            )
            return (params, opt_state, out.bn_state), scan_out

        (params, opt_state, bn_state), outs = jax.lax.scan(
            body, (state.params, state.opt_state, state.bn_state),
            (batches.x, batches.y, batches.valid,
             batches.dedup_ids, batches.dedup_counts, batches.dedup_rev,
             batches.dedup_active, batches.dedup_base,
             batches.dedup_cell_corners, batches.dedup_pixel_cell),
        )
        rgb_all, idx_all, presence_all, losses, mses, js_kls, coll_losses = outs

        nb, b = rgb_all.shape[0], rgb_all.shape[1]
        image = rgb_all.reshape(nb * b, -1)[batches.gather_idx]
        if need_idx:
            indices_all = idx_all.reshape((nb * b,) + idx_all.shape[2:])
        else:
            indices_all = jnp.zeros((0,), jnp.int32)

        if dedup_active:
            # union over batches == used-slot sets over every epoch row (each
            # batch evaluated with its own params, like the serial reference)
            collisions = dedup_ops.collisions_from_presence(
                jnp.any(presence_all, axis=0), jnp.asarray(statics.n_ls)
            )
            min_possible = coll_ops.min_possible_collisions(
                jnp.asarray(statics.n_ls), mcfg.hash_table_size
            ).astype(jnp.float32)
        else:
            collisions, min_possible = gngf.calc_hash_collisions(
                indices_all, mcfg, statics
            )

        # device-side image metrics (uint8 truncation like the reference's
        # `(output*255).int()`, functions.py:332-335)
        pred_int = (image * 255).astype(jnp.int32)
        diff = (pred_int - batches.og_image).astype(jnp.float32)
        int_sq_err = jnp.mean(diff * diff)
        match_count = jnp.sum(pred_int == batches.og_image)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            bn_state=bn_state,
            prev_collisions=collisions,
            prev_min_possible=min_possible,
        )
        metrics = EpochMetrics(
            loss=jnp.mean(losses),
            mse=jnp.mean(mses),
            js_kl_per_level=jnp.mean(js_kls, axis=0),
            coll_loss_per_level=jnp.mean(coll_losses, axis=0),
            collisions=collisions,
            min_possible=min_possible,
            image=image,
            int_sq_err=int_sq_err,
            match_count=match_count,
        )
        return new_state, metrics, indices_all

    def init_state(key: jax.Array) -> Tuple[TrainState, optax.GradientTransformation]:
        params = gngf.init_params(key, mcfg)
        nonlocal tx
        if tx is None:
            # reused across init calls so cached jitted programs (compile-
            # sharing grid sweeps) keep closing over the same tx.update
            tx = make_optimizer(opt_cfg, params, freeze_hpd=freeze_hpd)
        opt_state = tx.init(params)
        l = mcfg.num_levels
        min_poss = coll_ops.min_possible_collisions(
            jnp.asarray(statics.n_ls), mcfg.hash_table_size
        ).astype(jnp.float32)
        state = TrainState(
            params=params,
            opt_state=opt_state,
            bn_state=gngf.init_bn_state(mcfg),
            prev_collisions=jnp.zeros((l,), jnp.float32),
            prev_min_possible=min_poss,
        )
        return state, tx

    def make_jitted(
        tx: optax.GradientTransformation,
        num_pixels: int,
        span: Optional[int] = None,
        ensemble: bool = False,
        track_best: bool = False,
        per_member_batches: bool = False,
    ):
        """span=None: one device call per epoch (exact reference cadence).
        span=S: ONE device call executes S epochs via lax.scan and returns
        (state', SpanMetrics stacked over the S epochs, last_image,
        last_indices) — this amortizes the per-call dispatch/transfer latency
        of the host<->device link, which dominates wall-clock for this tiny
        model (the reference pays ~10 host syncs per epoch,
        functions.py:247-267; we pay ~1 per S epochs).

        track_best=True (span mode only): the scan carries the span's
        BEST-PSNR snapshot on device — (best_int_sq_err, (params, opt_state,
        bn_state)) selected by int_sq_err (PSNR is monotonically decreasing
        in it; ties go to the later epoch, matching the trainer's ``>=``) —
        and the call returns it as a 5th element. This lets span>1 / ensemble
        fits checkpoint the EXACT best epoch like the reference's best-PSNR
        checkpointing (functions.py:761-781) instead of the span end.

        ensemble=True (requires dynamic_hypers): state and hypers carry a
        leading ENSEMBLE axis — E same-shape grid configs train side by side
        in one program (vmap over params/optimizer state/hyper-params, the
        pixel batches shared). The ~58K-param models leave the MXU idle when
        run one-at-a-time; batching configs multiplies grid-search throughput
        per chip (SURVEY §2.4 "vmapped small-model ensembles"). Returns carry
        the ensemble axis on every metric (span mode: (S, E, ...)). The span
        form takes a per-member ``active`` bool mask: inactive (early-
        stopped) members keep their state/best frozen so extra span epochs
        don't keep training them past their stop epoch.

        per_member_batches=True (ensemble only): ``batches`` carries a
        leading ensemble axis on every field — each member trains on its OWN
        pixel shuffle (per-member seeds, trainer.fit_ensemble)."""
        if ensemble:
            assert dynamic_hypers, "ensemble mode requires dynamic_hypers"

            def pos_step(st, batches, hypers):
                return epoch_fn(
                    st, batches, num_pixels=num_pixels, tx_update=tx.update,
                    hypers=hypers, collect_indices=False,
                )

            batch_axes = 0 if per_member_batches else None
            vstep = jax.vmap(pos_step, in_axes=(0, batch_axes, 0))
            if span is None:
                return jax.jit(vstep)

            def vmulti(
                state: TrainState, batches: EpochBatches, hypers,
                active=None, valid_epochs=None,
            ):
                """active: (E,) bool — False freezes that member (early
                stop). valid_epochs: scalar — epochs >= it are discarded
                entirely (the span length is static, so a run whose remaining
                epoch budget is smaller than the span would otherwise
                overtrain past its budget AND contaminate the best
                snapshot)."""
                _, m_shape, _ = jax.eval_shape(vstep, state, batches, hypers)
                img0 = jnp.zeros(m_shape.image.shape, m_shape.image.dtype)
                e_count = m_shape.loss.shape[0]
                if active is None:
                    active = jnp.ones((e_count,), jnp.bool_)
                if valid_epochs is None:
                    valid_epochs = jnp.asarray(span, jnp.int32)

                def sel(mask):
                    # per-member select with the mask broadcast over the
                    # member's trailing axes
                    def f(new, old):
                        m = mask.reshape((e_count,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)
                    return f

                def body(carry, i):
                    st, _, best = carry
                    st2, m, _ = vstep(st, batches, hypers)
                    live = active & (i < valid_epochs)
                    # frozen members / overrun epochs: discard the update
                    st2 = jax.tree_util.tree_map(sel(live), st2, st)
                    scal = SpanMetrics(
                        m.loss, m.mse, m.js_kl_per_level,
                        m.coll_loss_per_level, m.collisions, m.min_possible,
                        m.int_sq_err, m.match_count,
                    )
                    if track_best:
                        best_err, best_tree = best
                        better = live & (m.int_sq_err <= best_err)
                        best_tree = jax.tree_util.tree_map(
                            sel(better),
                            (st2.params, st2.opt_state, st2.bn_state),
                            best_tree,
                        )
                        best = (
                            jnp.where(better, m.int_sq_err, best_err),
                            best_tree,
                        )
                    return (st2, m.image, best), scal

                best0 = (
                    jnp.full((e_count,), jnp.inf, jnp.float32),
                    (state.params, state.opt_state, state.bn_state),
                )
                (st, img, best), scal = jax.lax.scan(
                    body, (state, img0, best0),
                    jnp.arange(span, dtype=jnp.int32),
                )
                # (S, E, ...) metrics; last epoch's (E, P, C) images.
                # Uniform 5-tuple arity regardless of track_best (best=None
                # is an empty pytree under jit) so the trainer's unpack never
                # depends on the flag combination.
                return (
                    st, scal, img, jnp.zeros((0,), jnp.int32),
                    best if track_best else None,
                )

            return jax.jit(vmulti)
        step = functools.partial(
            epoch_fn, num_pixels=num_pixels, tx_update=tx.update
        )
        if span is None:
            return jax.jit(step)

        def multi(state: TrainState, batches: EpochBatches, hypers=None):
            # span calls never serve histogram epochs (the trainer schedules
            # those as singleton calls), so the per-row indices tensor is
            # skipped on the dedup path (collect_indices=False)
            step_span = functools.partial(
                step, hypers=hypers, collect_indices=False
            )
            _, m_shape, idx_shape = jax.eval_shape(step_span, state, batches)
            img0 = jnp.zeros(m_shape.image.shape, m_shape.image.dtype)
            idx0 = jnp.zeros(idx_shape.shape, idx_shape.dtype)

            def body(carry, _):
                st, _, _, best = carry
                st2, m, idx = step_span(st, batches)
                scal = SpanMetrics(
                    m.loss, m.mse, m.js_kl_per_level, m.coll_loss_per_level,
                    m.collisions, m.min_possible, m.int_sq_err, m.match_count,
                )
                if track_best:
                    best_err, best_tree = best
                    better = m.int_sq_err <= best_err
                    best_tree = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(better, new, old),
                        (st2.params, st2.opt_state, st2.bn_state), best_tree,
                    )
                    best = (
                        jnp.where(better, m.int_sq_err, best_err), best_tree
                    )
                return (st2, m.image, idx, best), scal

            best0 = (
                jnp.asarray(jnp.inf, jnp.float32),
                (state.params, state.opt_state, state.bn_state),
            )
            (st, img, idx, best), scal = jax.lax.scan(
                body, (state, img0, idx0, best0), None, length=span
            )
            # uniform 5-tuple arity (see vmulti): best=None when untracked
            return st, scal, img, idx, best if track_best else None

        return jax.jit(multi)

    return init_state, make_jitted


def make_stats_fn(exp: ExperimentConfig, statics: gngf.GNGFStatics):
    """Jitted histogram statistics for histogram epochs (reference
    functions.py:318-325 `indices_per_level` and models.py:530-566
    counts-per-level — both device-side here).

    stats_fn(indices_all, coords) ->
      (slot_counts (L, T), unique_cell_counts (L, T))
    """
    mcfg = exp.model

    @jax.jit
    def stats_fn(indices_all: jnp.ndarray, coords: jnp.ndarray):
        counts = coll_ops.slot_counts(indices_all, mcfg.hash_table_size)
        from ..ops.grid import scale_to_grid

        _, corners = scale_to_grid(
            coords, jnp.asarray(statics.n_ls), jnp.asarray(statics.offsets)
        )
        best = indices_all[..., 0] if not mcfg.use_hash_function else indices_all
        # indices_all rows follow the shuffled order; cell dedup is order-
        # independent so corners must follow the same pixel stream — callers
        # pass the matching coords array. n_ls stays numpy (static cell-table
        # size inside unique_cell_slot_counts).
        cell_counts = coll_ops.unique_cell_slot_counts(
            best[: corners.shape[0]], corners, statics.n_ls, mcfg.hash_table_size
        )
        return counts, cell_counts

    return stats_fn
