"""Single-config training driver: the epoch loop around the jitted epoch step.

TPU-native equivalent of the per-config body of the reference's
``grid_search_loop`` (functions.py:540-814): model/optimizer/early-stopper
construction, the epoch loop with PSNR/accuracy tracking, the zero-collision
abort, best-PSNR checkpointing, histogram-epoch statistics, and the reference's
wandb metric schema (optional backend).

The device does one jitted call per epoch (forward+backward+update for every
minibatch, full-image assembly, collision counting — see train_step.py); the
host only fetches scalars, computes PSNR on the uint8 image, and drives
control flow (early stop / abort / checkpoint)."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np
import jax

from ..config import ExperimentConfig
from ..data import ImageData, make_shuffle_permutations
from ..models import gngf
from ..utils import checkpoint as ckpt
from ..utils.logging import MetricLogger, NullLogger
from ..utils.metrics import to_uint8_image
from .early_stopping import EarlyStopping
from .train_step import (
    EpochBatches,
    HyperParams,
    TrainState,
    build_epoch_batches,
    make_epoch_fn,
    make_stats_fn,
    stack_epoch_batches,
)


class EpochFnCache:
    """Shares jitted epoch programs across configs whose tensor shapes match.

    Grid-search configs differ almost entirely in loss weights and learning
    rates — runtime scalars under train_step.HyperParams — so the 48,000-id
    sweep needs only one XLA compile per SHAPE class (topk_k x keep_topk_only
    x ...). Pass one instance to successive fit() calls (the grid driver does
    this) and each entry carries the traced init/make_jitted pair plus the
    jitted fns per span size."""

    def __init__(self):
        self.entries: Dict[Any, Dict[str, Any]] = {}

    def entry(self, exp, statics, freeze_hpd, num_pixels):
        key = (
            exp.model,
            dataclasses.replace(exp.optimizer, hpd_lr=1.0, mlp_lr=1.0),
            freeze_hpd,
            num_pixels,
            exp.train.batch_fraction,
        )
        ent = self.entries.get(key)
        if ent is None:
            init_state, make_jitted = make_epoch_fn(
                exp, statics, freeze_hpd=freeze_hpd, dynamic_hypers=True
            )
            ent = {"init_state": init_state, "make_jitted": make_jitted,
                   "fns": {}}
            self.entries[key] = ent
        return ent


@dataclasses.dataclass
class FitResult:
    best_psnr: float
    final_psnr: float
    final_loss: float
    epochs_run: int
    stopped_early: bool
    zero_collision_abort: bool
    state: TrainState
    history: List[Dict[str, float]]
    final_image: np.ndarray            # (h, w[, 3]) int image
    run_dir: Optional[str]


def fit(
    exp: ExperimentConfig,
    data: ImageData,
    *,
    logger: Optional[MetricLogger] = None,
    run_name: Optional[str] = None,
    hpd_weights_path: Optional[str] = None,
    encoding_weights_path: Optional[str] = None,
    warm_start_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    collect_history: bool = True,
    verbose: bool = True,
    progress: bool = False,
    epoch_span: int = 1,
    epoch_fn_cache: Optional[EpochFnCache] = None,
    compact_dedup: bool = True,
    log_image_every: Optional[int] = None,
) -> FitResult:
    """Train one configuration to convergence (reference functions.py:540-814).

    progress=True shows a tqdm bar with live PSNR (reference
    functions.py:648, 694).

    epoch_span=S>1 executes S epochs per device call (lax.scan over epochs,
    train_step.make_jitted(span=S)) and processes the S per-epoch scalar rows
    on the host afterwards — amortizing the per-call dispatch latency that
    dominates wall-clock for these tiny models. Logging cadence, PSNR/best
    tracking, early stopping and the zero-collision abort all still evaluate
    PER EPOCH from the stacked scalars; histogram ("counts") epochs always run
    as singleton calls so their indices/image come from the right epoch, and
    best-PSNR checkpoints are EXACT at any span (the span program carries the
    best-epoch params snapshot on device, train_step make_jitted
    track_best). One documented divergence from span=1 remains: if a stop
    condition fires at epoch j inside a span, up to S-1 further epochs have
    already executed on device (epochs_run/metrics reflect the stop epoch;
    the returned state reflects the span end). Use span=1 for exact
    reference cadence.

    log_image_every=N logs the reconstructed ``train_image`` every N epochs
    (the reference logs it EVERY epoch, functions.py:718-721; pass 1 for that
    cadence — those epochs run as singleton device calls so the image is
    exact, so log_image_every=1 also forfeits span amortization)."""
    logger = logger or NullLogger()
    tcfg, mcfg, lcfg = exp.train, exp.model, exp.loss
    epochs = epochs if epochs is not None else tcfg.epochs

    statics = gngf.make_statics(mcfg)
    shuffled, _reordered = make_shuffle_permutations(
        data.num_pixels, tcfg.seed, tcfg.shuffle_pixels
    )
    batches = build_epoch_batches(
        data.coords, data.targets, tcfg.batch_fraction, shuffled,
        og_image=data.image, model_cfg=mcfg, statics=statics,
        compact_dedup=compact_dedup,
    )

    freeze_hpd = hpd_weights_path is not None
    if epoch_fn_cache is not None:
        # compile-sharing mode: loss weights / lrs flow in as HyperParams so
        # every same-shape config reuses one jitted program (grid sweeps)
        cache_entry = epoch_fn_cache.entry(
            exp, statics, freeze_hpd, data.num_pixels
        )
        init_state = cache_entry["init_state"]
        make_jitted = cache_entry["make_jitted"]
        jitted_fns = cache_entry["fns"]
        hypers = HyperParams.from_exp(exp)
    else:
        init_state, make_jitted = make_epoch_fn(
            exp, statics, freeze_hpd=freeze_hpd
        )
        jitted_fns = {}
        hypers = None
    state, tx = init_state(jax.random.PRNGKey(tcfg.seed))
    if freeze_hpd:
        params = ckpt.load_hpd_weights(state.params, hpd_weights_path)
        state = state._replace(params=params)
    if encoding_weights_path is not None:
        # the reference accepts -ewp but never loads it (models.py:288-289,
        # a dead parameter); here it genuinely warm-starts the tables
        tables = ckpt.load_pytree(encoding_weights_path)
        params = dict(state.params)
        params["tables"] = jax.numpy.asarray(tables)
        state = state._replace(params=params)
    if warm_start_dir is not None:
        # resume from a previous run's best checkpoint: full params +
        # optimizer state + batchnorm running stats (the reference can only
        # restart from scratch — its optimizer state is saved but never
        # reloaded, functions.py:768). The config stamp is validated so a
        # drifted ModelConfig fails loudly instead of mis-shaping params.
        params, opt_state, bn_state = ckpt.load_run_checkpoint(
            warm_start_dir, model_cfg=mcfg
        )
        state = state._replace(params=params, opt_state=opt_state)
        if bn_state is not None:
            state = state._replace(bn_state=bn_state)
    def get_jitted(span_n):
        fn = jitted_fns.get(span_n)
        if fn is None:
            # span programs carry the best-epoch snapshot on device so
            # best-PSNR checkpoints are exact at any span
            fn = make_jitted(
                tx, data.num_pixels, span=span_n,
                # best-snapshot selection costs a per-epoch full-tree where;
                # runs that never checkpoint shouldn't pay it
                track_best=span_n is not None and tcfg.save_params,
            )
            jitted_fns[span_n] = fn
        return fn

    epoch_fn = get_jitted(None)
    stats_fn = make_stats_fn(exp, statics)

    early_stopper = EarlyStopping(tolerance=tcfg.tolerance, min_delta=tcfg.min_delta)
    run_dir = None
    if tcfg.save_params:
        stamp = run_name or time.strftime("%Y%m%d%H%M%S")
        rid = exp.grid_id if exp.grid_id is not None else "run"
        run_dir = os.path.join(tcfg.checkpoint_dir, f"{rid}_{stamp}")

    best_psnr = 0.0
    best_snapshot = None               # (params, opt_state) device handles
    last_ckpt_write = 0.0
    history: List[Dict[str, float]] = []
    check_last2: List[bool] = []
    zero_coll_abort = False
    epochs_run = 0
    train_loss = float("nan")
    train_psnr = float("nan")
    og_max = float(np.max(data.image))
    values_per_img = data.num_pixels * data.channels

    pbar = None
    if progress:
        try:
            from tqdm import tqdm

            pbar = tqdm(total=epochs)
        except ImportError:
            pass

    def run_span(st, n):
        return get_jitted(n)(st, batches, hypers=hypers)

    rate = tcfg.histograms_rate
    if log_image_every is not None and log_image_every < 1:
        raise ValueError(
            f"log_image_every must be >= 1, got {log_image_every}"
        )
    img_rate = log_image_every
    last_image_dev = None
    stop_now = False
    e = 0
    while e < epochs and not stop_now:
        # counts (histogram) epochs, image-logging epochs, and the final
        # epoch run as singleton calls so their indices/image belong to
        # exactly that epoch; other epochs batch up to epoch_span per
        # device call
        if (
            epoch_span <= 1 or e % rate == 0 or e >= epochs - 1
            or early_stopper.early_stop
            or (img_rate is not None and e % img_rate == 0)
        ):
            n = 1
        else:
            next_count = ((e // rate) + 1) * rate
            n = max(1, min(epoch_span, next_count - e, (epochs - 1) - e))
            if img_rate is not None:
                next_img = ((e // img_rate) + 1) * img_rate
                n = max(1, min(n, next_img - e))

        if n == 1:
            state, metrics, indices_all = epoch_fn(
                state, batches, hypers=hypers
            )
            # ONE host transfer for all scalar metrics (each device_get is a
            # round-trip; the reference pays ~10 per epoch,
            # functions.py:247-267)
            scal = tuple(
                np.asarray(v)[None]
                for v in jax.device_get(
                    (
                        metrics.loss, metrics.mse, metrics.js_kl_per_level,
                        metrics.coll_loss_per_level, metrics.collisions,
                        metrics.min_possible, metrics.int_sq_err,
                        metrics.match_count,
                    )
                )
            )
            last_image_dev = metrics.image
            best_dev = None
        else:
            state, smetrics, last_image_dev, indices_all, best_dev = run_span(
                state, n
            )
            scal = tuple(np.asarray(v) for v in jax.device_get(tuple(smetrics)))
        (
            losses, mses, js_kls, coll_losses, collisions_arr,
            min_possible_arr, int_sq_errs, match_counts,
        ) = scal

        for j in range(n):
            ep = e + j
            train_loss = float(losses[j])
            js_kl, coll_loss = js_kls[j], coll_losses[j]
            collisions, min_possible = collisions_arr[j], min_possible_arr[j]
            int_sq_err = float(int_sq_errs[j])
            # reference PSNR/accuracy formulas (functions.py:130-136) on the
            # device-computed integer-image statistics
            train_psnr = float(
                20 * np.log10(og_max) - 10 * np.log10(max(int_sq_err, 1e-12))
            )
            train_accuracy = float(match_counts[j]) / values_per_img * 100.0
            epochs_run = ep + 1
            if pbar is not None:
                pbar.update(1)
                pbar.set_description(f"Training_psnr: {train_psnr}")

            # zero-collision abort: last two levels collision-free for the
            # first 10 checked epochs (reference functions.py:682-688)
            if tcfg.zero_collision_abort and ep != 0 and len(check_last2) < 10:
                check_last2.append(bool(np.all(collisions[-2:] == 0)))
                if len(check_last2) == 10 and all(check_last2):
                    if verbose:
                        print(
                            f"!!! Stopping at epoch: {ep} because of 0 "
                            "collisions!!!"
                        )
                    zero_coll_abort = True
                    early_stopper.early_stop = True

            log: Dict[str, Any] = {
                "train_loss": train_loss,
                "train_accuracy": train_accuracy,
                "train_psnr": train_psnr,
                "mse_loss": float(mses[j]),
            }
            if not mcfg.use_hash_function:
                for l in range(mcfg.num_levels):
                    log[f"kl_div_loss_level{l}"] = float(js_kl[l])
                    log[f"collisions_loss_level{l}"] = float(coll_loss[l])
                    log[f"kl_collisions_loss_level{l}"] = float(
                        lcfg.l_js_kl * js_kl[l]
                        + lcfg.l_collisions * coll_loss[l]
                    )
            for l in range(mcfg.num_levels):
                log[f"collisions_level{l}"] = float(collisions[l])
                log[f"min_possible_collisions_level{l}"] = float(
                    min_possible[l]
                )

            should_counts = (
                (ep == epochs - 1) or (ep % rate == 0)
                or early_stopper.early_stop
            )
            if should_counts and j == n - 1:
                # indices_all/image belong to the span's LAST epoch; counts
                # epochs are scheduled as singletons so this is exact (a
                # mid-span early-stop epoch is the one case that skips it)
                flat_coords = np.asarray(batches.x).reshape(
                    -1, batches.x.shape[-1]
                )
                slot_c, cell_c = stats_fn(
                    indices_all, jax.numpy.asarray(flat_coords)
                )
                slot_c = np.asarray(slot_c)
                for l in range(mcfg.num_levels):
                    log[f"hist_counts_level{l}_counts"] = slot_c[l]
                if not isinstance(logger, NullLogger):
                    # reference schema parity: the reconstructed train image
                    # (functions.py:718-721 — logged there every epoch; here
                    # on histogram epochs to keep the device->host image
                    # transfer off the hot path) and the per-level histogram
                    # FIGURES under hist_counts_level{l}
                    # (functions.py:749-757)
                    log["train_image"] = to_uint8_image(
                        np.asarray(last_image_dev), data.height, data.width,
                        data.channels,
                    )
                    from ..utils.histograms import counts_per_level_histograms

                    figs = counts_per_level_histograms(
                        slot_c, mcfg.hash_table_size
                    )
                    for l, fig in enumerate(figs):
                        log[f"hist_counts_level{l}"] = fig

            if (
                img_rate is not None
                and ep % img_rate == 0
                and "train_image" not in log
                and not isinstance(logger, NullLogger)
            ):
                # reference every-epoch train_image cadence on request
                # (functions.py:718-721); these epochs were scheduled as
                # singleton calls above, so last_image_dev is this epoch's
                log["train_image"] = to_uint8_image(
                    np.asarray(last_image_dev), data.height, data.width,
                    data.channels,
                )
            logger.log(log, step=ep)
            if collect_history:
                history.append(
                    {
                        k: v for k, v in log.items()
                        if isinstance(v, (int, float))
                    }
                )

            if train_psnr >= best_psnr:
                best_psnr = train_psnr
                if tcfg.save_params and run_dir is not None:
                    # keep the best state on device; throttle disk writes.
                    # span calls: the device-tracked snapshot is the span's
                    # exact best epoch (its min int_sq_err is this j's value
                    # whenever this branch last fires within the span)
                    best_snapshot = (
                        best_dev[1] if best_dev is not None
                        else (state.params, state.opt_state, state.bn_state)
                    )
                    now = time.monotonic()
                    if now - last_ckpt_write >= tcfg.checkpoint_min_interval_s:
                        ckpt.save_run_checkpoint(
                            run_dir, *best_snapshot, model_cfg=mcfg
                        )
                        last_ckpt_write = now

            if early_stopper.early_stop:
                if verbose and not zero_coll_abort:
                    print(f"!!! Stopping at epoch: {ep} !!!")
                stop_now = True
                break
            if ep != 0:
                early_stopper(train_loss)
        e += n

    if best_snapshot is not None and run_dir is not None:
        # flush final best
        ckpt.save_run_checkpoint(run_dir, *best_snapshot, model_cfg=mcfg)

    logger.finish()
    # the full-image prediction is fetched from device ONCE here (the
    # reference ships it every epoch, functions.py:332-335)
    final_img = None
    if last_image_dev is not None:
        final_img = to_uint8_image(
            np.asarray(last_image_dev), data.height, data.width,
            data.channels,
        )
    return FitResult(
        best_psnr=best_psnr,
        final_psnr=train_psnr,
        final_loss=train_loss,
        epochs_run=epochs_run,
        stopped_early=early_stopper.early_stop,
        zero_collision_abort=zero_coll_abort,
        state=state,
        history=history,
        final_image=final_img,
        run_dir=run_dir,
    )


def fit_ensemble(
    exps: List[ExperimentConfig],
    data: ImageData,
    *,
    epochs: Optional[int] = None,
    epoch_span: int = 33,
    loggers: Optional[List[MetricLogger]] = None,
    run_names: Optional[List[str]] = None,
    verbose: bool = False,
    per_member_shuffle: bool = True,
) -> List[FitResult]:
    """Train E SAME-SHAPE configs simultaneously in one vmapped program
    (SURVEY §2.4 "vmapped small-model ensembles per chip").

    The ~58K-param models leave the MXU almost idle one-at-a-time; batching
    configs over a leading ensemble axis multiplies grid-search throughput
    per chip AND amortizes the XLA compile across the whole group (the
    programs are identical because loss weights/lrs are runtime HyperParams).

    All exps must share one shape class (identical ModelConfig up to
    hyper-scalars, identical batch_fraction). Semantics vs per-config fit():
    per-epoch scalar metrics, best-PSNR tracking, early stopping and the
    zero-collision abort are evaluated PER CONFIG on the host from the
    stacked metrics; a member that early-stops is FROZEN on device from the
    next span boundary (up to epoch_span-1 extra epochs can execute before
    the host sees the stop — their metrics are ignored, but the device-side
    best tracker DOES consider them: a post-stop epoch inside the stop span
    that happens to set a new int_sq_err minimum becomes that member's saved
    best checkpoint, a residual divergence from solo fit() bounded by
    epoch_span-1 epochs; the host cannot gate it because the stop epoch is
    only known after the span's losses come back); checkpoints save each
    config's BEST-PSNR params (the
    span program carries per-member best snapshots on device, train_step
    make_jitted track_best), like solo fit(); histogram statistics and media
    logging are not emitted (use fit() for those). per_member_shuffle=True
    (default) gives every member its OWN pixel shuffle from its train.seed —
    a member then reproduces its solo fit() run's batching exactly; False
    broadcasts exps[0]'s shuffle to the whole group (round-2 behavior,
    smaller device footprint).
    """
    e_count = len(exps)
    assert e_count >= 1
    base = exps[0]
    for e in exps[1:]:
        assert e.model == base.model, "ensemble configs must share shapes"
        assert e.train.batch_fraction == base.train.batch_fraction
    tcfg = base.train
    epochs = epochs if epochs is not None else tcfg.epochs
    loggers = loggers or [NullLogger() for _ in exps]

    statics = gngf.make_statics(base.model)
    seeds = [e.train.seed for e in exps]
    per_member = per_member_shuffle and len(set(seeds)) > 1

    def build_for(seed):
        shuffled, _ = make_shuffle_permutations(
            data.num_pixels, seed, tcfg.shuffle_pixels
        )
        return build_epoch_batches(
            data.coords, data.targets, tcfg.batch_fraction, shuffled,
            og_image=data.image, model_cfg=base.model, statics=statics,
        )

    if per_member:
        batches = stack_epoch_batches([build_for(s) for s in seeds])
    else:
        batches = build_for(tcfg.seed)
    init_state, make_jitted = make_epoch_fn(
        base, statics, dynamic_hypers=True
    )
    states, tx = [], None
    for e in exps:
        st, tx = init_state(jax.random.PRNGKey(e.train.seed))
        states.append(st)
    state = jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *states)
    hypers = jax.tree_util.tree_map(
        lambda *xs: jax.numpy.stack(xs),
        *[HyperParams.from_exp(e) for e in exps],
    )
    span_fn = make_jitted(
        tx, data.num_pixels, span=max(1, epoch_span), ensemble=True,
        track_best=True, per_member_batches=per_member,
    )

    og_max = float(np.max(data.image))
    values_per_img = data.num_pixels * data.channels
    stoppers = [
        EarlyStopping(tolerance=e.train.tolerance, min_delta=e.train.min_delta)
        for e in exps
    ]
    check_last2 = [[] for _ in exps]
    zero_abort = [False] * e_count
    best_psnr = [0.0] * e_count
    stop_epoch = [None] * e_count
    final = [
        {"psnr": float("nan"), "loss": float("nan")} for _ in exps
    ]

    # global best across span calls: each call tracks its own span's best on
    # device (reset to +inf), so the running best is merged per member here
    import jax.numpy as jnp

    @jax.jit
    def merge_best(old_err, old_tree, new_err, new_tree):
        better = new_err <= old_err

        def sel(new, old):
            m = better.reshape((e_count,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        return (
            jnp.where(better, new_err, old_err),
            jax.tree_util.tree_map(sel, new_tree, old_tree),
        )

    g_best_err = jnp.full((e_count,), jnp.inf, jnp.float32)
    g_best_tree = (state.params, state.opt_state, state.bn_state)

    ep = 0
    # a member is finished once its stop EPOCH is recorded (one epoch AFTER
    # its loss-stopper fired — solo-fit()/reference semantics, where the
    # break happens at the next iteration's check)
    while ep < epochs and not all(se is not None for se in stop_epoch):
        n = min(max(1, epoch_span), epochs - ep)
        active = jnp.asarray(
            np.array([se is None for se in stop_epoch])
        )
        state, scal, images, _, span_best = span_fn(
            state, batches, hypers, active, jnp.asarray(n, jnp.int32)
        )
        g_best_err, g_best_tree = merge_best(
            g_best_err, g_best_tree, span_best[0], span_best[1]
        )
        vals = jax.device_get(scal)  # each field (S, E, ...)
        for j in range(n):
            for ei, exp in enumerate(exps):
                if stop_epoch[ei] is not None:
                    continue
                loss = float(vals.loss[j, ei])
                int_sq = float(vals.int_sq_err[j, ei])
                psnr = float(
                    20 * np.log10(og_max)
                    - 10 * np.log10(max(int_sq, 1e-12))
                )
                acc = float(vals.match_count[j, ei]) / values_per_img * 100
                row = {
                    "train_loss": loss,
                    "train_accuracy": acc,
                    "train_psnr": psnr,
                    "mse_loss": float(vals.mse[j, ei]),
                }
                for l in range(base.model.num_levels):
                    row[f"kl_div_loss_level{l}"] = float(
                        vals.js_kl_per_level[j, ei, l]
                    )
                    row[f"collisions_level{l}"] = float(
                        vals.collisions[j, ei, l]
                    )
                loggers[ei].log(row, step=ep + j)
                best_psnr[ei] = max(best_psnr[ei], psnr)
                final[ei] = {"psnr": psnr, "loss": loss}
                e_abs = ep + j
                if (
                    exp.train.zero_collision_abort and e_abs != 0
                    and len(check_last2[ei]) < 10
                ):
                    check_last2[ei].append(
                        bool(np.all(vals.collisions[j, ei, -2:] == 0))
                    )
                    if len(check_last2[ei]) == 10 and all(check_last2[ei]):
                        zero_abort[ei] = True
                        stoppers[ei].early_stop = True
                        stop_epoch[ei] = e_abs
                        continue
                if stoppers[ei].early_stop:
                    # the stopper fired on a PREVIOUS epoch's loss: this
                    # epoch still trains and logs (reference
                    # functions.py:786-793 breaks only on the next
                    # iteration), then the member freezes
                    stop_epoch[ei] = e_abs
                elif e_abs != 0:
                    stoppers[ei](loss)
        ep += n

    images_np = np.asarray(images)
    results = []
    for ei, exp in enumerate(exps):
        run_dir = None
        if exp.train.save_params:
            name = (
                run_names[ei] if run_names else time.strftime("%Y%m%d%H%M%S")
            )
            rid = exp.grid_id if exp.grid_id is not None else "run"
            run_dir = os.path.join(exp.train.checkpoint_dir, f"{rid}_{name}")
            # best-PSNR params (device-tracked), like solo fit() — NOT the
            # final span-end params
            b_params, b_opt, b_bn = g_best_tree
            params_e = jax.tree_util.tree_map(lambda x: x[ei], b_params)
            opt_e = jax.tree_util.tree_map(lambda x: x[ei], b_opt)
            bn_e = (
                jax.tree_util.tree_map(lambda x: x[ei], b_bn)
                if b_bn is not None
                else None
            )
            ckpt.save_run_checkpoint(
                run_dir, params_e, opt_e, bn_e, model_cfg=exp.model
            )
        loggers[ei].finish()
        se = stop_epoch[ei]
        results.append(
            FitResult(
                best_psnr=best_psnr[ei],
                final_psnr=final[ei]["psnr"],
                final_loss=final[ei]["loss"],
                epochs_run=(se + 1) if se is not None else min(ep, epochs),
                stopped_early=stoppers[ei].early_stop,
                zero_collision_abort=zero_abort[ei],
                state=None,
                history=[],
                final_image=to_uint8_image(
                    images_np[ei], data.height, data.width, data.channels
                ),
                run_dir=run_dir,
            )
        )
    if verbose:
        for exp, r in zip(exps, results):
            print(
                f"ensemble grid {exp.grid_id}: best PSNR {r.best_psnr:.3f} "
                f"({r.epochs_run} epochs)"
            )
    return results
