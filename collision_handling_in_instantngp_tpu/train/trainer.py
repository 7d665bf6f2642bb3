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
from ..utils.metrics import calc_accuracy, calc_psnr, to_uint8_image
from .early_stopping import EarlyStopping
from .train_step import (
    EpochBatches,
    TrainState,
    build_epoch_batches,
    make_epoch_fn,
    make_stats_fn,
)


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
    epochs: Optional[int] = None,
    collect_history: bool = True,
    verbose: bool = True,
) -> FitResult:
    """Train one configuration to convergence (reference functions.py:540-814)."""
    logger = logger or NullLogger()
    tcfg, mcfg, lcfg = exp.train, exp.model, exp.loss
    epochs = epochs if epochs is not None else tcfg.epochs

    statics = gngf.make_statics(mcfg)
    shuffled, _reordered = make_shuffle_permutations(
        data.num_pixels, tcfg.seed, tcfg.shuffle_pixels
    )
    batches = build_epoch_batches(
        data.coords, data.targets, tcfg.batch_fraction, shuffled
    )

    freeze_hpd = hpd_weights_path is not None
    init_state, make_jitted = make_epoch_fn(exp, statics, freeze_hpd=freeze_hpd)
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
    epoch_fn = make_jitted(tx, data.num_pixels)
    stats_fn = make_stats_fn(exp, statics)

    early_stopper = EarlyStopping(tolerance=tcfg.tolerance, min_delta=tcfg.min_delta)
    run_dir = None
    if tcfg.save_params:
        stamp = run_name or time.strftime("%Y%m%d%H%M%S")
        rid = exp.grid_id if exp.grid_id is not None else "run"
        run_dir = os.path.join(tcfg.checkpoint_dir, f"{rid}_{stamp}")

    best_psnr = 0.0
    history: List[Dict[str, float]] = []
    check_last2: List[bool] = []
    zero_coll_abort = False
    epochs_run = 0
    last_img = None
    train_loss = float("nan")
    train_psnr = float("nan")

    for e in range(epochs):
        should_counts = (
            (e == epochs - 1) or (e % tcfg.histograms_rate == 0)
            or early_stopper.early_stop
        )

        state, metrics, indices_all = epoch_fn(state, batches)

        train_loss = float(metrics.loss)
        collisions = np.asarray(metrics.collisions)
        min_possible = np.asarray(metrics.min_possible)
        img01 = np.asarray(metrics.image)
        last_img = to_uint8_image(img01, data.height, data.width, data.channels)
        train_psnr = calc_psnr(last_img, data.image)
        train_accuracy = calc_accuracy(
            last_img, data.image, data.num_pixels * data.channels
        )
        epochs_run = e + 1

        # zero-collision abort: last two levels collision-free for the first
        # 10 checked epochs (reference functions.py:682-688)
        if tcfg.zero_collision_abort and e != 0 and len(check_last2) < 10:
            check_last2.append(bool(np.all(collisions[-2:] == 0)))
            if len(check_last2) == 10 and all(check_last2):
                if verbose:
                    print(f"!!! Stopping at epoch: {e} because of 0 collisions!!!")
                zero_coll_abort = True
                early_stopper.early_stop = True

        log: Dict[str, Any] = {
            "train_loss": train_loss,
            "train_accuracy": train_accuracy,
            "train_psnr": train_psnr,
            "mse_loss": float(metrics.mse),
        }
        if not mcfg.use_hash_function:
            js_kl = np.asarray(metrics.js_kl_per_level)
            coll_loss = np.asarray(metrics.coll_loss_per_level)
            for l in range(mcfg.num_levels):
                log[f"kl_div_loss_level{l}"] = float(js_kl[l])
                log[f"collisions_loss_level{l}"] = float(coll_loss[l])
                log[f"kl_collisions_loss_level{l}"] = float(
                    lcfg.l_js_kl * js_kl[l] + lcfg.l_collisions * coll_loss[l]
                )
        for l in range(mcfg.num_levels):
            log[f"collisions_level{l}"] = float(collisions[l])
            log[f"min_possible_collisions_level{l}"] = float(min_possible[l])

        if should_counts:
            flat_coords = np.asarray(batches.x).reshape(-1, batches.x.shape[-1])
            slot_c, cell_c = stats_fn(indices_all, jax.numpy.asarray(flat_coords))
            slot_c = np.asarray(slot_c)
            for l in range(mcfg.num_levels):
                log[f"hist_counts_level{l}"] = slot_c[l]

        logger.log(log, step=e)
        if collect_history:
            history.append(
                {k: v for k, v in log.items() if isinstance(v, (int, float))}
            )

        if train_psnr >= best_psnr and tcfg.save_params and run_dir is not None:
            best_psnr = train_psnr
            ckpt.save_run_checkpoint(run_dir, state.params, state.opt_state)
        best_psnr = max(best_psnr, train_psnr)

        if early_stopper.early_stop:
            if verbose and not zero_coll_abort:
                print(f"!!! Stopping at epoch: {e} !!!")
            break
        if e != 0:
            early_stopper(train_loss)

    logger.finish()
    return FitResult(
        best_psnr=best_psnr,
        final_psnr=train_psnr,
        final_loss=train_loss,
        epochs_run=epochs_run,
        stopped_early=early_stopper.early_stop,
        zero_collision_abort=zero_coll_abort,
        state=state,
        history=history,
        final_image=last_img,
        run_dir=run_dir,
    )
