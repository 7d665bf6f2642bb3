"""Grid-search driver: sequential or config-parallel sweep over the 48,000
reference configurations.

TPU-native equivalent of reference ``grid_search_loop`` (functions.py:477-818)
with two upgrades the reference lacks:

  * a completion MANIFEST (JSONL) making sweeps idempotently resumable — the
    reference's only resume mechanism is manually re-passing ``-s/-e`` id
    ranges after a crash (main.py:14-15);
  * config-parallel sharding: in a multi-host TPU job every process owns the id
    slice ``ids[process_index::process_count]`` (BASELINE.json config 5); the
    same mechanism serves single-host "shard 3 of 8" splits.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..config import (
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    experiment_from_grid_id,
    get_grid_search_configs,
)
from ..data import ImageData
from ..utils.logging import MetricLogger, NullLogger
from .trainer import EpochFnCache, FitResult, fit


def load_manifest(path: str) -> Dict[int, Dict[str, Any]]:
    done: Dict[int, Dict[str, Any]] = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    row = json.loads(line)
                    done[int(row["grid_id"])] = row
    return done


def append_manifest(path: str, row: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def run_grid_search(
    data: ImageData,
    start_id: int = 0,
    end_id: Optional[int] = None,
    *,
    base_model: Optional[ModelConfig] = None,
    base_train: Optional[TrainConfig] = None,
    epochs: Optional[int] = None,
    manifest_path: Optional[str] = "runs/grid_manifest.jsonl",
    logger_factory: Optional[Callable[[ExperimentConfig], MetricLogger]] = None,
    hpd_weights_path: Optional[str] = None,
    encoding_weights_path: Optional[str] = None,
    shard_index: Optional[int] = 0,
    shard_count: Optional[int] = 1,
    verbose: bool = True,
    progress: bool = False,
    epoch_span: int = 1,
    compile_cache: bool = True,
    ensemble_size: int = 1,
    log_image_every: Optional[int] = None,
    ids: Optional[Sequence[int]] = None,
) -> List[Dict[str, Any]]:
    """Sweep configs [start_id, end_id] (inclusive start, exclusive end like the
    reference's slice at functions.py:503). Returns one summary row per config
    run by THIS shard.

    shard_index/shard_count = None enables multi-host auto-sharding: each JAX
    process owns ``ids[jax.process_index()::jax.process_count()]`` — the
    distributed version of the reference's manual ``-s/-e`` range splitting
    (BASELINE.json config 5).

    compile_cache=True (default) shares jitted epoch programs across configs
    with identical tensor shapes: loss weights and lrs flow in as runtime
    scalars (train_step.HyperParams), so the 48,000-config grid needs one XLA
    compile per shape class (topk_k x keep_topk_only) instead of one per
    config — numerically identical to per-config compilation."""
    if shard_index is None or shard_count is None:
        import jax

        shard_index = jax.process_index()
        shard_count = jax.process_count()
    grid = get_grid_search_configs()
    if ids is None:
        end_id = len(grid) if end_id is None else end_id
        if not (0 <= start_id <= len(grid)) or end_id > len(grid):
            raise ValueError(
                f"grid id range [{start_id}, {end_id}) out of bounds — "
                f"the filtered grid has {len(grid)} configs "
                f"(ids 0..{len(grid)-1})"
            )
        ids = range(start_id, end_id)
    else:
        # explicit id list (e.g. full-budget re-runs of screening winners)
        bad = [i for i in ids if not 0 <= i < len(grid)]
        if bad:
            raise ValueError(
                f"grid ids out of bounds: {bad[:5]} — the filtered grid has "
                f"{len(grid)} configs (ids 0..{len(grid)-1})"
            )
    ids = [i for i in ids][shard_index::shard_count]

    done = load_manifest(manifest_path) if manifest_path else {}
    results: List[Dict[str, Any]] = []
    fn_cache = EpochFnCache() if compile_cache else None

    if ensemble_size > 1:
        return _run_ensembled(
            data, ids, grid, done, results, base_model=base_model,
            base_train=base_train, epochs=epochs,
            manifest_path=manifest_path, verbose=verbose,
            epoch_span=epoch_span, ensemble_size=ensemble_size,
        )

    for grid_id in ids:
        if grid_id in done:
            if verbose:
                print(f"grid {grid_id}: already complete (manifest), skipping")
            results.append(done[grid_id])
            continue
        exp = experiment_from_grid_id(
            grid_id, base_model=base_model, base_train=base_train, grid=grid
        )
        if verbose:
            print(f"Grid search params: {grid_id}")
            print(grid[grid_id])
        logger = logger_factory(exp) if logger_factory else NullLogger()
        result: FitResult = fit(
            exp,
            data,
            logger=logger,
            hpd_weights_path=hpd_weights_path,
            encoding_weights_path=encoding_weights_path,
            epochs=epochs,
            collect_history=False,
            verbose=verbose,
            progress=progress,
            epoch_span=epoch_span,
            epoch_fn_cache=fn_cache,
            log_image_every=log_image_every,
        )
        row = {
            "grid_id": grid_id,
            "image": data.name,
            "best_psnr": result.best_psnr,
            "final_psnr": result.final_psnr,
            "final_loss": result.final_loss,
            "epochs_run": result.epochs_run,
            "stopped_early": result.stopped_early,
            "zero_collision_abort": result.zero_collision_abort,
            "run_dir": result.run_dir,
        }
        if manifest_path:
            append_manifest(manifest_path, row)
        results.append(row)
    return results


def _run_ensembled(
    data, ids, grid, done, results, *, base_model, base_train, epochs,
    manifest_path, verbose, epoch_span, ensemble_size,
):
    """Ensembled sweep body: group pending ids by SHAPE class and train each
    group of up to ensemble_size configs in one vmapped program
    (trainer.fit_ensemble — SURVEY §2.4 "vmapped small-model ensembles").
    Manifest rows are identical to the per-config path; media/histogram
    logging and exact best-epoch checkpoints need the per-config path."""
    from collections import defaultdict

    from .trainer import fit_ensemble

    pending = []
    for grid_id in ids:
        if grid_id in done:
            if verbose:
                print(f"grid {grid_id}: already complete (manifest), skipping")
            results.append(done[grid_id])
            continue
        pending.append(grid_id)

    groups = defaultdict(list)
    for grid_id in pending:
        exp = experiment_from_grid_id(
            grid_id, base_model=base_model, base_train=base_train, grid=grid
        )
        key = (exp.model, exp.train.batch_fraction)
        groups[key].append((grid_id, exp))

    for key, members in groups.items():
        for i in range(0, len(members), ensemble_size):
            chunk = members[i : i + ensemble_size]
            exps = [e for _, e in chunk]
            if verbose:
                print(
                    f"ensemble ({len(chunk)} configs): "
                    f"{[g for g, _ in chunk]}"
                )
            fits = fit_ensemble(
                exps, data, epochs=epochs, epoch_span=max(1, epoch_span),
                run_names=[f"ens{g}" for g, _ in chunk], verbose=verbose,
            )
            for (grid_id, _), result in zip(chunk, fits):
                row = {
                    "grid_id": grid_id,
                    "image": data.name,
                    "best_psnr": result.best_psnr,
                    "final_psnr": result.final_psnr,
                    "final_loss": result.final_loss,
                    "epochs_run": result.epochs_run,
                    "stopped_early": result.stopped_early,
                    "zero_collision_abort": result.zero_collision_abort,
                    "run_dir": result.run_dir,
                }
                if manifest_path:
                    append_manifest(manifest_path, row)
                results.append(row)
    return results
