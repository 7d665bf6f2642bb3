"""Metric logging — wandb-optional, same metric schema as the reference.

The reference logs per-epoch scalars/images/histogram figures to wandb
(functions.py:716-759) with keys: train_loss, train_accuracy, train_psnr,
train_image, mse_loss, kl_div_loss_level{l}, collisions_loss_level{l},
kl_collisions_loss_level{l}, collisions_level{l},
min_possible_collisions_level{l}, hist_counts_level{l}. The same schema is
emitted here through a small logger interface with three backends: null, local
JSONL (always available), and wandb (if installed — it is optional in this
environment)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional


class MetricLogger:
    """Interface. log() once per epoch; finish() once per run."""

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        raise NotImplementedError

    def finish(self) -> None:
        pass


class NullLogger(MetricLogger):
    def log(self, metrics, step=None):  # noqa: D102
        pass


class JsonlLogger(MetricLogger):
    """Appends one JSON object per epoch; ndarray/image values are dropped or
    summarized (shape only) to keep lines small."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, metrics, step=None):
        row = {"step": step}
        for k, v in metrics.items():
            if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
                row[k] = f"<array{tuple(v.shape)}>"
            else:
                try:
                    row[k] = float(v)
                except (TypeError, ValueError):
                    row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def finish(self):
        self._f.close()


class WandbLogger(MetricLogger):
    """wandb backend (reference functions.py:587-635). Constructing raises
    ImportError when wandb is unavailable — callers should fall back to
    JsonlLogger."""

    def __init__(self, entity: str, project: str, group: str, name: str, config: dict):
        import wandb  # gated import — not installed in all environments

        self._wandb = wandb
        wandb.init(entity=entity, project=project, group=group, name=name,
                   config=config)

    def log(self, metrics, step=None):
        payload = dict(metrics)
        img = payload.pop("train_image", None)
        if img is not None:
            payload["train_image"] = self._wandb.Image(img)
        self._wandb.log(payload)

    def finish(self):
        self._wandb.finish()


def make_logger(
    backend: str = "jsonl",
    *,
    path: str = "runs/log.jsonl",
    wandb_kwargs: Optional[dict] = None,
) -> MetricLogger:
    if backend == "null":
        return NullLogger()
    if backend == "wandb":
        try:
            return WandbLogger(**(wandb_kwargs or {}))
        except ImportError:
            print("wandb not available; falling back to jsonl logger")
            return JsonlLogger(path)
    return JsonlLogger(path)
