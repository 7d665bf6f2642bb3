"""Checkpointing — per-submodule save/load of parameter pytrees.

Mirrors the reference's best-PSNR checkpointing layout (functions.py:761-781):
five artifacts per run directory ``weights/{id}_{timestamp}/`` — whole model,
optimizer state, encoding tables, HPD, MLP decoder — plus the reference's
load-HPD-frozen path (models.py:363-372; freezing itself is an optimizer label,
see train/optimizer.py). Upgrades over the reference: batchnorm running stats
are persisted (the reference's ``state_dict()`` includes BatchNorm1d buffers;
our functional forward keeps them as a separate pytree), and every run
directory carries a ``checkpoint_meta.json`` stamp (format version + the full
model config) so that a config-drifted load fails loudly instead of producing
silently mis-shaped parameters.

Format: pickle of the pytree with all leaves converted to numpy (portable
across CPU/TPU and device meshes; arrays are fetched with device_get).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
import pickle
from typing import Any, Optional, Tuple

import numpy as np
import jax

CHECKPOINT_FORMAT_VERSION = 2


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)
    with open(path, "wb") as f:
        pickle.dump(host_tree, f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def _config_stamp(model_cfg) -> dict:
    out = {}
    for f in dataclasses.fields(model_cfg):
        v = getattr(model_cfg, f.name)
        if isinstance(v, enum.Enum):
            v = v.value
        elif isinstance(v, tuple):
            v = list(v)  # canonical: JSON round-trips tuples as lists
        out[f.name] = v
    return out


class CheckpointMismatchError(RuntimeError):
    """A checkpoint's stamped model config or format version does not match
    what the caller expects."""


def save_run_checkpoint(
    run_dir: str,
    params: dict,
    opt_state: Any,
    bn_state: Optional[dict] = None,
    model_cfg=None,
) -> None:
    """Reference functions.py:761-781: five files per best-PSNR checkpoint,
    plus ``bn_state.pkl`` (batchnorm running stats) and a version/config
    stamp when ``model_cfg`` is provided."""
    save_pytree(params, os.path.join(run_dir, "whole_model.pkl"))
    save_pytree(opt_state, os.path.join(run_dir, "whole_opt.pkl"))
    save_pytree(params["tables"], os.path.join(run_dir, "encoding_model.pkl"))
    if "hpd" in params:
        save_pytree(params["hpd"], os.path.join(run_dir, "HPD_model.pkl"))
    save_pytree(params["mlp"], os.path.join(run_dir, "MLP_model.pkl"))
    if bn_state is not None:
        save_pytree(bn_state, os.path.join(run_dir, "bn_state.pkl"))
    if model_cfg is not None:
        meta = {
            "format_version": CHECKPOINT_FORMAT_VERSION,
            "model_config": _config_stamp(model_cfg),
        }
        with open(os.path.join(run_dir, "checkpoint_meta.json"), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True, default=str)


def validate_run_checkpoint(run_dir: str, model_cfg) -> None:
    """Raise CheckpointMismatchError if ``run_dir``'s stamp disagrees with
    ``model_cfg``. Unstamped (pre-v2 / foreign) directories pass silently —
    the stamp is an upgrade, not a gate on old artifacts."""
    meta_path = os.path.join(run_dir, "checkpoint_meta.json")
    if not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        meta = json.load(f)
    version = meta.get("format_version")
    if version is not None and version > CHECKPOINT_FORMAT_VERSION:
        raise CheckpointMismatchError(
            f"{run_dir}: checkpoint format v{version} is newer than this "
            f"build's v{CHECKPOINT_FORMAT_VERSION}"
        )
    if model_cfg is None:
        return
    want = {k: str(v) for k, v in _config_stamp(model_cfg).items()}
    got = {k: str(v) for k, v in meta.get("model_config", {}).items()}
    diffs = {
        k: (got.get(k), want[k]) for k in want if k in got and got[k] != want[k]
    }
    if diffs:
        lines = ", ".join(
            f"{k}: checkpoint={a} vs expected={b}" for k, (a, b) in diffs.items()
        )
        raise CheckpointMismatchError(
            f"{run_dir}: model config mismatch — {lines}"
        )


def load_run_checkpoint(
    run_dir: str, model_cfg=None
) -> Tuple[dict, Any, Optional[dict]]:
    """Load (params, opt_state, bn_state) from a run directory, validating the
    config stamp against ``model_cfg`` when given."""
    validate_run_checkpoint(run_dir, model_cfg)
    params = jax.tree_util.tree_map(
        jax.numpy.asarray, load_pytree(os.path.join(run_dir, "whole_model.pkl"))
    )
    opt_state = jax.tree_util.tree_map(
        jax.numpy.asarray, load_pytree(os.path.join(run_dir, "whole_opt.pkl"))
    )
    bn_path = os.path.join(run_dir, "bn_state.pkl")
    bn_state = None
    if os.path.exists(bn_path):
        bn_state = jax.tree_util.tree_map(jax.numpy.asarray, load_pytree(bn_path))
    return params, opt_state, bn_state


def load_hpd_weights(params: dict, path: str) -> dict:
    """Replace the HPD subtree with pretrained weights (reference
    models.py:363-372). Freezing is applied by the optimizer's 'frozen' label —
    pass freeze_hpd=True to make_epoch_fn/make_optimizer."""
    hpd = load_pytree(path)
    new = dict(params)
    new["hpd"] = jax.tree_util.tree_map(jax.numpy.asarray, hpd)
    return new
