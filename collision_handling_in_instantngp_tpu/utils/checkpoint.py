"""Checkpointing — per-submodule save/load of parameter pytrees.

Mirrors the reference's best-PSNR checkpointing layout (functions.py:761-781):
five artifacts per run directory ``weights/{id}_{timestamp}/`` — whole model,
optimizer state, encoding tables, HPD, MLP decoder — plus the reference's
load-HPD-frozen path (models.py:363-372; freezing itself is an optimizer label,
see train/optimizer.py).

Format: pickle of the pytree with all leaves converted to numpy (portable
across CPU/TPU and device meshes; arrays are fetched with device_get).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import jax


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)
    with open(path, "wb") as f:
        pickle.dump(host_tree, f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_run_checkpoint(run_dir: str, params: dict, opt_state: Any) -> None:
    """Reference functions.py:761-781: five files per best-PSNR checkpoint."""
    save_pytree(params, os.path.join(run_dir, "whole_model.pkl"))
    save_pytree(opt_state, os.path.join(run_dir, "whole_opt.pkl"))
    save_pytree(params["tables"], os.path.join(run_dir, "encoding_model.pkl"))
    if "hpd" in params:
        save_pytree(params["hpd"], os.path.join(run_dir, "HPD_model.pkl"))
    save_pytree(params["mlp"], os.path.join(run_dir, "MLP_model.pkl"))


def load_hpd_weights(params: dict, path: str) -> dict:
    """Replace the HPD subtree with pretrained weights (reference
    models.py:363-372). Freezing is applied by the optimizer's 'frozen' label —
    pass freeze_hpd=True to make_epoch_fn/make_optimizer."""
    hpd = load_pytree(path)
    new = dict(params)
    new["hpd"] = jax.tree_util.tree_map(jax.numpy.asarray, hpd)
    return new
