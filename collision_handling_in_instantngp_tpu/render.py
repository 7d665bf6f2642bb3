"""Inference / rendering API.

The reference has NO separate serve/render entry point — "evaluation" is the
training loop's own full-image reconstruction (SURVEY.md §3.5). This module
gives inference a first-class surface: render any resolution from trained
parameters with a jitted, batched forward pass (the neural field is
continuous, so super-/sub-sampling the training image is free).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import ModelConfig
from .data import make_coordinate_grid
from .models import gngf


_RENDER_CACHE: dict = {}


def make_renderer(cfg: ModelConfig, statics: gngf.GNGFStatics, batch_rows: int):
    """Jitted (params, padded coords (C, R, d)) -> (C*R, channels) renderer,
    cached per (config, batch_rows)."""
    key = (cfg, batch_rows)
    if key not in _RENDER_CACHE:

        @jax.jit
        def renderer(params, chunks, bn_state=None):
            def body(_, chunk):
                out = gngf.forward(
                    params, chunk, cfg, statics, bn_state=bn_state, train=False
                )
                return None, out.rgb

            _, rgb = jax.lax.scan(body, None, chunks)
            return rgb.reshape(-1, rgb.shape[-1])

        _RENDER_CACHE[key] = renderer
    return _RENDER_CACHE[key]


def render_image(
    params: dict,
    cfg: ModelConfig,
    statics: Optional[gngf.GNGFStatics] = None,
    height: int = 508,
    width: int = 339,
    train_shape: Optional[tuple] = None,
    batch_rows: int = 65536,
    bn_state: Optional[dict] = None,
) -> np.ndarray:
    """Render an (height, width, C) uint8 image from trained parameters.

    train_shape: the (h, w) the field was TRAINED on. Coordinates are
      normalized by max(w, h)-1 exactly like training (reference
      main.py:50-51); a different render resolution maps linearly onto the
      training extent (the field is continuous — super/sub-sampling is free).
      Defaults to (height, width), i.e. rendering the native training grid.
    bn_state: running batchnorm stats for ``batchnorm_input`` configs (saved
      in checkpoints as ``bn_state.pkl``); defaults to fresh-init stats.
    """
    statics = statics if statics is not None else gngf.make_statics(cfg)
    th, tw = train_shape if train_shape is not None else (height, width)
    md = max(th, tw)
    coords = make_coordinate_grid(height, width).astype(np.float32)
    if height != th:
        coords[:, 0] *= (th - 1) / max(height - 1, 1)
    if width != tw:
        coords[:, 1] *= (tw - 1) / max(width - 1, 1)
    coords = coords / (md - 1)
    n = coords.shape[0]
    pad = (-n) % batch_rows
    chunks = np.pad(coords, ((0, pad), (0, 0))).reshape(
        -1, batch_rows, coords.shape[1]
    )
    renderer = make_renderer(cfg, statics, batch_rows)
    rgb = np.asarray(renderer(params, jnp.asarray(chunks), bn_state))[:n]
    img = rgb.reshape(height, width, -1)
    img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return img.squeeze(-1) if img.shape[-1] == 1 else img
