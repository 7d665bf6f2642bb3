"""Rendering API: native-resolution render must exactly reproduce the
training-grid forward; super-sampled renders must execute and stay in range."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.config import ModelConfig
from collision_handling_in_instantngp_tpu.data import make_coordinate_grid
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.render import render_image

CFG = ModelConfig(hash_table_size=32, hpd_hidden=(8, 16), mlp_hidden=(16,))


def test_native_render_matches_forward():
    statics = gngf.make_statics(CFG)
    params = gngf.init_params(jax.random.PRNGKey(0), CFG)
    h, w = 12, 9
    img = render_image(params, CFG, statics, height=h, width=w, batch_rows=64)
    assert img.shape == (h, w, 3)
    assert img.dtype == np.uint8

    coords = make_coordinate_grid(h, w).astype(np.float32) / (max(h, w) - 1)
    out = gngf.forward(params, jnp.asarray(coords), CFG, statics, train=False)
    expected = np.clip(np.asarray(out.rgb) * 255, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img.reshape(-1, 3), expected)


def test_supersampled_render():
    statics = gngf.make_statics(CFG)
    params = gngf.init_params(jax.random.PRNGKey(0), CFG)
    img = render_image(
        params, CFG, statics, height=24, width=18, train_shape=(12, 9),
        batch_rows=128,
    )
    assert img.shape == (24, 18, 3)


def test_bw_render():
    cfg = dataclasses.replace(CFG, out_channels=1)
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(0), cfg)
    img = render_image(params, cfg, statics, height=8, width=8, batch_rows=64)
    assert img.shape == (8, 8)
