"""End-to-end artifact round-trip: train -> checkpoint -> load -> render must
reproduce the training-time reconstruction (the path used to validate the
final PSNR numbers in RESULTS.md)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.data import ImageData
from collision_handling_in_instantngp_tpu.render import render_image
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.utils.checkpoint import load_pytree
from collision_handling_in_instantngp_tpu.utils.metrics import calc_psnr


def test_train_checkpoint_render_roundtrip(rng, tmp_path):
    h, w = 10, 8
    img = rng.integers(0, 256, size=(h, w, 3))
    data = ImageData(
        coords=(
            np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
            .reshape(-1, 2).astype(np.float32) / (max(h, w) - 1)
        ),
        targets=(img.reshape(-1, 3) / 255.0).astype(np.float32),
        height=h, width=w, image=img.astype(np.int64), name="t.png",
    )
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, hash_table_size=32, hpd_hidden=(8,), mlp_hidden=(16,)
        ),
        train=dataclasses.replace(
            exp.train, epochs=8, checkpoint_dir=str(tmp_path / "w"),
            checkpoint_min_interval_s=0.0,
        ),
    )
    res = fit(exp, data, verbose=False)

    params = jax.tree_util.tree_map(
        jnp.asarray, load_pytree(f"{res.run_dir}/whole_model.pkl")
    )
    recon = render_image(params, exp.model, height=h, width=w, batch_rows=32)
    psnr = calc_psnr(recon.astype(np.int64), data.image)
    # checkpoint captured the best epoch; rendering it must land within the
    # (clip-vs-truncate) rounding of the recorded best PSNR
    assert abs(psnr - res.best_psnr) < 0.3, (psnr, res.best_psnr)
