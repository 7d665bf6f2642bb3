"""Round-2 regression tests for the advisor findings (ADVICE.md round 1):

1. --should_bw must thread the 1-channel ModelConfig through the grid driver
   and the test-mode render path end-to-end.
2. batchnorm configs must render with bn_state=None (fresh-stats fallback)
   and persist running stats through checkpoints.
3. non-divisible pixel counts: padded tail rows must carry ZERO gradient
   weight in the MSE (each pixel trains exactly once per epoch).
4. checkpoints are version/config stamped; drifted loads fail loudly.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collision_handling_in_instantngp_tpu.config import (
    ModelConfig,
    experiment_from_grid_id,
)
from collision_handling_in_instantngp_tpu.data import ImageData
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.render import render_image
from collision_handling_in_instantngp_tpu.train.loss import compute_loss
from collision_handling_in_instantngp_tpu.train.train_step import (
    build_epoch_batches,
)
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.utils import checkpoint as ckpt


def _data(rng, h=12, w=9, channels=3):
    img = rng.integers(0, 256, size=(h, w, channels)).squeeze()
    coords = (
        np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
        .reshape(-1, 2)
        .astype(np.float32)
        / (max(h, w) - 1)
    )
    return ImageData(
        coords=coords,
        targets=(img.reshape(h * w, -1) / 255.0).astype(np.float32),
        height=h,
        width=w,
        image=img.astype(np.int64),
        name="tiny.png",
    )


def _small_exp(tmp_path, epochs=4, **model_overrides):
    exp = experiment_from_grid_id(4061)
    model = dataclasses.replace(
        exp.model, hash_table_size=32, hpd_hidden=(8, 16), mlp_hidden=(16,),
        **model_overrides,
    )
    train = dataclasses.replace(
        exp.train,
        epochs=epochs,
        checkpoint_dir=str(tmp_path / "weights"),
        checkpoint_min_interval_s=0.0,
    )
    return dataclasses.replace(exp, model=model, train=train)


# --------------------------- 1. BW path ------------------------------------ #

def test_bw_grid_search_end_to_end(rng, tmp_path):
    """ADVICE #1: a 1-channel model config must flow into run_grid_search and
    the whole BW fit must complete with correctly-shaped outputs (the round-1
    bug broadcast (P,3) preds against (P,1) targets and crashed on render)."""
    from collision_handling_in_instantngp_tpu.train.grid_search import (
        run_grid_search,
    )

    data = _data(rng, channels=1)
    assert data.channels == 1
    exp = _small_exp(tmp_path, out_channels=1)
    rows = run_grid_search(
        data,
        start_id=0,
        end_id=1,
        base_model=exp.model,
        base_train=exp.train,
        epochs=3,
        manifest_path=str(tmp_path / "m.jsonl"),
        verbose=False,
    )
    assert len(rows) == 1
    # accuracy denominator must be P values, not 3P (the bug inflated it)
    res = fit(exp, data, epochs=2, verbose=False, collect_history=True)
    assert res.final_image.shape == (12, 9)
    assert 0.0 <= res.history[-1]["train_accuracy"] <= 100.0


def test_cli_bw_in_process(rng, tmp_path, monkeypatch):
    """CLI --should_bw end-to-end including the test-mode render block."""
    import cv2

    from collision_handling_in_instantngp_tpu.cli import main

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    img = rng.integers(0, 256, size=(9, 12, 3)).astype(np.uint8)
    cv2.imwrite(str(img_dir / "tiny.png"), img)
    monkeypatch.chdir(tmp_path)
    rc = main([
        "-f", "tiny.png", "--images_dir", str(img_dir), "--should_bw",
        "-s", "0", "-e", "0", "--epochs", "2", "-t",
        "--manifest", str(tmp_path / "m.jsonl"),
    ])
    assert rc == 0
    assert (tmp_path / "runs" / "tiny_0_comparison.png").exists()


# --------------------------- 2. batchnorm state ----------------------------- #

def test_batchnorm_render_and_checkpoint(rng, tmp_path):
    """ADVICE #2: rendering a batchnorm config must not crash with
    bn_state=None, and checkpoints must persist the running stats."""
    data = _data(rng)
    exp = _small_exp(tmp_path, epochs=3, batchnorm_input=True)
    res = fit(exp, data, verbose=False)

    # bn_state saved alongside the 5 reference artifacts
    assert os.path.exists(os.path.join(res.run_dir, "bn_state.pkl"))
    params, opt_state, bn_state = ckpt.load_run_checkpoint(
        res.run_dir, model_cfg=exp.model
    )
    assert bn_state is not None and "mean" in bn_state

    # render without bn_state: fresh-stats fallback, no crash
    img0 = render_image(params, exp.model, height=12, width=9)
    assert img0.shape == (12, 9, 3)
    # render with the trained running stats
    img1 = render_image(
        params, exp.model, height=12, width=9, bn_state=bn_state
    )
    assert img1.shape == (12, 9, 3)

    # warm start restores bn_state (non-fresh stats after training)
    res2 = fit(exp, data, warm_start_dir=res.run_dir, epochs=2, verbose=False)
    assert res2.epochs_run == 2


# --------------------------- 3. padded-tail masking ------------------------- #

def test_padded_tail_rows_masked_out_of_mse(rng):
    """ADVICE #3: with P not divisible by num_batches the duplicated tail rows
    must not contribute to the MSE value or gradient."""
    p = 100  # 1/3 batches -> b=34, pad=2
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.arange(p, dtype=np.int32)
    batches = build_epoch_batches(coords, targets, 1 / 3, perm)
    assert batches.x.shape == (3, 34, 2)
    np.testing.assert_array_equal(np.asarray(batches.valid), [34, 34, 32])

    # masked MSE == plain MSE over the valid rows only
    pred = jnp.asarray(rng.random((34, 3)).astype(np.float32))
    targ = batches.y[-1]
    aux = compute_loss(
        pred, targ, None, jnp.zeros(4), jnp.zeros(4),
        experiment_from_grid_id(4061).loss, 4, valid_rows=batches.valid[-1],
    )
    expect = float(jnp.mean((pred[:32] - targ[:32]) ** 2))
    assert float(aux.mse) == pytest.approx(expect, rel=1e-6)

    # gradient wrt the padded rows is exactly zero
    def mse_of(pred):
        return compute_loss(
            pred, targ, None, jnp.zeros(4), jnp.zeros(4),
            experiment_from_grid_id(4061).loss, 4,
            valid_rows=batches.valid[-1],
        ).total

    g = jax.grad(mse_of)(pred)
    np.testing.assert_array_equal(np.asarray(g[32:]), 0.0)
    assert np.abs(np.asarray(g[:32])).min() > 0


def test_non_divisible_fit_runs(rng, tmp_path):
    """Whole-trainer smoke on a non-divisible image (10x10 = 100 px)."""
    data = _data(rng, h=10, w=10)
    exp = _small_exp(tmp_path, epochs=3)
    res = fit(exp, data, verbose=False)
    assert res.final_image.shape == (10, 10, 3)
    assert np.isfinite(res.final_loss)


# --------------------------- 4. versioned checkpoints ----------------------- #

def test_checkpoint_version_stamp_and_mismatch(rng, tmp_path):
    data = _data(rng)
    exp = _small_exp(tmp_path, epochs=2)
    res = fit(exp, data, verbose=False)

    meta = os.path.join(res.run_dir, "checkpoint_meta.json")
    assert os.path.exists(meta)
    # matching config loads fine
    ckpt.load_run_checkpoint(res.run_dir, model_cfg=exp.model)

    # drifted config is rejected with a clear error
    drifted = dataclasses.replace(exp.model, hash_table_size=64)
    with pytest.raises(ckpt.CheckpointMismatchError, match="hash_table_size"):
        ckpt.load_run_checkpoint(res.run_dir, model_cfg=drifted)

    # warm-starting with the drifted config fails loudly too
    bad_exp = dataclasses.replace(exp, model=drifted)
    with pytest.raises(ckpt.CheckpointMismatchError):
        fit(bad_exp, data, warm_start_dir=res.run_dir, epochs=1, verbose=False)

    # unstamped (pre-v2) directories still load
    os.remove(meta)
    ckpt.load_run_checkpoint(res.run_dir, model_cfg=drifted)
