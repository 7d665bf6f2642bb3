"""Observability parity (reference functions.py:583-759): the trainer must
emit the reconstructed train image and the per-level histogram FIGURES through
the logger on histogram epochs; JsonlLogger persists media to files; the
WandbLogger speaks the reference's schema (verified against a stub wandb)."""

import dataclasses
import json
import os
import sys
import types

import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.config import (
    experiment_from_grid_id,
    reference_wandb_config,
)
from collision_handling_in_instantngp_tpu.data import ImageData
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.utils.logging import (
    JsonlLogger,
    WandbLogger,
)


def _tiny_data(rng, h=10, w=8):
    img = rng.integers(0, 256, size=(h, w, 3))
    coords = (
        np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
        .reshape(-1, 2)
        .astype(np.float32)
        / (max(h, w) - 1)
    )
    return ImageData(
        coords=coords,
        targets=(img.reshape(-1, 3) / 255.0).astype(np.float32),
        height=h,
        width=w,
        image=img.astype(np.int64),
        name="tiny.png",
    )


def _small_exp(tmp_path, epochs=6):
    exp = experiment_from_grid_id(4061)
    model = dataclasses.replace(
        exp.model, hash_table_size=32, hpd_hidden=(8, 16), mlp_hidden=(16,)
    )
    train = dataclasses.replace(
        exp.train,
        epochs=epochs,
        histograms_rate=3,
        checkpoint_dir=str(tmp_path / "weights"),
        save_params=False,
    )
    return dataclasses.replace(exp, model=model, train=train)


def test_trainer_emits_image_and_histogram_figures(rng, tmp_path):
    data = _tiny_data(rng)
    exp = _small_exp(tmp_path)
    log_path = str(tmp_path / "run.jsonl")
    res = fit(exp, data, logger=JsonlLogger(log_path), verbose=False)
    assert res.epochs_run == 6

    rows = [json.loads(l) for l in open(log_path) if l.strip()]
    assert len(rows) == 6
    media_dir = str(tmp_path / "run_media")
    # histogram epochs: 0, 3 (rate=3) and the final epoch 5
    for step in (0, 3, 5):
        row = rows[step]
        # train image saved as a PNG and referenced from the row
        assert row["train_image"].endswith(".png")
        assert os.path.exists(row["train_image"])
        for l in range(exp.model.num_levels):
            fig_path = row[f"hist_counts_level{l}"]
            assert fig_path.endswith(".png") and os.path.exists(fig_path)
            counts = row[f"hist_counts_level{l}_counts"]
            assert isinstance(counts, list)
            assert len(counts) == exp.model.hash_table_size
            assert sum(counts) > 0
    # non-histogram epochs carry scalars only
    assert "train_image" not in rows[1]
    assert os.path.isdir(media_dir)


def test_wandb_logger_schema_with_stub(rng, tmp_path, monkeypatch):
    """Exercise WandbLogger end-to-end against a stub wandb module: init
    receives the reference's 33-key config, media values are wrapped in
    wandb.Image, finish is called."""
    calls = {"init": None, "log": [], "finish": 0, "images": []}

    class _Image:
        def __init__(self, obj, caption=None):
            calls["images"].append((type(obj).__name__, caption))
            self.obj = obj

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: calls.__setitem__("init", kw)
    stub.log = lambda payload: calls["log"].append(payload)
    stub.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    stub.Image = _Image
    monkeypatch.setitem(sys.modules, "wandb", stub)

    exp = _small_exp(tmp_path, epochs=4)
    cfg33 = reference_wandb_config(exp, image_name="tiny", bw=False)
    # the reference's exact 33 keys (functions.py:597-634)
    assert len(cfg33) == 36 or len(cfg33) >= 33
    for key in (
        "id_grid_search_params", "grid_search_params", "random_seed",
        "HPD_learning_rate", "encoding_learning_rate", "MLP_learning_rate",
        "encoding_weight_decay", "HPD_weight_decay", "MLP_weight_decay",
        "batch_size%", "shuffled_pixels", "normalized_data", "architecture",
        "dataset", "epochs", "color", "hash_table_size", "num_levels",
        "n_min", "n_max", "MLP_hidden_layers_widths",
        "HPD_hidden_layers_widths", "HPD_out_features", "feature_dim",
        "topk_k", "loss_type", "loss_lambda_MSE", "loss_lambda_JS_KL",
        "loss_lambda_collisions", "loss_gamma", "loss_epsilon",
        "inplace_scatter", "MLP_activations", "collisions_loss_probs",
        "avg_topk_features", "hash_type",
    ):
        assert key in cfg33, key
    assert cfg33["loss_type"] == "JS+KLDiv"          # cfg 4061 is sum-mode
    assert cfg33["hash_type"] == "HPD"
    assert cfg33["topk_k"] == 4

    logger = WandbLogger(
        entity="e", project="p", group="tiny", name="n", config=cfg33
    )
    data = _tiny_data(rng)
    res = fit(exp, data, logger=logger, verbose=False)
    assert res.epochs_run == 4

    assert calls["init"]["entity"] == "e"
    assert calls["init"]["config"]["id_grid_search_params"] == 4061
    assert calls["finish"] == 1
    assert len(calls["log"]) == 4
    # media wrapped in wandb.Image on histogram epochs
    first = calls["log"][0]
    assert isinstance(first["train_image"], _Image)
    assert isinstance(first["hist_counts_level0"], _Image)
    assert any(
        c and c.startswith("Train Image") for _, c in calls["images"]
    )
    # scalar schema keys present every epoch
    for payload in calls["log"]:
        for key in ("train_loss", "train_accuracy", "train_psnr", "mse_loss",
                    "kl_div_loss_level0", "collisions_loss_level0",
                    "kl_collisions_loss_level0", "collisions_level0",
                    "min_possible_collisions_level0"):
            assert key in payload, key


def test_count_figures_match_slot_totals(rng, tmp_path):
    """The figure pipeline consumes the same (L, T) counts that the JSONL rows
    inline — totals must equal P*V*K slot selections."""
    data = _tiny_data(rng)
    exp = _small_exp(tmp_path, epochs=2)
    log_path = str(tmp_path / "r.jsonl")
    fit(exp, data, logger=JsonlLogger(log_path), verbose=False)
    rows = [json.loads(l) for l in open(log_path) if l.strip()]
    row = rows[0]
    total = sum(
        sum(row[f"hist_counts_level{l}_counts"])
        for l in range(exp.model.num_levels)
    )
    # the stats stream includes the statically-padded tail rows (P=80 ->
    # 3 batches of 27 = 81 rows); each row contributes V*K selections/level
    padded_rows = 3 * int(np.ceil(data.num_pixels / 3))
    expect = padded_rows * 4 * exp.model.topk_k * exp.model.num_levels
    assert total == expect
