"""Grid-search driver: manifest resume, shard partitioning, range validation
(reference functions.py:477-818 + the rebuild's config-parallel upgrades)."""

import json

import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.data import ImageData
from collision_handling_in_instantngp_tpu.train.grid_search import (
    append_manifest,
    load_manifest,
    run_grid_search,
)
from collision_handling_in_instantngp_tpu.config import ModelConfig, TrainConfig


def _tiny_data(rng, h=8, w=6):
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
        height=h, width=w, image=img.astype(np.int64), name="tiny.png",
    )


SMALL_MODEL = ModelConfig(hash_table_size=32, hpd_hidden=(8,), mlp_hidden=(8,))


def _train_cfg(tmp_path):
    return TrainConfig(
        epochs=2, save_params=False, checkpoint_dir=str(tmp_path / "w")
    )


def test_sweep_and_manifest_resume(rng, tmp_path):
    data = _tiny_data(rng)
    manifest = str(tmp_path / "m.jsonl")
    rows = run_grid_search(
        data, 0, 2, base_model=SMALL_MODEL, base_train=_train_cfg(tmp_path),
        epochs=2, manifest_path=manifest, verbose=False,
    )
    assert [r["grid_id"] for r in rows] == [0, 1]
    assert len(load_manifest(manifest)) == 2

    # resume: completed ids are skipped, results replayed from the manifest
    rows2 = run_grid_search(
        data, 0, 3, base_model=SMALL_MODEL, base_train=_train_cfg(tmp_path),
        epochs=2, manifest_path=manifest, verbose=False,
    )
    assert [r["grid_id"] for r in rows2] == [0, 1, 2]
    assert rows2[0] == load_manifest(manifest)[0]


def test_shard_partition(rng, tmp_path):
    data = _tiny_data(rng)
    rows = run_grid_search(
        data, 0, 4, base_model=SMALL_MODEL, base_train=_train_cfg(tmp_path),
        epochs=1, manifest_path=None, shard_index=1, shard_count=2,
        verbose=False,
    )
    assert [r["grid_id"] for r in rows] == [1, 3]


def test_range_validation(rng, tmp_path):
    with pytest.raises(ValueError, match="47999"):
        run_grid_search(
            _tiny_data(rng), 48001, 48002, manifest_path=None, verbose=False
        )


def test_manifest_io(tmp_path):
    path = str(tmp_path / "m.jsonl")
    append_manifest(path, {"grid_id": 7, "best_psnr": 1.0})
    append_manifest(path, {"grid_id": 9, "best_psnr": 2.0})
    m = load_manifest(path)
    assert set(m) == {7, 9}
    assert m[9]["best_psnr"] == 2.0
