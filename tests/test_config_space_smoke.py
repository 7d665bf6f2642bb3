"""Config-space smoke tests: one short fit() per structurally distinct corner
of the 48,000-config grid (loss variants, blend variants, top-k widths,
shuffle off) — each must train with finite, decreasing loss."""

import dataclasses

import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.config import (
    TopkBlendMode,
    TopkScatterMode,
    experiment_from_grid_id,
    get_grid_search_configs,
)
from collision_handling_in_instantngp_tpu.data import ImageData
from collision_handling_in_instantngp_tpu.train.trainer import fit

GRID = get_grid_search_configs()


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


def _find_id(**want):
    for i, g in enumerate(GRID):
        if all(g[k] == v for k, v in want.items()):
            return i
    raise AssertionError(f"no grid config with {want}")


# structurally distinct corners of the grid
CASES = [
    _find_id(should_sum_js_kl_div=True, loss_gamma=-2, topk_k=4),
    _find_id(should_sum_js_kl_div=False, should_js_div=True, topk_k=1),   # JS-only
    _find_id(should_sum_js_kl_div=False, should_js_div=False, topk_k=20), # KL-only
    _find_id(should_keep_topk_only=True, topk_k=4),
    _find_id(should_shuffle_pixels=False, topk_k=4),
]


@pytest.mark.parametrize("grid_id", CASES)
def test_grid_corner_trains(rng, grid_id, tmp_path):
    exp = experiment_from_grid_id(grid_id)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, hash_table_size=32, hpd_hidden=(8, 16), mlp_hidden=(16,)
        ),
        train=dataclasses.replace(
            exp.train, epochs=8, checkpoint_dir=str(tmp_path / "w"),
            save_params=False,
        ),
    )
    res = fit(exp, _tiny_data(rng), verbose=False)
    losses = [h["train_loss"] for h in res.history]
    mses = [h["mse_loss"] for h in res.history]
    assert all(np.isfinite(losses))
    # heavy-regularizer corners can raise the TOTAL loss while the image term
    # still converges; "trains sanely" = finite and the MSE term not exploding
    assert mses[-1] < mses[0] * 2.0



@pytest.mark.parametrize(
    "blend", [TopkBlendMode.RAW_SUM, TopkBlendMode.WEIGHTED_AVG]
)
def test_blend_variants_train(rng, blend, tmp_path):
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, hash_table_size=32, hpd_hidden=(8, 16),
            mlp_hidden=(16,), topk_blend=blend,
        ),
        train=dataclasses.replace(
            exp.train, epochs=6, save_params=False,
        ),
    )
    res = fit(exp, _tiny_data(rng), verbose=False)
    assert np.isfinite(res.final_loss)


def test_noop_scatter_quirk_trains(rng):
    """TopkScatterMode.NOOP (reference should_inplace_scatter=None quirk)
    routes to the dense path and still trains the decoder (HPD gets no
    top-k gradient by construction)."""
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, hash_table_size=32, hpd_hidden=(8, 16),
            mlp_hidden=(16,), topk_scatter=TopkScatterMode.NOOP,
        ),
        train=dataclasses.replace(exp.train, epochs=6, save_params=False),
    )
    res = fit(exp, _tiny_data(rng), verbose=False)
    assert np.isfinite(res.final_loss)
