"""Multi-epoch span training (train_step.make_jitted(span=S) + fit
(epoch_span=S)): S epochs per device call must reproduce the per-epoch-call
path epoch for epoch — same scalar history, same final params — while counts
epochs still land on exact singleton calls."""

import dataclasses

import numpy as np
import jax

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.train.train_step import (
    build_epoch_batches,
    make_epoch_fn,
)
from collision_handling_in_instantngp_tpu.data import make_shuffle_permutations

from test_trainer import _small_exp, _tiny_data


def test_span_fn_matches_serial_epochs(rng, tmp_path):
    """make_jitted(span=4) == 4 sequential make_jitted() calls exactly."""
    exp = _small_exp(tmp_path, epochs=4)
    data = _tiny_data(rng)
    statics = gngf.make_statics(exp.model)
    shuffled, _ = make_shuffle_permutations(
        data.num_pixels, exp.train.seed, True
    )
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=exp.model, statics=statics,
    )
    init_state, make_jitted = make_epoch_fn(exp, statics)
    state0, tx = init_state(jax.random.PRNGKey(0))

    serial_fn = make_jitted(tx, data.num_pixels)
    st = state0
    losses, last = [], None
    for _ in range(4):
        st, metrics, idx = serial_fn(st, batches)
        losses.append(float(metrics.loss))
        last = (metrics.image, idx)

    span_fn = make_jitted(tx, data.num_pixels, span=4)
    st_span, smetrics, image, idx_span, _best = span_fn(state0, batches)

    np.testing.assert_allclose(
        np.asarray(smetrics.loss), np.asarray(losses), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(image), np.asarray(last[0]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(idx_span), np.asarray(last[1]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        st.params, st_span.params,
    )


def test_fit_epoch_span_history_matches(rng, tmp_path):
    """fit(epoch_span=5) logs the same per-epoch scalar history as span=1
    (histograms_rate=10 exercises the singleton-counts-epoch scheduling)."""
    data = _tiny_data(rng)
    exp = _small_exp(tmp_path / "a", epochs=23)
    res1 = fit(exp, data, verbose=False)
    exp2 = dataclasses.replace(
        exp,
        train=dataclasses.replace(
            exp.train, checkpoint_dir=str(tmp_path / "b")
        ),
    )
    res5 = fit(exp2, data, verbose=False, epoch_span=5)

    assert res5.epochs_run == res1.epochs_run == 23
    assert len(res5.history) == len(res1.history)
    for row1, row5 in zip(res1.history, res5.history):
        assert set(row1) == set(row5)
        for k in row1:
            np.testing.assert_allclose(row5[k], row1[k], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(res5.best_psnr, res1.best_psnr, rtol=1e-5)
    np.testing.assert_array_equal(res5.final_image, res1.final_image)
