"""Round-3 fixes: exact best-PSNR checkpoints for span>1 and ensemble fits
(device-tracked best snapshots, VERDICT r2 #6), per-member ensemble shuffles,
and the opt-in per-epoch train_image logging cadence (reference
functions.py:718-721, VERDICT r2 #9)."""

import dataclasses
import os

import numpy as np

from collision_handling_in_instantngp_tpu.train.trainer import fit, fit_ensemble
from collision_handling_in_instantngp_tpu.utils import checkpoint as ckpt
from collision_handling_in_instantngp_tpu.utils.logging import MetricLogger

from test_trainer import _small_exp, _tiny_data
from test_ensemble import _exps


def _load_best(run_dir):
    return ckpt.load_pytree(os.path.join(run_dir, "whole_model.pkl"))


def _assert_tree_equal(a, b, msg=""):
    flat_a, _ = __import__("jax").tree_util.tree_flatten(a)
    flat_b, _ = __import__("jax").tree_util.tree_flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=msg)


def test_span_fit_checkpoints_exact_best_epoch(rng, tmp_path):
    """span=4 fit() must write the SAME best-epoch checkpoint as span=1 —
    the span program carries the best snapshot on device (reference best-PSNR
    checkpointing, functions.py:761-781)."""
    data = _tiny_data(rng)
    exp1 = _small_exp(tmp_path / "a", epochs=11)
    exp4 = _small_exp(tmp_path / "b", epochs=11)

    r1 = fit(exp1, data, verbose=False, epoch_span=1)
    r4 = fit(exp4, data, verbose=False, epoch_span=4)

    np.testing.assert_allclose(r4.best_psnr, r1.best_psnr, rtol=1e-6)
    _assert_tree_equal(
        _load_best(r1.run_dir), _load_best(r4.run_dir),
        msg="span=4 checkpoint != span=1 best-epoch checkpoint",
    )


def test_ensemble_checkpoints_best_epoch_params(rng, tmp_path):
    """fit_ensemble must checkpoint each member's BEST-PSNR params (round 2
    saved span-end/final params — a documented regression, now fixed)."""
    data = _tiny_data(rng)
    exps = _exps(tmp_path / "e", ids=[4061, 4051], epochs=9)

    ens = fit_ensemble(exps, data, epochs=9, epoch_span=4)
    for exp, r_ens in zip(exps, ens):
        solo = fit(
            dataclasses.replace(
                exp,
                train=dataclasses.replace(
                    exp.train, checkpoint_dir=str(tmp_path / f"s{exp.grid_id}")
                ),
            ),
            data, verbose=False, epoch_span=1,
        )
        np.testing.assert_allclose(
            r_ens.best_psnr, solo.best_psnr, rtol=1e-5,
            err_msg=f"grid {exp.grid_id}",
        )
        a = _load_best(solo.run_dir)
        b = _load_best(r_ens.run_dir)
        flat_a = __import__("jax").tree_util.tree_leaves(a)
        flat_b = __import__("jax").tree_util.tree_leaves(b)
        # vmap batches matmuls differently, so allclose rather than bitwise
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-6,
                err_msg=f"grid {exp.grid_id} best checkpoint",
            )


def test_ensemble_per_member_shuffle_reproduces_solo(rng, tmp_path):
    """With per-member shuffles every lane must reproduce its own solo fit()
    scalars — including members whose seed differs from exps[0]'s (round 2
    broadcast exps[0]'s shuffle, so only lane 0 matched)."""
    data = _tiny_data(rng)
    base = _exps(tmp_path / "s", ids=[4061, 4061], epochs=6)
    exps = [
        dataclasses.replace(
            e,
            train=dataclasses.replace(e.train, seed=seed, save_params=False),
        )
        for e, seed in zip(base, (7, 13))
    ]
    ens = fit_ensemble(exps, data, epochs=6, epoch_span=3)
    for i in range(2):
        solo = fit(exps[i], data, verbose=False)
        np.testing.assert_allclose(
            ens[i].final_loss, solo.final_loss, rtol=1e-5,
            err_msg=f"member {i} (seed {exps[i].train.seed})",
        )
        np.testing.assert_allclose(
            ens[i].best_psnr, solo.best_psnr, rtol=1e-5,
            err_msg=f"member {i}",
        )


class _RecordingLogger(MetricLogger):
    def __init__(self):
        self.rows = []

    def log(self, metrics, step=None):
        self.rows.append((step, dict(metrics)))

    def finish(self):
        pass


def test_log_image_every_epoch_cadence(rng, tmp_path):
    """log_image_every=1 must attach train_image at EVERY epoch (the
    reference's cadence, functions.py:718-721); log_image_every=3 at every
    third — even under span>1 (those epochs become singleton calls)."""
    data = _tiny_data(rng)
    for every, epochs in ((1, 5), (3, 7)):
        exp = _small_exp(tmp_path / f"i{every}", epochs=epochs)
        logger = _RecordingLogger()
        fit(
            exp, data, verbose=False, epoch_span=4, logger=logger,
            log_image_every=every,
        )
        for step, row in logger.rows:
            has = "train_image" in row
            want = step % every == 0 or step % 10 == 0 or step == epochs - 1
            # histogram epochs (rate=10 in _small_exp) and the final epoch
            # also attach the image (existing behavior)
            assert has == want, f"every={every} step={step}: image={has}"
        assert len(logger.rows) == epochs


def test_stream_backend_with_no_hidden_layers(rng, tmp_path):
    """hpd_hidden=() + a streaming backend must route cleanly (params has
    only the head layer; the fused hidden-stack gate used to index
    params[-2] before it could reject the shape)."""
    from collision_handling_in_instantngp_tpu.models import gngf

    data = _tiny_data(rng)
    exp = _small_exp(tmp_path, epochs=2)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model,
            hpd_hidden=(),
            hash_table_size=128,
            hpd_backend="unique_stream_pallas_interpret",
        ),
        train=dataclasses.replace(exp.train, save_params=False),
    )
    res = fit(exp, data, verbose=False)  # IndexError before the fix
    assert np.isfinite(res.final_loss)
