"""Vmapped same-shape config ensembles (trainer.fit_ensemble): E configs
training side by side must reproduce each config's individual fit() scalars."""

import dataclasses

import numpy as np

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.train.trainer import fit, fit_ensemble

from test_trainer import _small_exp, _tiny_data


def _exps(tmp_path, ids, epochs):
    base = _small_exp(tmp_path, epochs=epochs)
    out = []
    for i in ids:
        e = experiment_from_grid_id(i)
        e = dataclasses.replace(e, model=base.model, train=base.train)
        out.append(e)
    return out


def test_ensemble_matches_individual_fits(rng, tmp_path):
    data = _tiny_data(rng)
    # same shape class (topk_k=4), different loss weights/lrs/gamma
    exps = _exps(tmp_path / "e", ids=[4061, 4051, 3961], epochs=9)

    ens = fit_ensemble(exps, data, epochs=9, epoch_span=4)

    for exp, r_ens in zip(exps, ens):
        solo = fit(
            dataclasses.replace(
                exp,
                train=dataclasses.replace(
                    exp.train, save_params=False
                ),
            ),
            data, verbose=False,
        )
        np.testing.assert_allclose(
            r_ens.best_psnr, solo.best_psnr, rtol=1e-5,
            err_msg=f"grid {exp.grid_id}",
        )
        np.testing.assert_allclose(
            r_ens.final_loss, solo.final_loss, rtol=1e-5,
            err_msg=f"grid {exp.grid_id}",
        )
        assert r_ens.epochs_run == solo.epochs_run == 9
        # vmap batches the matmuls differently; after several epochs the fp
        # divergence amplifies through training, so the uint8 images agree
        # only to +-1-2 counts (a single-config 1-epoch ensemble is exact)
        diff = np.abs(
            r_ens.final_image.astype(np.int32)
            - solo.final_image.astype(np.int32)
        )
        assert r_ens.final_image.shape == solo.final_image.shape
        assert diff.mean() < 2.0


def test_ensemble_seed_variation(rng, tmp_path):
    """Same grid id, different seeds: the ensemble axis carries init
    randomness AND (per_member_shuffle default) each member's own pixel
    shuffle, so every lane reproduces its solo run exactly and different
    seeds are genuinely distinct runs."""
    data = _tiny_data(rng)
    base = _exps(tmp_path / "s", ids=[4061, 4061], epochs=5)
    exps = [
        dataclasses.replace(
            e,
            train=dataclasses.replace(
                e.train, seed=seed, save_params=False
            ),
        )
        for e, seed in zip(base, (1, 2))
    ]
    ens = fit_ensemble(exps, data, epochs=5, epoch_span=5)
    assert ens[0].final_loss != ens[1].final_loss  # genuinely different runs
    solo = fit(exps[0], data, verbose=False)
    np.testing.assert_allclose(ens[0].final_loss, solo.final_loss, rtol=1e-5)


def test_grid_driver_ensemble_matches_per_config(rng, tmp_path):
    from collision_handling_in_instantngp_tpu.train.grid_search import (
        run_grid_search,
    )

    data = _tiny_data(rng)
    base = _small_exp(tmp_path, epochs=5)
    r_ens = run_grid_search(
        data, 4060, 4064, base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "me.jsonl"), verbose=False,
        ensemble_size=2, epoch_span=5,
    )
    r_solo = run_grid_search(
        data, 4060, 4064, base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "ms.jsonl"), verbose=False,
    )
    by_id_e = {r["grid_id"]: r for r in r_ens}
    by_id_s = {r["grid_id"]: r for r in r_solo}
    assert set(by_id_e) == set(by_id_s)
    for gid in by_id_s:
        np.testing.assert_allclose(
            by_id_e[gid]["best_psnr"], by_id_s[gid]["best_psnr"], rtol=1e-4
        )
        assert by_id_e[gid]["epochs_run"] == by_id_s[gid]["epochs_run"]


def test_ensemble_early_stop_epochs_run_matches_solo(rng, tmp_path):
    """A member whose loss-stopper fires mid-run must report the SAME
    epochs_run / stopped_early as its solo fit() (the stop epoch used to be
    recorded in dead code, so manifests showed the whole group's epoch
    count). min_delta=1e9 makes every improving epoch a 'stall' (reference
    utils.py:185-194 quirk), so tolerance=3 fires deterministically early."""
    data = _tiny_data(rng)
    base = _exps(tmp_path / "es", ids=[4061, 4051], epochs=12)
    exps = [
        dataclasses.replace(
            e,
            train=dataclasses.replace(
                e.train, tolerance=3, min_delta=1e9, save_params=False
            ),
        )
        for e in base
    ]
    ens = fit_ensemble(exps, data, epochs=12, epoch_span=4)
    for exp, r_ens in zip(exps, ens):
        solo = fit(exp, data, verbose=False)
        assert solo.stopped_early, "test premise: the stopper must fire"
        assert r_ens.stopped_early == solo.stopped_early
        assert r_ens.epochs_run == solo.epochs_run, (
            f"grid {exp.grid_id}: ensemble {r_ens.epochs_run} "
            f"!= solo {solo.epochs_run}"
        )
        np.testing.assert_allclose(
            r_ens.best_psnr, solo.best_psnr, rtol=1e-5
        )
