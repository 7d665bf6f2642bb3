"""Compile-sharing grid sweeps: fit() with an EpochFnCache (loss weights/lrs
as runtime HyperParams scalars) must train bitwise-equivalently to the
per-config-constants path, and same-shape configs must share one jitted
program."""

import dataclasses

import numpy as np

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.train.trainer import EpochFnCache, fit
from collision_handling_in_instantngp_tpu.train.grid_search import (
    run_grid_search,
)

from test_trainer import _small_exp, _tiny_data


def test_dynamic_hypers_match_static(rng, tmp_path):
    data = _tiny_data(rng)
    exp = _small_exp(tmp_path / "s", epochs=8)
    res_static = fit(exp, data, verbose=False)

    exp2 = dataclasses.replace(
        exp,
        train=dataclasses.replace(exp.train, checkpoint_dir=str(tmp_path / "d")),
    )
    res_dyn = fit(exp2, data, verbose=False, epoch_fn_cache=EpochFnCache())

    for r1, r2 in zip(res_static.history, res_dyn.history):
        for k in r1:
            np.testing.assert_allclose(r2[k], r1[k], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res_dyn.best_psnr, res_static.best_psnr,
                               rtol=1e-6)


def test_cache_shared_across_loss_weight_configs(rng, tmp_path):
    """Configs differing only in loss weights / lrs share ONE cache entry and
    still reproduce their per-config (uncached) results."""
    data = _tiny_data(rng)
    base = _small_exp(tmp_path / "x", epochs=6)
    cache = EpochFnCache()

    # three grid ids with the same shapes (topk_k=4) but different loss
    # weights / lrs / gamma
    ids = [4061, 4051, 3961]
    exps = []
    for i in ids:
        e = experiment_from_grid_id(i)
        e = dataclasses.replace(e, model=base.model, train=base.train)
        exps.append(e)
    assert len({(x.loss, x.optimizer) for x in exps}) == 3  # genuinely differ

    cached, uncached = [], []
    for e in exps:
        cached.append(fit(e, data, verbose=False, epoch_fn_cache=cache))
    assert len(cache.entries) == 1  # one shape class -> one program
    for e in exps:
        uncached.append(fit(e, data, verbose=False))
    for rc, ru in zip(cached, uncached):
        for row_c, row_u in zip(rc.history, ru.history):
            for k in row_u:
                np.testing.assert_allclose(
                    row_c[k], row_u[k], rtol=1e-6, atol=1e-8
                )


def test_grid_driver_compile_cache_results_match(rng, tmp_path):
    data = _tiny_data(rng)
    base = _small_exp(tmp_path, epochs=5)
    r_cached = run_grid_search(
        data, 4060, 4063, base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "m1.jsonl"), verbose=False,
        compile_cache=True,
    )
    r_plain = run_grid_search(
        data, 4060, 4063, base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "m2.jsonl"), verbose=False,
        compile_cache=False,
    )
    for a, b in zip(r_cached, r_plain):
        assert a["grid_id"] == b["grid_id"]
        np.testing.assert_allclose(a["best_psnr"], b["best_psnr"], rtol=1e-6)
        np.testing.assert_allclose(a["final_loss"], b["final_loss"], rtol=1e-6)
