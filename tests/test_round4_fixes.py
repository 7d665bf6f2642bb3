"""Round-4 regression pins.

1. fit(epoch_span>1, save_params=False) must not crash: make_jitted returns a
   uniform 5-tuple regardless of track_best (VERDICT r3 weak #1 — the span
   fn returned 4 values when track_best=False while the trainer unpacked 5).
2. encoding_lr as a dynamic HyperParam: the vmapped ensemble path rescales
   the "tables" param-tree key (NOT a group literally named "encoding" — the
   update tree is keyed by param keys, optimizer.param_labels), and matches
   the static-optimizer path bitwise at the default lr.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.data import make_shuffle_permutations
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.train.train_step import (
    HyperParams,
    build_epoch_batches,
    make_epoch_fn,
)


def _tiny_exp(**opt):
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, num_levels=2, hash_table_size=32, n_min=4, n_max=8,
        ),
    )
    if opt:
        exp = dataclasses.replace(
            exp, optimizer=dataclasses.replace(exp.optimizer, **opt)
        )
    return exp


def _data(exp, p=64):
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)
    coords = np.stack(
        np.meshgrid(np.arange(8), np.arange(8), indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float32)
    targets = img.reshape(-1, 3)
    statics = gngf.make_statics(exp.model)
    shuf, _ = make_shuffle_permutations(p, exp.train.seed, True)
    batches = build_epoch_batches(
        coords, targets, exp.train.batch_fraction, shuf, og_image=img,
        model_cfg=exp.model, statics=statics,
    )
    return statics, batches


def test_span_fn_uniform_arity_without_track_best():
    exp = _tiny_exp()
    statics, batches = _data(exp)
    init_state, mk = make_epoch_fn(exp, statics)
    st, tx = init_state(jax.random.PRNGKey(0))
    fn = mk(tx, 64, span=3, track_best=False)
    st, scal, img, idx, best = fn(st, batches)
    assert best is None
    assert scal.loss.shape == (3,)
    fn_b = mk(tx, 64, span=3, track_best=True)
    st2, scal2, img2, idx2, best2 = fn_b(st, batches)
    assert best2 is not None and jnp.isfinite(best2[0])


def test_dynamic_encoding_lr_matches_static_and_scales_tables():
    exp = _tiny_exp()
    statics, batches = _data(exp)

    def run(dynamic, encoding_lr):
        e = _tiny_exp(encoding_lr=encoding_lr)
        init_state, mk = make_epoch_fn(e, statics, dynamic_hypers=dynamic)
        st, tx = init_state(jax.random.PRNGKey(0))
        fn = mk(tx, 64)
        h = HyperParams.from_exp(e) if dynamic else None
        for _ in range(2):
            st, m, _ = fn(st, batches, hypers=h)
        return jax.device_get(st.params)

    p_static = run(False, 1e-4)
    p_dyn = run(True, 1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_static), jax.tree_util.tree_leaves(p_dyn)
    ):
        np.testing.assert_array_equal(a, b)

    # a different dynamic encoding_lr must actually reach the tables
    p_hot = run(True, 1e-2)
    assert not np.allclose(p_hot["tables"], p_dyn["tables"])


def test_oracle_tqdm_fallback_parses_per_epoch_psnr(tmp_path):
    """tools/summarize_oracle.tqdm_bests recovers best-PSNR-at-budget from
    the reference's committed console logs. The seed comes from the FILENAME,
    not the in-log banner: the reference hardcodes random_seed=2**16-1 at
    import time so every banner reads 65535 regardless of the seed trained
    (ADVICE r4 medium — the banner-parsing version silently attributed other
    seeds' curves to 65535)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "summarize_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "summarize_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bar = (
        "Random seed: 65535\nDevice: cuda\n"  # banner always 65535 upstream
        "Training_psnr: 7.25:   0%|          | 1/450 [00:16<2:06:53, 16.9s/it]"
        "Training_psnr: 9.50:  44%|████▍     | 200/450 [50:00<1:00:00, 15s/it]"
        "Training_psnr: 8.75: 100%|██████████| 450/450 [1:50:00<00:00, 15s/it]"
    )
    log9 = tmp_path / "reference_cold_seed9.log"
    log9.write_text(bar)
    # seed from filename (banner says 65535); best at 450 is 9.50, not the
    # final 8.75; at budget 100 only the epoch-1 value is <=100 -> 7.25
    assert dict(mod.tqdm_bests(str(log9), 450)) == {9: 9.50}
    assert dict(mod.tqdm_bests(str(log9), 100)) == {9: 7.25}
    # budget-suffixed logs (r5_oracle.sh) parse the same way
    log11 = tmp_path / "reference_cold_seed11_e1000.log"
    log11.write_text(
        "Random seed: 65535\nDevice: cuda\n"
        "Training_psnr: 6.00:  11%|█         | 50/450 [12:00<1:40:00, 15s/it]"
    )
    assert dict(mod.tqdm_bests(str(log11), 50)) == {11: 6.00}
    # incomplete at budget 450 -> excluded
    assert dict(mod.tqdm_bests(str(log11), 450)) == {}
    # the aggregate cpu log has no seed in its name -> never parsed
    cpu = tmp_path / "reference_cold_cpu.log"
    cpu.write_text(bar)
    assert dict(mod.tqdm_bests(str(cpu), 450)) == {}
