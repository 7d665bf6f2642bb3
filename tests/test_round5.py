"""Round-5 additions: explicit grid-id lists in the sweep driver (full-budget
re-ranking of screening winners), effective-config dedup, and the streaming
tail's cost-decomposition probe rungs."""

import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.train.grid_search import (
    run_grid_search,
)

from test_trainer import _small_exp, _tiny_data


def test_grid_driver_explicit_id_list(rng, tmp_path):
    """ids=[...] runs exactly those configs (rerank_top's path), equivalent
    to the contiguous-range rows for the same ids."""
    data = _tiny_data(rng)
    base = _small_exp(tmp_path, epochs=4)
    r_ids = run_grid_search(
        data, ids=[4062, 4060], base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "mi.jsonl"), verbose=False,
    )
    assert [r["grid_id"] for r in r_ids] == [4062, 4060]
    r_range = run_grid_search(
        data, 4060, 4063, base_model=base.model, base_train=base.train,
        manifest_path=str(tmp_path / "mr.jsonl"), verbose=False,
    )
    by_id = {r["grid_id"]: r for r in r_range}
    for r in r_ids:
        np.testing.assert_allclose(
            r["best_psnr"], by_id[r["grid_id"]]["best_psnr"], rtol=1e-6
        )

    with pytest.raises(ValueError, match="out of bounds"):
        run_grid_search(data, ids=[48001], base_model=base.model,
                        base_train=base.train, manifest_path=None,
                        verbose=False)


def test_effective_key_collapses_known_noop_axes():
    """grid_leaderboard.effective_key: l_collisions-only groups (gradient-free
    constant) and gamma-under-l_js_kl=0 groups collapse; configs differing in
    a live axis do not."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from grid_leaderboard import effective_key

    # 3842/3862/3882/3902 differ only in l_collisions (verified identical
    # screening PSNRs in evidence/grid_demor4grid_manifest.jsonl)
    keys = {effective_key(i) for i in (3842, 3862, 3882, 3902)}
    assert len(keys) == 1
    # 4061 differs from 3842 in several live axes
    assert effective_key(4061) not in keys


def test_fused_probe_rungs_match_dense(rng):
    """The dots/softmax probe rungs (sweep_probe's measurement substrate)
    reproduce the dense logits sum and the online-softmax (m, s)."""
    import jax.numpy as jnp

    from collision_handling_in_instantngp_tpu.ops.pallas import (
        hpd_stream as hs,
    )

    u, hd, t = 96, 8, 4096
    h = jnp.asarray(rng.normal(size=(u, hd)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hd, t)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, t)), jnp.float32)
    logits = h @ w + b
    m, s = hs.hpd_stream_fused_probe(h, w, b, "highest", "softmax",
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(m)[:, 0], np.asarray(logits.max(-1)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s)[:, 0],
        np.asarray(jnp.exp(logits - logits.max(-1, keepdims=True)).sum(-1)),
        rtol=1e-5,
    )
    md, _ = hs.hpd_stream_fused_probe(h, w, b, "highest", "dots",
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(md)[:, 0], np.asarray(logits.sum(-1)), rtol=1e-4
    )


def test_collision_loss_term_is_gradient_inert(rng, tmp_path):
    """The collision-loss term is a constant computed from the PREVIOUS
    epoch's counts under no-grad (reference utils.py:108; train/loss.py) —
    zeroing l_collisions must leave the parameter trajectory bit-identical,
    with only the logged total loss shifted by the dropped constant. This is
    the mechanism claim behind the round-5 scaled ablation
    (tools/mechanism_study.py --diff), pinned here at test scale."""
    import dataclasses

    from collision_handling_in_instantngp_tpu.train.trainer import fit

    data = _tiny_data(rng)
    base = _small_exp(tmp_path / "a", epochs=12)
    res_full = fit(base, data, verbose=False)
    arm = dataclasses.replace(
        base,
        loss=dataclasses.replace(base.loss, l_collisions=0.0),
        train=dataclasses.replace(
            base.train, checkpoint_dir=str(tmp_path / "b" / "weights")
        ),
    )
    res_arm = fit(arm, data, verbose=False)
    assert len(res_full.history) == len(res_arm.history) == 12
    for rf, ra in zip(res_full.history, res_arm.history):
        # bitwise: the gradient paths are identical programs
        assert rf["train_psnr"] == ra["train_psnr"]
        assert rf["mse_loss"] == ra["mse_loss"]
        for l in range(base.model.num_levels):
            assert rf[f"collisions_level{l}"] == ra[f"collisions_level{l}"]
    # total loss differs by exactly the weighted collision constant
    lw = base.loss.l_collisions
    for rf, ra in zip(res_full.history, res_arm.history):
        const = sum(
            rf[f"collisions_loss_level{l}"]
            for l in range(base.model.num_levels)
        )
        np.testing.assert_allclose(
            rf["train_loss"] - ra["train_loss"], lw * const,
            rtol=1e-5, atol=1e-7,
        )
