"""Loss parity tests vs torch's KLDivLoss semantics (reference utils.py:78-174).

torch.nn.KLDivLoss(reduction='batchmean') on a 1-D (N,) input divides by N —
that factor is part of the reference's loss scale and must be reproduced."""

import numpy as np
import jax.numpy as jnp
import torch

from collision_handling_in_instantngp_tpu.config import LossConfig
from collision_handling_in_instantngp_tpu.train.loss import (
    _kl_batchmean,
    compute_loss,
    js_kl_divergence,
    marginal_slot_distribution,
)


def _torch_kl_bm(log_p, q):
    return torch.nn.KLDivLoss(reduction="batchmean")(log_p, q).item()


def test_kl_batchmean_matches_torch(rng):
    p = rng.random(64).astype(np.float32)
    p = p / p.sum()
    q = np.full(64, 1 / 64, np.float32)
    ours = float(_kl_batchmean(jnp.log(p), jnp.asarray(q)))
    theirs = _torch_kl_bm(torch.tensor(np.log(p)), torch.tensor(q))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_js_kl_divergence_matches_torch_formula(rng):
    """Reference js_kl_div = -(gamma+eps)*js + eps*kl with the reference's
    argument order (utils.py:122-174)."""
    n = 32
    p = rng.random(n).astype(np.float32)
    p = p / p.sum()
    cfg = LossConfig(gamma=-2.0, epsilon=1.0)

    ours = float(js_kl_divergence(jnp.asarray(p), cfg))

    pt = torch.tensor(p)
    q = torch.full((n,), 1 / n)
    kl = _torch_kl_bm(pt.log(), q)
    m = (pt + q) / 2
    js = (_torch_kl_bm(pt.log(), m) + _torch_kl_bm(q.log(), m)) / 2
    expected = -(cfg.gamma + cfg.epsilon) * js + cfg.epsilon * kl
    np.testing.assert_allclose(ours, expected, rtol=5e-5)


def test_marginal_slot_distribution(rng):
    probs = rng.random((10, 4, 16)).astype(np.float32)
    got = np.asarray(marginal_slot_distribution(jnp.asarray(probs)))
    np.testing.assert_allclose(got, probs.sum((0, 1)) / 40, rtol=1e-6)


def test_compute_loss_total_weighting(rng):
    """total = l_mse*mse + sum_l(l_js_kl*js_kl + l_coll*coll)
    (reference functions.py:243-245)."""
    p, l, v, t = 6, 4, 4, 16
    pred = rng.random((p, 3)).astype(np.float32)
    target = rng.random((p, 3)).astype(np.float32)
    probs = rng.random((p, l, v, t)).astype(np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    prev_coll = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    prev_min = np.array([0.0, 0.0, 10.0, 20.0], np.float32)
    cfg = LossConfig(
        delta=1.0, gamma=-2.0, epsilon=1.0, l_mse=2.0, l_js_kl=10.0,
        l_collisions=0.5,
    )
    aux = compute_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(probs),
        jnp.asarray(prev_coll), jnp.asarray(prev_min), cfg, l,
    )
    np.testing.assert_allclose(
        float(aux.mse), np.mean((pred - target) ** 2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(aux.coll_per_level), prev_coll / (prev_min + 1.0), rtol=1e-6
    )
    expected_total = (
        2.0 * float(aux.mse)
        + np.sum(10.0 * np.asarray(aux.js_kl_per_level)
                 + 0.5 * np.asarray(aux.coll_per_level))
    )
    np.testing.assert_allclose(float(aux.total), expected_total, rtol=1e-5)


def test_vanilla_path_mse_only(rng):
    pred = rng.random((6, 3)).astype(np.float32)
    target = rng.random((6, 3)).astype(np.float32)
    cfg = LossConfig(l_mse=3.0)
    aux = compute_loss(
        jnp.asarray(pred), jnp.asarray(target), None,
        jnp.zeros(4), jnp.zeros(4), cfg, 4,
    )
    np.testing.assert_allclose(
        float(aux.total), 3.0 * np.mean((pred - target) ** 2), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(aux.js_kl_per_level), np.zeros(4))
