"""Training loss: MSE + per-level JS/KL slot-uniformity + collision penalty.

TPU-native equivalent of reference ``Loss`` (utils.py:78-174) and the weighting
applied in the train loop (functions.py:243-245):

  total = l_mse * MSE + sum_l ( l_js_kl * js_kl_l + l_collisions * coll_l )

Semantics reproduced exactly:

  * The slot distribution compared against uniform is the MARGINAL over the
    batch: ``p_l = probs[:, l].sum(pixels).sum(corners) / (P * V)`` — a (N,)
    vector per level (utils.py:138, 159). N = T normally, or K when
    ``keep_topk_only`` (functions.py:230).
  * torch ``KLDivLoss(reduction='batchmean')(input=log p, target=q)`` on a 1-D
    (N,) input computes ``sum(q * (log q - log p)) / N`` — i.e. KL(q || p)
    divided by N. That 1/N factor is part of the reference's numbers and is
    kept (utils.py:86, 144, 168).
  * "js_div" is the reference's variant ``(KL_bm(m || p) + KL_bm(m || q)) / 2``
    with m = (p + q)/2 — note the reference passes ``input=p.log(),
    target=m``, so this is not the textbook JS (utils.py:164-168); reproduced
    as-is.
  * combined: ``js_kl = -(gamma + epsilon) * js + epsilon * kl``
    (utils.py:122-127).
  * The collision term ``collisions / (min_possible + delta)`` uses the
    PREVIOUS epoch's counts and carries no gradient (utils.py:108,
    functions.py:227-234) — it shifts the loss value (early-stop signal), not
    the gradients.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax.scipy.special import xlogy

from ..config import LossConfig


class LossAux(NamedTuple):
    total: jnp.ndarray            # scalar — weighted sum fed to backward
    mse: jnp.ndarray              # scalar
    js_kl_per_level: jnp.ndarray  # (L,) unweighted js_kl divergences
    coll_per_level: jnp.ndarray   # (L,) unweighted collision losses (no grad)


def _kl_batchmean(log_p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.KLDivLoss(reduction='batchmean')(log_p, q) for 1-D inputs:
    sum(q * (log q - log p)) / N. xlogy gives 0 for q==0 entries (torch does
    the same)."""
    n = q.shape[0]
    return jnp.sum(xlogy(q, q) - q * log_p) / n


def marginal_slot_distribution(probs_level: jnp.ndarray) -> jnp.ndarray:
    """(P, V, N) -> (N,) marginal: sum over pixels and corners / (P*V)
    (reference utils.py:138)."""
    p, v, _ = probs_level.shape
    return jnp.sum(probs_level, axis=(0, 1)) / (p * v)


def js_kl_divergence(p_marginal: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """Reference ``js_kl_div`` for one level's marginal (utils.py:122-174)."""
    n = p_marginal.shape[0]
    q = jnp.full((n,), 1.0 / n, dtype=p_marginal.dtype)
    log_p = jnp.log(p_marginal)
    kl = _kl_batchmean(log_p, q)
    m = (p_marginal + q) / 2.0
    js = (_kl_batchmean(log_p, m) + _kl_batchmean(jnp.log(q), m)) / 2.0
    return -(cfg.gamma + cfg.epsilon) * js + cfg.epsilon * kl


def compute_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    probs: Optional[jnp.ndarray],
    prev_collisions: jnp.ndarray,
    prev_min_possible: jnp.ndarray,
    cfg: LossConfig,
    num_levels: int,
    marginals: Optional[jnp.ndarray] = None,
    valid_rows: Optional[jnp.ndarray] = None,
) -> LossAux:
    """Full training loss for one batch (reference utils.py:91-120 +
    functions.py:243-245).

    Args:
      pred/target: (P, C) in [0, 1].
      probs: dense (P, L, V, N) loss probabilities (N=T, or K under
        keep_topk_only), or None on the vanilla-hash path (loss reduces to
        MSE, utils.py:103-104) and on the fused path.
      marginals: pre-reduced (L, N) marginal distributions (the fused HPD
        path emits these directly, ops/fused_hpd.py) — mutually exclusive
        with ``probs``.
      prev_collisions / prev_min_possible: (L,) previous-epoch collision stats
        (constants; pass zeros for epoch 0 — the reference adds a constant 1
        instead, functions.py:245, which shifts the loss value by L without
        touching gradients; we use the sane zero form and document it).
      valid_rows: scalar count of valid leading rows; rows >= valid_rows are
        static padding (the duplicated tail of build_epoch_batches) and are
        masked out of the MSE so padded pixels carry no extra gradient weight
        (the reference instead DROPS the remainder, functions.py:183-194 —
        our masked form trains every pixel exactly once per epoch). The JS/KL
        marginal still averages over all rows: the <num_batches-1 duplicated
        rows are genuine pixels and shift the (P*V)-row marginal by O(1e-5).
        None = all rows valid.
    """
    if valid_rows is None:
        mse = jnp.mean((pred - target) ** 2)
    else:
        mask = (
            jnp.arange(pred.shape[0]) < valid_rows
        ).astype(pred.dtype)[:, None]
        sq = (pred - target) ** 2 * mask
        denom = jnp.asarray(valid_rows, pred.dtype) * pred.shape[-1]
        mse = jnp.sum(sq) / denom
    if probs is None and marginals is None:
        zeros = jnp.zeros((num_levels,), dtype=mse.dtype)
        return LossAux(
            total=cfg.l_mse * mse, mse=mse, js_kl_per_level=zeros,
            coll_per_level=zeros,
        )

    coll = prev_collisions / (prev_min_possible + cfg.delta)      # (L,) no grad
    if marginals is None:
        num_levels = probs.shape[1]
        marginals = jnp.stack(
            [marginal_slot_distribution(probs[:, l]) for l in range(num_levels)]
        )
    else:
        num_levels = marginals.shape[0]
    js_kls = jnp.stack(
        [js_kl_divergence(marginals[l], cfg) for l in range(num_levels)]
    )
    total = cfg.l_mse * mse + jnp.sum(
        cfg.l_js_kl * js_kls + cfg.l_collisions * coll
    )
    return LossAux(total=total, mse=mse, js_kl_per_level=js_kls, coll_per_level=coll)
