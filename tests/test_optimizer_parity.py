"""Optimizer parity vs torch.optim.Adam with the reference's three parameter
groups (functions.py:96-127): per-group lr + L2-into-grad weight decay,
betas=(0.9, 0.99), eps=1e-15, including bias correction. Several steps on
identical params/grads must match torch to fp32 tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from collision_handling_in_instantngp_tpu.config import OptimizerConfig
from collision_handling_in_instantngp_tpu.train.optimizer import make_optimizer


def _params(rng):
    return {
        "tables": jnp.asarray(rng.standard_normal((4, 8, 2)).astype(np.float32)),
        "hpd": [
            {"w": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)),
             "b": jnp.asarray(rng.standard_normal(4).astype(np.float32))},
        ],
        "mlp": [
            {"w": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
             "b": jnp.asarray(rng.standard_normal(3).astype(np.float32))},
        ],
    }


def test_three_group_adam_matches_torch(rng):
    cfg = OptimizerConfig(
        encoding_lr=1e-4, hpd_lr=1e-3, mlp_lr=1e-2,
        encoding_weight_decay=0.0, hpd_weight_decay=1e-6, mlp_weight_decay=1e-4,
    )
    params = _params(rng)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    # torch mirror
    t_tables = torch.tensor(np.asarray(params["tables"]), requires_grad=True)
    t_hpd = [torch.tensor(np.asarray(params["hpd"][0][k]), requires_grad=True)
             for k in ("w", "b")]
    t_mlp = [torch.tensor(np.asarray(params["mlp"][0][k]), requires_grad=True)
             for k in ("w", "b")]
    opt = torch.optim.Adam(
        [
            {"params": [t_tables], "lr": cfg.encoding_lr,
             "weight_decay": cfg.encoding_weight_decay},
            {"params": t_hpd, "lr": cfg.hpd_lr,
             "weight_decay": cfg.hpd_weight_decay},
            {"params": t_mlp, "lr": cfg.mlp_lr,
             "weight_decay": cfg.mlp_weight_decay},
        ],
        betas=(cfg.beta1, cfg.beta2), eps=cfg.eps,
    )

    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(step).standard_normal(x.shape)
                .astype(np.float32)
            ),
            params,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        t_tables.grad = torch.tensor(np.asarray(grads["tables"]))
        t_hpd[0].grad = torch.tensor(np.asarray(grads["hpd"][0]["w"]))
        t_hpd[1].grad = torch.tensor(np.asarray(grads["hpd"][0]["b"]))
        t_mlp[0].grad = torch.tensor(np.asarray(grads["mlp"][0]["w"]))
        t_mlp[1].grad = torch.tensor(np.asarray(grads["mlp"][0]["b"]))
        opt.step()

    np.testing.assert_allclose(
        np.asarray(params["tables"]), t_tables.detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["hpd"][0]["w"]), t_hpd[0].detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["mlp"][0]["w"]), t_mlp[0].detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["mlp"][0]["b"]), t_mlp[1].detach().numpy(), atol=1e-6
    )


def test_frozen_label_zeroes_updates(rng):
    params = _params(rng)
    tx = make_optimizer(OptimizerConfig(), params, freeze_hpd=True)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    for leaf in jax.tree_util.tree_leaves(updates["hpd"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    for leaf in jax.tree_util.tree_leaves(updates["mlp"]):
        assert np.any(np.asarray(leaf) != 0.0)
