"""Three-group Adam optimizer.

TPU-native equivalent of reference ``get_optimizer`` (functions.py:96-127):
torch.Adam with betas=(0.9, 0.99), eps=1e-15 (InstantNGP-style) and three
parameter groups with separate lr / weight_decay:

  encoding tables  lr=1e-4,  wd=0      (params.py:37, 39)
  HPD              lr=grid,  wd=1e-6   (params.py:40)
  MLP decoder      lr=grid,  wd=1e-6   (params.py:41)

torch Adam applies weight decay as L2-into-grad (grad += wd * param) BEFORE the
moment updates — optax.add_decayed_weights before scale_by_adam reproduces that
exactly (including bias correction and eps-after-sqrt placement).

BatchNorm params (when enabled) are NOT in any reference optimizer group
(functions.py:108-126 passes only encoding/HPD/mlp) — they get a frozen
(zero-update) label. Loading a pretrained HPD freezes it the same way
(reference models.py:363-372).
"""

from __future__ import annotations

import jax
import optax

from ..config import OptimizerConfig


def _group_tx(lr: float, wd: float, cfg: OptimizerConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        optax.scale(-lr),
    )


def param_labels(params: dict, freeze_hpd: bool = False) -> dict:
    """Label pytree matching the model params: leaf -> group name."""
    labels = {}
    for key in params:
        if key == "tables":
            label = "encoding"
        elif key == "hpd":
            label = "frozen" if freeze_hpd else "hpd"
        elif key == "mlp":
            label = "mlp"
        else:  # batchnorm etc. — never optimized by the reference
            label = "frozen"
        labels[key] = jax.tree_util.tree_map(lambda _: label, params[key])
    return labels


def make_optimizer(
    cfg: OptimizerConfig, params: dict, freeze_hpd: bool = False
) -> optax.GradientTransformation:
    transforms = {
        "encoding": _group_tx(cfg.encoding_lr, cfg.encoding_weight_decay, cfg),
        "hpd": _group_tx(cfg.hpd_lr, cfg.hpd_weight_decay, cfg),
        "mlp": _group_tx(cfg.mlp_lr, cfg.mlp_weight_decay, cfg),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, param_labels(params, freeze_hpd))
