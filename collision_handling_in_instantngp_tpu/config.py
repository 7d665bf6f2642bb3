"""Typed configuration system.

Replaces the reference's module-level-global flag system (`params.py:1-75`, wildcard
imported everywhere) with frozen dataclasses. Every field documents the reference
global it mirrors. Tri-state booleans of the reference (`should_inplace_scatter`,
`should_softmax_topk_features` — reference models.py:30-35, 212-217) become enums.

The grid-search space (reference params.py:58-75) and its constraint filtering /
dedup (reference functions.py:452-474) are reproduced exactly so that config ids are
interchangeable with the reference's ``-s/-e`` numbering (48,000 filtered configs;
id 4061 is the README's best run).
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
from typing import Any, Dict, List, Optional, Sequence, Tuple


class TopkBlendMode(enum.Enum):
    """How top-k looked-up features are blended (reference models.py:212-217).

    RAW_SUM      -> reference ``should_softmax_topk_features = None``:
                    ``sum(looked_up * topk_probs)``
    SOFTMAX_AVG  -> reference ``True`` (default):
                    ``sum(looked_up * softmax(topk_probs))``
    WEIGHTED_AVG -> reference ``False``:
                    ``sum(looked_up * topk_probs) / sum(topk_probs)``
    """

    RAW_SUM = "raw_sum"
    SOFTMAX_AVG = "softmax_avg"
    WEIGHTED_AVG = "weighted_avg"


class TopkScatterMode(enum.Enum):
    """Backward mode of the straight-through top-k (reference models.py:27-42).

    SCATTER -> grad_values scattered into a zeros tensor over the full slot axis
               (reference ``should_inplace_scatter`` True and False variants — both
               compute the same function; the in/out-of-place distinction is a torch
               memory detail with no numerical meaning in JAX).
    NOOP    -> reference ``should_inplace_scatter = None``: the out-of-place scatter
               result is discarded (models.py:31), so the backward returns all-zeros.
               Kept only for behavioral parity experiments.
    """

    SCATTER = "scatter"
    NOOP = "noop"


class HiddenActivation(enum.Enum):
    """MLP decoder hidden activation (reference params.py:17, models.py:388)."""

    RELU = "relu"
    LEAKY_RELU = "leaky_relu"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyper-parameters (reference params.py:26-35 defaults)."""

    input_dim: int = 2
    hash_table_size: int = 2**8            # reference params.py:26-27 (T = 2**exp)
    num_levels: int = 4                    # params.py:28
    n_min: int = 8                         # params.py:29
    n_max: int = 32                        # params.py:30
    feature_dim: int = 2                   # params.py:31
    mlp_hidden: Tuple[int, ...] = (64, 64)         # params.py:33
    hpd_hidden: Tuple[int, ...] = (32, 64, 128)    # params.py:34
    topk_k: int = 4                        # grid axis "topk_k" (params.py:74)
    out_channels: int = 3                  # 3 RGB / 1 BW (models.py:382)
    use_hash_function: bool = False        # params.py:20 should_use_hash_function
    keep_topk_only: bool = False           # grid axis should_keep_topk_only
    batchnorm_input: bool = False          # params.py:5 should_batchnorm_data
    hidden_activation: HiddenActivation = HiddenActivation.RELU  # params.py:17
    topk_blend: TopkBlendMode = TopkBlendMode.SOFTMAX_AVG        # params.py:14
    topk_scatter: TopkScatterMode = TopkScatterMode.SCATTER      # params.py:11
    # MXU matmul precision: "highest" = true fp32 (reference-parity; torch
    # trains in fp32), "default" = fast bf16-multiply/fp32-accumulate passes.
    matmul_precision: str = "highest"
    # None (default) = exact top-k (reference parity). A float in (0, 1)
    # switches the streamed fused-HPD paths to the TPU-native
    # lax.approx_max_k partial-reduction with that recall target —
    # measured ~14x faster than exact top-k over T=2^14 lanes (opt-in:
    # approximate candidate selection changes training trajectories)
    topk_approx_recall: Optional[float] = None
    # Fused HPD tail (ops/fused_hpd.py): stream softmax+topk+marginal over row
    # chunks instead of materializing the dense (P, L, V, T) probs tensor.
    # False = dense reference path (the parity oracle).
    fused_hpd: bool = True
    # Unique-vertex deduplication (ops/dedup.py): evaluate the HPD + top-k +
    # table blend once per unique integer grid vertex ((n_max+2)^d points,
    # shared across levels) and gather per pixel — mathematically identical
    # (count-weighted gradients) to the reference's per-row evaluation with
    # >500x less index-network work. Auto-disabled for batchnormed inputs
    # (vertex coords become step-dependent) and for hash-path configs.
    # False = per-row reference-structured paths (the parity oracles).
    dedup_vertices: bool = True
    # Fused-tail backend: "auto" (Pallas kernel on TPU for small K, streaming
    # lax.scan otherwise), "jax", "pallas", "pallas_interpret".
    hpd_backend: str = "auto"
    # Cell-table per-pixel gather under active-vertex compaction: fetch each
    # (pixel, level)'s 2x2 corner patch as ONE (V*F)-wide row from a per-batch
    # compact cell table instead of V narrow per-vertex rows — 4x fewer,
    # 4x wider gather rows (TPU gathers are row-granular and crawl on 8-byte
    # rows). Default ON since round 3: it only engages where active-vertex
    # compaction does (scaled-type geometries — flagship grids never compact,
    # so this cannot regress them) and measured 239 -> 200 ms/batch at the
    # scaled config (evidence/hw_r3_ablate.log ablate --cell-gather).
    dedup_cell_gather: bool = True

    @property
    def num_corners(self) -> int:
        """V = 2^d voxel corners (reference models.py:322)."""
        return 2**self.input_dim

    @property
    def encoded_dim(self) -> int:
        """MLP decoder input width: L*F, level-major (reference models.py:382, 651)."""
        return self.num_levels * self.feature_dim


def instantngp_scaled_model(**overrides) -> "ModelConfig":
    """InstantNGP-paper-scale preset (BASELINE.json config 4: scaled hash
    table stressing gather/scatter and HBM footprint): T=2^14, 16 levels,
    resolutions 16..512. The reference exposes these via params.py:26-31."""
    base = dict(
        hash_table_size=2**14,
        num_levels=16,
        n_min=16,
        n_max=512,
        feature_dim=2,
    )
    base.update(overrides)
    return ModelConfig(**base)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss hyper-parameters (reference utils.py:78-127, functions.py:532-535).

    gamma/epsilon resolution given the grid axes (reference functions.py:532-535):
      - sum_js_kl_div=True : gamma = grid value, epsilon = 1    ("JS+KLDiv")
      - else, js_div=True  : gamma = -1, epsilon = 0            ("JSDiv")
      - else               : gamma = -1, epsilon = 1            ("KLDiv")
    """

    delta: float = 1.0                 # collision-loss denominator offset (utils.py:108)
    gamma: float = -1.0
    epsilon: float = 1.0
    l_mse: float = 1.0                 # loss weights (functions.py:243-245)
    l_js_kl: float = 1.0
    l_collisions: float = 1.0

    @staticmethod
    def resolve_gamma_epsilon(
        should_sum_js_kl_div: bool, should_js_div: bool, loss_gamma: float
    ) -> Tuple[float, float]:
        """Reference functions.py:532-535."""
        gamma = loss_gamma if should_sum_js_kl_div else -1.0
        epsilon = 1.0 if should_sum_js_kl_div else (0.0 if should_js_div else 1.0)
        return float(gamma), float(epsilon)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Three-group Adam (reference functions.py:96-127, params.py:37-41)."""

    encoding_lr: float = 1e-4              # params.py:37
    hpd_lr: float = 1e-3                   # grid axis HPD_lr
    mlp_lr: float = 1e-3                   # grid axis MLP_lr
    encoding_weight_decay: float = 0.0     # params.py:39
    hpd_weight_decay: float = 1e-6         # params.py:40
    mlp_weight_decay: float = 1e-6         # params.py:41
    beta1: float = 0.9                     # functions.py:104
    beta2: float = 0.99
    eps: float = 1e-15                     # functions.py:105 (InstantNGP-style)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop parameters (reference params.py:43-51, functions.py:139-194)."""

    batch_fraction: float = 1.0 / 3.0      # params.py:43 batch_size
    epochs: int = 5000                     # params.py:45
    tolerance: int = 500                   # params.py:47 (early stop)
    min_delta: float = 1e-6                # params.py:48
    histograms_rate: int = 100             # params.py:50
    shuffle_pixels: bool = True            # grid axis should_shuffle_pixels
    seed: int = 2**16 - 1                  # functions.py:43-47
    save_params: bool = True               # params.py:2
    zero_collision_abort: bool = True      # functions.py:682-688
    checkpoint_dir: str = "weights"
    # Min seconds between checkpoint WRITES. The reference writes 5 files on
    # every new-best-PSNR epoch (functions.py:761-781) — early training
    # improves every epoch, so that is a disk write per epoch. Best-PSNR
    # semantics are preserved exactly (the best params are kept on device and
    # always flushed at run end); only write frequency is throttled. 0 =
    # reference behavior.
    checkpoint_min_interval_s: float = 10.0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """One fully-resolved run = model + loss + optimizer + training."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    grid_id: Optional[int] = None          # id into the 48,000-config enumeration

    def as_flat_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for group_name in ("model", "loss", "optimizer", "train"):
            group = getattr(self, group_name)
            for f in dataclasses.fields(group):
                v = getattr(group, f.name)
                out[f"{group_name}.{f.name}"] = v.value if isinstance(v, enum.Enum) else v
        out["grid_id"] = self.grid_id
        return out


def reference_wandb_config(
    exp: "ExperimentConfig",
    image_name: str = "strawberry",
    grid_params: Optional[Dict[str, Any]] = None,
    bw: bool = False,
) -> Dict[str, Any]:
    """The reference's 33-key wandb run-config schema (functions.py:597-634),
    rebuilt from a resolved ExperimentConfig so external dashboards keyed on
    the reference's names keep working."""
    m, lo, op, tr = exp.model, exp.loss, exp.optimizer, exp.train
    if grid_params is None and exp.grid_id is not None:
        grid_params = get_grid_search_configs()[exp.grid_id]
    if lo.epsilon == 0.0:
        loss_type = "JSDiv"
    elif lo.gamma == -1.0 and lo.epsilon == 1.0:
        loss_type = "KLDiv"
    else:
        loss_type = "JS+KLDiv"
    avg_topk = {
        TopkBlendMode.SOFTMAX_AVG: "softmax_avg",
        TopkBlendMode.WEIGHTED_AVG: "weighted_avg",
        TopkBlendMode.RAW_SUM: None,
    }[m.topk_blend]
    return {
        "id_grid_search_params": exp.grid_id,
        "grid_search_params": grid_params,
        "random_seed": tr.seed,
        "HPD_learning_rate": op.hpd_lr,
        "encoding_learning_rate": op.encoding_lr,
        "MLP_learning_rate": op.mlp_lr,
        "encoding_weight_decay": op.encoding_weight_decay,
        "HPD_weight_decay": op.hpd_weight_decay,
        "MLP_weight_decay": op.mlp_weight_decay,
        "batch_size%": tr.batch_fraction,
        "shuffled_pixels": tr.shuffle_pixels,
        "normalized_data": True if not m.batchnorm_input else "BatchNorm1d",
        "architecture": "GeneralNeuralGaugeFields",
        "dataset": image_name,
        "epochs": tr.epochs,
        "color": "RGB" if not bw else "BW",
        "hash_table_size": m.hash_table_size,
        "num_levels": m.num_levels,
        "n_min": m.n_min,
        "n_max": m.n_max,
        "MLP_hidden_layers_widths": str(list(m.mlp_hidden)),
        "HPD_hidden_layers_widths": str(list(m.hpd_hidden)),
        "HPD_out_features": m.hash_table_size,
        "feature_dim": m.feature_dim,
        "topk_k": m.topk_k,
        "loss_type": loss_type,
        "loss_lambda_MSE": lo.l_mse,
        "loss_lambda_JS_KL": lo.l_js_kl,
        "loss_lambda_collisions": lo.l_collisions,
        "loss_gamma": lo.gamma,
        "loss_epsilon": lo.epsilon,
        "inplace_scatter": (
            True if m.topk_scatter is TopkScatterMode.SCATTER else None
        ),
        "MLP_activations": (
            "LeakyReLU"
            if m.hidden_activation is HiddenActivation.LEAKY_RELU
            else "ReLU"
        ),
        "collisions_loss_probs": (
            "topk_only" if m.keep_topk_only else "hash_table_size"
        ),
        "avg_topk_features": avg_topk,
        "hash_type": "HPD" if not m.use_hash_function else "hash_function",
    }


# --------------------------------------------------------------------------- #
# Grid search enumeration — byte-for-byte reproduction of the reference ids.  #
# --------------------------------------------------------------------------- #

# Reference params.py:58-75. Key ORDER matters: ids come from itertools.product
# over this dict's values in insertion order.
GRID_SEARCH_AXES: Dict[str, List[Any]] = {
    "should_shuffle_pixels": [True, False],
    "should_keep_topk_only": [False, True],
    "should_sum_js_kl_div": [False, True],
    "loss_gamma": [-2, -3, -0.5, 0],
    "should_js_div": [False, True],
    "l_mse": [1, 1e1, 1e2, 1e3, 5e2],
    "l_js_kl": [1, 1e1, 1e2, 1e3, 5e2],
    "l_collisions": [1, 1e-1, 1e-2, 1e-3],
    "MLP_lr": [1e-3, 1e-4],
    "HPD_lr": [1e-3, 1e-4],
    "topk_k": [1, 4, 20, 32, 128],
}


def get_grid_search_configs(
    axes: Optional[Dict[str, List[Any]]] = None,
) -> List[Dict[str, Any]]:
    """Enumerate filtered grid-search configs, identical to reference
    functions.py:452-474: cartesian product, then constraint-mutation
    (sum_js_kl -> js_div=False; else loss_gamma=0), then order-preserving dedup.

    Yields 48,000 configs for the default axes; list index == reference id.
    """
    axes = GRID_SEARCH_AXES if axes is None else axes
    raw = [dict(zip(axes.keys(), vals)) for vals in itertools.product(*axes.values())]

    seen: set = set()
    filtered: List[Dict[str, Any]] = []
    for cfg in raw:
        if cfg["should_sum_js_kl_div"]:
            cfg["should_js_div"] = False
        else:
            cfg["loss_gamma"] = 0
        key = tuple(cfg.items())
        if key in seen:
            continue
        seen.add(key)
        filtered.append(cfg)
    return filtered


def experiment_from_grid_id(
    grid_id: int,
    base_model: Optional[ModelConfig] = None,
    base_train: Optional[TrainConfig] = None,
    grid: Optional[Sequence[Dict[str, Any]]] = None,
) -> ExperimentConfig:
    """Build a fully-resolved ExperimentConfig from a reference grid id
    (the mapping performed inline at reference functions.py:503-535)."""
    grid = get_grid_search_configs() if grid is None else grid
    g = grid[grid_id]
    base_model = base_model if base_model is not None else ModelConfig()
    base_train = base_train if base_train is not None else TrainConfig()

    gamma, epsilon = LossConfig.resolve_gamma_epsilon(
        g["should_sum_js_kl_div"], g["should_js_div"], g["loss_gamma"]
    )
    model = dataclasses.replace(
        base_model,
        topk_k=int(g["topk_k"]),
        keep_topk_only=bool(g["should_keep_topk_only"]),
    )
    loss = LossConfig(
        delta=1.0,
        gamma=gamma,
        epsilon=epsilon,
        l_mse=float(g["l_mse"]),
        l_js_kl=float(g["l_js_kl"]),
        l_collisions=float(g["l_collisions"]),
    )
    opt = OptimizerConfig(mlp_lr=float(g["MLP_lr"]), hpd_lr=float(g["HPD_lr"]))
    train = dataclasses.replace(
        base_train, shuffle_pixels=bool(g["should_shuffle_pixels"])
    )
    return ExperimentConfig(
        model=model, loss=loss, optimizer=opt, train=train, grid_id=grid_id
    )
