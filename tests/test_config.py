"""Grid-search enumeration parity with the reference (functions.py:452-474,
params.py:58-75): 48,000 filtered configs and the documented id-4061 mapping
(README best run, BASELINE.md)."""

from collision_handling_in_instantngp_tpu.config import (
    LossConfig,
    experiment_from_grid_id,
    get_grid_search_configs,
)


def test_grid_size():
    grid = get_grid_search_configs()
    assert len(grid) == 48000


def test_grid_dedup_and_constraints():
    grid = get_grid_search_configs()
    seen = set()
    for cfg in grid:
        key = tuple(cfg.items())
        assert key not in seen
        seen.add(key)
        if cfg["should_sum_js_kl_div"]:
            assert cfg["should_js_div"] is False
        else:
            assert cfg["loss_gamma"] == 0


def test_config_4061_is_readme_best():
    """BASELINE.md documents id 4061 as the README's best parameters."""
    g = get_grid_search_configs()[4061]
    assert g == {
        "should_shuffle_pixels": True,
        "should_keep_topk_only": False,
        "should_sum_js_kl_div": True,
        "loss_gamma": -2,
        "should_js_div": False,
        "l_mse": 1,
        "l_js_kl": 1,
        "l_collisions": 1e-3,
        "MLP_lr": 1e-3,
        "HPD_lr": 1e-3,
        "topk_k": 4,
    }


def test_experiment_from_grid_id_4061():
    exp = experiment_from_grid_id(4061)
    assert exp.model.topk_k == 4
    assert exp.model.keep_topk_only is False
    assert exp.loss.gamma == -2.0 and exp.loss.epsilon == 1.0
    assert exp.loss.l_collisions == 1e-3
    assert exp.optimizer.mlp_lr == 1e-3 and exp.optimizer.hpd_lr == 1e-3
    assert exp.train.shuffle_pixels is True


def test_gamma_epsilon_resolution():
    """Reference functions.py:532-535."""
    assert LossConfig.resolve_gamma_epsilon(True, False, -2) == (-2.0, 1.0)
    assert LossConfig.resolve_gamma_epsilon(True, True, -3) == (-3.0, 1.0)
    # not summing: JS-only -> epsilon 0; KL-only -> epsilon 1; gamma forced -1
    assert LossConfig.resolve_gamma_epsilon(False, True, 0) == (-1.0, 0.0)
    assert LossConfig.resolve_gamma_epsilon(False, False, 0) == (-1.0, 1.0)
