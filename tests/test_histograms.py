"""Histogram figures (reference functions.py:358-449): tick-step rule and
figure construction from device-computed counts."""

import numpy as np

from collision_handling_in_instantngp_tpu.utils.histograms import (
    _tick_step,
    counts_per_level_histograms,
)


def test_tick_step_reference_rule():
    """Derived from the reference's branching (functions.py:386-393)."""
    # T=256: dec=25.6 < 100; 25.6 % 10 = 5.6 >= 5 -> 25.6//10*10 = 20
    assert _tick_step(256) == 20
    # T=16384: dec=1638.4; 1638.4 % 100 = 38.4 >= 10 -> //100*100 = 1600
    assert _tick_step(16384) == 1600
    # T=64: dec=6.4; 6.4 % 10 >= 5 -> 6.4//10*10 = 0 — the reference would
    # pass MultipleLocator(0) and crash; we clamp to 1 (sane divergence)
    assert _tick_step(64) == 1


def test_figures_per_level(rng):
    counts = rng.integers(0, 50, size=(4, 64))
    figs = counts_per_level_histograms(counts, 64)
    assert len(figs) == 4


def test_combined_figure(rng):
    counts = rng.integers(0, 50, size=(4, 64))
    figs = counts_per_level_histograms(counts, 64, combined=True)
    assert len(figs) == 1
