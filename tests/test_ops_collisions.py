"""Tests for device-side collision counting vs host np.unique golden
(reference models.py:568-619)."""

import numpy as np
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.collisions import (
    hash_collisions_gngf,
    hash_collisions_vanilla,
    min_possible_collisions,
    slot_counts,
    unique_cell_slot_counts,
)
from collision_handling_in_instantngp_tpu.ops.grid import (
    scale_to_grid,
    voxel_corner_offsets,
)

N_LS = np.array([8, 12, 20, 32], dtype=np.int32)
T = 256


def test_min_possible_collisions_defaults():
    """[0, 0, 185, 833] for T=256 (SURVEY.md O8)."""
    got = np.asarray(min_possible_collisions(jnp.asarray(N_LS), T))
    np.testing.assert_array_equal(got, [0, 0, 185, 833])


def test_slot_counts_matches_numpy(rng):
    idx = rng.integers(0, T, size=(100, 4, 4, 3))
    got = np.asarray(slot_counts(jnp.asarray(idx), T))
    for l in range(4):
        vals, counts = np.unique(idx[:, l], return_counts=True)
        expected = np.zeros(T, np.int64)
        expected[vals] = counts
        np.testing.assert_array_equal(got[l], expected)


def test_vanilla_collisions_matches_unique(rng):
    idx = rng.integers(0, T, size=(500, 4, 4))
    got = np.asarray(hash_collisions_vanilla(jnp.asarray(idx), jnp.asarray(N_LS), T))
    for l in range(4):
        uniq = len(np.unique(idx[:, l].reshape(-1)))
        assert got[l] == (N_LS[l] + 1) ** 2 - uniq


def test_gngf_collisions_mean_over_k_and_clamp(rng):
    idx = rng.integers(0, T, size=(300, 4, 4, 5))
    got = np.asarray(
        hash_collisions_gngf(jnp.asarray(idx), jnp.asarray(N_LS), T)
    )
    expected = np.zeros(4)
    for l in range(4):
        per_k = [
            (N_LS[l] + 1) ** 2 - len(np.unique(idx[:, l, :, k].reshape(-1)))
            for k in range(5)
        ]
        expected[l] = max(np.mean(per_k), 0.0)
    np.testing.assert_allclose(got, expected)


def test_unique_cell_counts_dedups_same_cell():
    """Two pixels in the same cell must count once; distinct cells count each."""
    n_ls = np.array([4], dtype=np.int32)
    offsets = jnp.asarray(voxel_corner_offsets(2))
    # pixels: two in cell (0,0), one in cell (1,2)
    x = jnp.array([[0.05, 0.05], [0.10, 0.10], [0.30, 0.55]])
    _, corners = scale_to_grid(x, jnp.asarray(n_ls), offsets)
    # give every corner a fixed slot id per pixel so counts are predictable
    best = jnp.array(
        [
            [[7, 7, 7, 7]],
            [[7, 7, 7, 7]],
            [[3, 3, 3, 3]],
        ],
        dtype=jnp.int32,
    )  # (P=3, L=1, V=4)
    counts = np.asarray(unique_cell_slot_counts(best, corners, n_ls, 16))
    assert counts.shape == (1, 16)
    assert counts[0, 7] == 4   # one representative pixel x 4 corners
    assert counts[0, 3] == 4
    assert counts.sum() == 8
