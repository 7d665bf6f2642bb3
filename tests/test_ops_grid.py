"""Golden tests for grid geometry ops vs the reference formulas
(models.py:304-334, 486-502 — values derived independently from the cited
math, not from running the reference)."""

import numpy as np
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.grid import (
    resolution_ladder,
    scale_to_grid,
    voxel_corner_offsets,
)


def test_resolution_ladder_defaults():
    """b = exp((ln32 - ln8)/3) = 2^(2/3); floors to [8, 12, 20, 32]
    (SURVEY.md O3)."""
    np.testing.assert_array_equal(resolution_ladder(8, 32, 4), [8, 12, 20, 32])


def test_resolution_ladder_16_levels():
    """InstantNGP-style config: n_min=16, n_max=512, L=16."""
    n = resolution_ladder(16, 512, 16)
    assert n[0] == 16 and n[-1] == 512
    assert np.all(np.diff(n) > 0)


def test_voxel_corner_offsets_2d():
    """Corner order (0,0),(1,0),(0,1),(1,1) — reference pattern
    ([0]*2^i+[1]*2^i)*2^(d-i-1) per dim (models.py:321-334)."""
    np.testing.assert_array_equal(
        voxel_corner_offsets(2), [[0, 0], [1, 0], [0, 1], [1, 1]]
    )


def test_voxel_corner_offsets_3d():
    offs = voxel_corner_offsets(3)
    assert offs.shape == (8, 3)
    # dim 0 pattern [0,1]*4; dim 1 [0,0,1,1]*2; dim 2 [0]*4+[1]*4
    np.testing.assert_array_equal(offs[:, 0], [0, 1, 0, 1, 0, 1, 0, 1])
    np.testing.assert_array_equal(offs[:, 1], [0, 0, 1, 1, 0, 0, 1, 1])
    np.testing.assert_array_equal(offs[:, 2], [0, 0, 0, 0, 1, 1, 1, 1])


def test_scale_to_grid_values():
    n_ls = jnp.asarray(resolution_ladder(8, 32, 4))
    offsets = jnp.asarray(voxel_corner_offsets(2))
    x = jnp.array([[0.5, 0.25]])
    scaled, corners = scale_to_grid(x, n_ls, offsets)
    assert scaled.shape == (1, 4, 2)
    assert corners.shape == (1, 4, 4, 2)
    # level 0 (n=8): scaled (4, 2); corners (4,2)+offsets
    np.testing.assert_allclose(scaled[0, 0], [4.0, 2.0])
    np.testing.assert_allclose(
        corners[0, 0], [[4, 2], [5, 2], [4, 3], [5, 3]]
    )
    # level 3 (n=32): scaled (16, 8)
    np.testing.assert_allclose(scaled[0, 3], [16.0, 8.0])
    np.testing.assert_allclose(corners[0, 3, 0], [16, 8])


def test_scale_to_grid_fractional():
    n_ls = jnp.asarray([10])
    offsets = jnp.asarray(voxel_corner_offsets(2))
    x = jnp.array([[0.37, 0.91]])
    scaled, corners = scale_to_grid(x, n_ls, offsets)
    np.testing.assert_allclose(scaled[0, 0], [3.7, 9.1], rtol=1e-6)
    np.testing.assert_allclose(corners[0, 0, 0], [3.0, 9.0])
    np.testing.assert_allclose(corners[0, 0, 3], [4.0, 10.0])
