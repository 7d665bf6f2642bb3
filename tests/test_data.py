"""Data pipeline parity (reference utils.py:5-75 + main.py:50-58): ij-ordered
coordinate grid, /255 targets, max(w,h)-1 normalization, cv2 decode, fixed
shuffle permutation + inverse."""

import numpy as np
import pytest

from collision_handling_in_instantngp_tpu.data import (
    load_image_dataset,
    make_coordinate_grid,
    make_shuffle_permutations,
)


def test_coordinate_grid_ij_order():
    """meshgrid(indexing='ij') — row-major (row, col) pairs
    (reference utils.py:56-59)."""
    g = make_coordinate_grid(3, 2)
    np.testing.assert_array_equal(
        g, [[0, 0], [0, 1], [1, 0], [1, 1], [2, 0], [2, 1]]
    )


def test_load_image_dataset(tmp_path, rng):
    import cv2

    img = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    path = str(tmp_path / "t.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    data = load_image_dataset(path)
    assert data.height == 5 and data.width == 7
    assert data.coords.shape == (35, 2)
    # normalization by max(w,h)-1 (reference main.py:50-51): cols reach 6,
    # divided by max(7,5)-1=6 -> 1.0; rows reach 4 -> 4/6
    np.testing.assert_allclose(data.coords[:, 1].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(data.coords[:, 0].max(), 4 / 6, atol=1e-6)
    np.testing.assert_allclose(
        data.targets, img.reshape(35, 3) / 255.0, atol=1e-6
    )
    np.testing.assert_array_equal(data.image, img)


def test_load_image_bw(tmp_path, rng):
    import cv2

    img = rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    path = str(tmp_path / "t.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    data = load_image_dataset(path, bw=True)
    assert data.targets.shape == (16, 1)
    assert data.channels == 1


def test_missing_image_raises():
    with pytest.raises(FileNotFoundError):
        load_image_dataset("/nonexistent/img.png")


def test_shuffle_permutation_inverse():
    """reordered[shuffled] == arange (reference main.py:56-58)."""
    shuffled, reordered = make_shuffle_permutations(100, seed=65535)
    np.testing.assert_array_equal(reordered[shuffled], np.arange(100))
    # deterministic for a fixed seed
    s2, _ = make_shuffle_permutations(100, seed=65535)
    np.testing.assert_array_equal(shuffled, s2)
    # no-shuffle mode = identity
    s3, r3 = make_shuffle_permutations(10, seed=0, shuffle=False)
    np.testing.assert_array_equal(s3, np.arange(10))
    np.testing.assert_array_equal(r3, np.arange(10))
