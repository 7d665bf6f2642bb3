"""Multi-resolution grid geometry: resolution ladder, voxel corners, scaling.

TPU-native reformulation of reference models.py:304-334 (resolution ladder +
voxel helper hypercube) and models.py:486-502 (`_scale_to_grid`). Shapes here are
``(P, L, ...)`` pixel-major / level-second (the reference uses ``(P, xy, L, V)``);
level-major concat order of the final encoding is preserved where it matters
(bilinear output, see ops/interpolate.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def resolution_ladder(n_min: int, n_max: int, num_levels: int) -> np.ndarray:
    """Per-level grid resolutions ``n_l = floor(n_min * b**l)`` with
    ``b = exp((ln n_max - ln n_min)/(L-1))`` (reference models.py:304-317).

    Defaults (8, 32, 4) give b=1.5874 and n_l = [8, 12, 20, 32].
    Returns an int32 numpy array of shape (L,). Raises no error on b outside
    (1, 2] — like the reference it only warns.
    """
    if num_levels == 1:
        return np.array([n_min], dtype=np.int32)
    b = float(np.exp((np.log(n_max) - np.log(n_min)) / (num_levels - 1)))
    if b > 2 or b <= 1:
        # reference models.py:306-309 prints the same advisory
        print(
            f"The between level scale is recommended to be <= 2 and needs to be "
            f"> 1 but was {b:.4f}."
        )
    return np.array(
        [np.floor(n_min * b**l) for l in range(num_levels)], dtype=np.int32
    )


def voxel_corner_offsets(input_dim: int) -> np.ndarray:
    """Corner offsets of the unit hypercube, shape (V=2^d, d), int32.

    Reproduces the reference's corner ORDER (models.py:321-334): along dim i the
    pattern is ``([0]*2^i + [1]*2^i) * 2^(d-i-1)``; for d=2 this yields corners
    (0,0),(1,0),(0,1),(1,1) — the order the bilinear coefficients assume
    (models.py:632-637).
    """
    num_corners = 2**input_dim
    out = np.empty((num_corners, input_dim), dtype=np.int32)
    for i in range(input_dim):
        pattern = np.array(([0] * (2**i) + [1] * (2**i)) * (2 ** (input_dim - i - 1)))
        out[:, i] = pattern
    return out


def scale_to_grid(
    x: jnp.ndarray, n_ls: jnp.ndarray, offsets: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale normalized coords onto every level's grid and emit voxel corners.

    Reference `_scale_to_grid` (models.py:486-502), reshaped TPU-style:

    Args:
      x:       (P, d) float coords (normalized to [0,1] upstream, main.py:50-51).
      n_ls:    (L,)   int per-level resolutions.
      offsets: (V, d) int corner offsets from :func:`voxel_corner_offsets`.

    Returns:
      scaled: (P, L, d) float  — ``x * n_l``
      corners: (P, L, V, d) float — ``floor(scaled) + offset`` (float like the
        reference, because these raw vertex coords feed the HPD MLP directly,
        models.py:416-418).

    Like the reference (``@torch.no_grad``), callers must not differentiate
    through this; in JAX the inputs are data so no stop_gradient is needed.
    """
    scaled = x[:, None, :] * n_ls[None, :, None].astype(x.dtype)
    corners = jnp.floor(scaled)[:, :, None, :] + offsets[None, None, :, :].astype(
        x.dtype
    )
    return scaled, corners
