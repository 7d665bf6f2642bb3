"""Bilinear interpolation of per-corner features.

TPU-native equivalent of reference `_bilinear_interpolate` (models.py:621-655).
Corner order is (0,0),(1,0),(0,1),(1,1) — see ops.grid.voxel_corner_offsets —
and the coefficient for corner v is the product over dims of
``frac_i`` if the corner steps in dim i else ``1 - frac_i``, where
``frac = scaled - floor(scaled)``. The reference writes this for d=2 as
``[(xd-x)(yd-y), (x-xa)(yd-y), (xd-x)(y-ya), (x-xa)(y-ya)]`` with a = corner 0
and d = corner 3 (models.py:626-637); both forms agree because ``xd - x = 1 -
frac_x`` and ``x - xa = frac_x`` on the unit cell. The generic-product form here
works for any input_dim.

Output layout is LEVEL-MAJOR concat ``(P, L*F)`` exactly like the reference's
``rearrange("p f l -> p (l f)")`` (models.py:651).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_coeffs(scaled: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Interpolation weights per corner.

    Args:
      scaled:  (P, L, d) scaled coordinates (from ops.grid.scale_to_grid).
      offsets: (V, d) corner offsets (0/1 ints).

    Returns:
      (P, L, V) weights summing to 1 over V.
    """
    frac = scaled - jnp.floor(scaled)                       # (P, L, d)
    off = offsets.astype(scaled.dtype)[None, None, :, :]    # (1, 1, V, d)
    f = frac[:, :, None, :]                                 # (P, L, 1, d)
    # weight = prod_d [ off*frac + (1-off)*(1-frac) ]
    return jnp.prod(off * f + (1.0 - off) * (1.0 - f), axis=-1)


def interpolate(features: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Blend corner features with bilinear weights and flatten level-major.

    Args:
      features: (P, L, V, F) per-corner features.
      coeffs:   (P, L, V) weights from :func:`bilinear_coeffs`.

    Returns:
      (P, L*F) encoded features, level-major (reference models.py:646-651).
    """
    p, l, _, f = features.shape
    out = jnp.sum(features * coeffs[..., None], axis=2)     # (P, L, F)
    return out.reshape(p, l * f)
