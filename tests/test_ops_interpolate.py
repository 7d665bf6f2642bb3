"""Golden tests for bilinear interpolation (reference models.py:621-655)."""

import numpy as np
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.grid import voxel_corner_offsets
from collision_handling_in_instantngp_tpu.ops.interpolate import (
    bilinear_coeffs,
    interpolate,
)

OFFSETS = jnp.asarray(voxel_corner_offsets(2))


def test_coeffs_reference_formula(rng):
    """Coefficients must equal the reference's explicit products
    [(xd-x)(yd-y), (x-xa)(yd-y), (xd-x)(y-ya), (x-xa)(y-ya)]
    with a=floor corner, d=floor+(1,1) (models.py:632-637)."""
    scaled = jnp.asarray(rng.random((16, 4, 2), dtype=np.float32) * 30)
    got = np.asarray(bilinear_coeffs(scaled, OFFSETS))

    s = np.asarray(scaled)
    a = np.floor(s)
    d = a + 1.0
    x, y = s[..., 0], s[..., 1]
    xa, ya = a[..., 0], a[..., 1]
    xd, yd = d[..., 0], d[..., 1]
    expected = np.stack(
        [
            (xd - x) * (yd - y),
            (x - xa) * (yd - y),
            (xd - x) * (y - ya),
            (x - xa) * (y - ya),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_coeffs_partition_of_unity(rng):
    scaled = jnp.asarray(rng.random((8, 4, 2), dtype=np.float32) * 10)
    c = np.asarray(bilinear_coeffs(scaled, OFFSETS))
    np.testing.assert_allclose(c.sum(-1), 1.0, atol=1e-5)


def test_interpolate_at_corner():
    """At an exact grid point, the output is corner 0's features."""
    scaled = jnp.array([[[3.0, 7.0]]])                      # (1, 1, 2)
    feats = jnp.arange(8.0).reshape(1, 1, 4, 2)             # (1, 1, 4, 2)
    out = interpolate(feats, bilinear_coeffs(scaled, OFFSETS))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0]])


def test_interpolate_center():
    scaled = jnp.array([[[3.5, 7.5]]])
    feats = jnp.arange(8.0).reshape(1, 1, 4, 2)
    out = interpolate(feats, bilinear_coeffs(scaled, OFFSETS))
    np.testing.assert_allclose(np.asarray(out), [[3.0, 4.0]])  # mean over corners


def test_level_major_flatten(rng):
    """(P, L, F) must flatten level-major: out[:, l*F + f]
    (reference rearrange 'p f l -> p (l f)', models.py:651)."""
    p, l, f = 3, 4, 2
    feats = jnp.asarray(rng.random((p, l, 4, f), dtype=np.float32))
    scaled = jnp.asarray(rng.random((p, l, 2), dtype=np.float32) * 5)
    coeffs = bilinear_coeffs(scaled, OFFSETS)
    out = np.asarray(interpolate(feats, coeffs))
    per_level = np.sum(np.asarray(feats) * np.asarray(coeffs)[..., None], axis=2)
    for li in range(l):
        np.testing.assert_allclose(
            out[:, li * f : (li + 1) * f], per_level[:, li], rtol=1e-6
        )
