"""Numerical primitives: grid geometry, hashing, top-k, interpolation,
collision statistics — the pure-JAX oracle implementations that the Pallas
kernels in ops/pallas are verified against."""

from . import collisions, grid, hashing, interpolate, topk  # noqa: F401
