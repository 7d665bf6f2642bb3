"""Spatial fast-hash (vanilla InstantNGP path).

TPU-native equivalent of reference `_fast_hash` (models.py:504-528): XOR of the
per-dimension products with large primes, modulo the table size.

The reference computes in int64. On TPU we use uint32: for power-of-two table
sizes (the only kind the reference constructs — ``hash_table_size = 2**exp``,
params.py:26-27) ``x % T`` only reads the low ``exp`` bits, and the low 32 bits
of products/XORs are identical in uint32 and int64 arithmetic, so results match
the reference exactly without enabling x64.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Reference models.py:344-347.
PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def fast_hash(corners: jnp.ndarray, hash_table_size: int) -> jnp.ndarray:
    """Hash integer grid corners to table slots.

    Args:
      corners: (..., d) integer-valued corner coordinates (any int/float dtype;
        values must be non-negative, as produced by ops.grid.scale_to_grid).
      hash_table_size: T; must be a power of two (asserted), matching the
        reference's ``2**exp`` construction.

    Returns:
      (...,) int32 slot indices in [0, T).
    """
    if hash_table_size & (hash_table_size - 1) != 0:
        raise ValueError(
            f"hash_table_size must be a power of two, got {hash_table_size} "
            "(reference params.py:26-27 constructs T = 2**exp)"
        )
    d = corners.shape[-1]
    c = corners.astype(jnp.uint32)
    acc = jnp.zeros(corners.shape[:-1], dtype=jnp.uint32)
    for i in range(d):
        acc = jnp.bitwise_xor(acc, c[..., i] * PRIMES[i])
    return (acc & jnp.uint32(hash_table_size - 1)).astype(jnp.int32)
