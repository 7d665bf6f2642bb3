"""Golden tests for the XOR-prime fast hash (reference models.py:504-528).

Golden values computed here with independent int64 numpy arithmetic — the
uint32 kernel must agree for power-of-two table sizes."""

import numpy as np
import jax.numpy as jnp
import pytest

from collision_handling_in_instantngp_tpu.ops.hashing import PRIMES, fast_hash


def _golden_hash_int64(grid: np.ndarray, t: int) -> np.ndarray:
    primes = np.array([1, 2654435761, 805459861], dtype=np.int64)
    acc = np.zeros(grid.shape[:-1], dtype=np.int64)
    for i in range(grid.shape[-1]):
        acc = np.bitwise_xor(grid[..., i].astype(np.int64) * primes[i], acc)
    return np.remainder(acc, t)


def test_primes_match_reference():
    np.testing.assert_array_equal(
        PRIMES.astype(np.int64), [1, 2654435761, 805459861]
    )


@pytest.mark.parametrize("t", [2**8, 2**14])
def test_fast_hash_matches_int64_golden(rng, t):
    grid = rng.integers(0, 33, size=(64, 4, 4, 2))
    got = np.asarray(fast_hash(jnp.asarray(grid), t))
    np.testing.assert_array_equal(got, _golden_hash_int64(grid, t))


def test_fast_hash_3d_coords(rng):
    grid = rng.integers(0, 128, size=(32, 8, 3))
    got = np.asarray(fast_hash(jnp.asarray(grid), 2**10))
    np.testing.assert_array_equal(got, _golden_hash_int64(grid, 2**10))


def test_fast_hash_range():
    grid = jnp.arange(2 * 3 * 4 * 2).reshape(2, 3, 4, 2)
    h = np.asarray(fast_hash(grid, 256))
    assert h.min() >= 0 and h.max() < 256


def test_fast_hash_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        fast_hash(jnp.zeros((1, 2), jnp.int32), 100)
