"""Test configuration: force an 8-device CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4). The environment pins JAX_PLATFORMS=axon
via sitecustomize, so env vars are not enough — jax.config wins."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(65535)
