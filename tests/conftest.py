"""Test configuration: force an 8-device CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4). The environment pins JAX_PLATFORMS=axon
via sitecustomize, so env vars are not enough — jax.config wins."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: repeated suite runs skip recompiling the
# jitted epoch programs (keyed by HLO hash — safe across code changes)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(65535)
