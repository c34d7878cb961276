"""Test harness config: hermetic 8-device virtual CPU mesh.

Must run before jax is imported anywhere: forces the CPU backend with 8
virtual devices so multi-chip sharding paths are exercised without TPUs
(the TPU-native answer to "test distributed without a cluster").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# The environment pre-sets jax_platforms="axon,cpu" programmatically (the
# TPU-tunnel plugin), which overrides the JAX_PLATFORMS env var — force the
# config itself so tests really run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: whole-detector CPU compiles take minutes;
# cache them across test runs. Keyed per host — XLA:CPU AOT executables bake
# in the compile host's machine features but the cache key does not, so a
# cache carried across a host change aborts at load (see utils/jax_cache.py).
from s2anet_tpu.utils.jax_cache import host_fingerprint  # noqa: E402

_cache_dir = os.path.join(
    os.environ.get("JAX_TEST_CACHE", "/tmp/jax_test_cache"), host_fingerprint()
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# XLA:CPU's default conv/matmul precision is low (~1e-3 rel error) — force
# full fp32 so golden/parity tests measure algorithm semantics, not backend rounding.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
