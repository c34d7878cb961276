"""Persistent XLA compilation cache for the CLIs.

The detector's jit programs take ~30 s (TPU) to minutes (CPU) to compile;
caching them on disk makes every `train.py` / `val.py` / `bench.py`
invocation after the first start in seconds. The test suite configures its
own cache (tests/conftest.py); this helper is for the CLI entry points.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "S2ANET_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "s2anet_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization, never a requirement
