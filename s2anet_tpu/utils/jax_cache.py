"""Persistent XLA compilation cache for the CLIs.

The detector's jit programs take ~30 s (TPU) to minutes (CPU) to compile;
caching them on disk makes every `train.py` / `val.py` / `bench.py`
invocation after the first start in seconds. The test suite configures its
own cache (tests/conftest.py); this helper is for the CLI entry points.

The cache directory is keyed by a HOST fingerprint (machine arch + CPU
feature flags): XLA:CPU AOT executables bake in the compile host's machine
features but the cache key does not cover them, so a cache written on one
host can SIGILL/abort on another (observed: `cpu_aot_loader` feature
mismatch then `Fatal Python error: Aborted` re-executing a moved cache).
Keying the directory makes a host change start a fresh cache instead of
poisoning the run. Only host-local facts go into the fingerprint — no
device/backend query, so this never blocks on an unreachable accelerator.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short digest of the facts XLA:CPU bakes into AOT executables."""
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "S2ANET_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "s2anet_jax"),
    )
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization, never a requirement
