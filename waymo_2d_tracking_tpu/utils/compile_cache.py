"""Persistent XLA compilation cache for production processes.

The reference pipeline pays its CUDA/cuDNN autotune + torchscript warmup
once per process and amortizes it over a whole val split; our equivalent
cold-start cost is XLA compilation (~20-40 s per program on the chip,
and multi-minute over a tunneled backend — BASELINE.md serving notes).
For batch jobs that cost disappears into the first chunk, but the
serving daemon (`w2t serve`) restarts on failover and planned redeploys
(`--state-file`), where a cold compile is the entire downtime window.

JAX ships a persistent on-disk compilation cache; the test suite has
used it since round 3 (tests/conftest.py, ~2x warm-suite speedup). This
module turns it on for the PRODUCT: every jax-using CLI verb calls
``enable_compile_cache()`` before building its runner, so a restarted
process reloads compiled programs from disk instead of recompiling.

Resolution order (first hit wins):
  1. explicit ``path`` argument (CLI ``--compile-cache``),
  2. ``W2T_COMPILE_CACHE`` env var,
  3. default ``~/.cache/w2t/jax-cache``.
``off`` (any source) disables the cache entirely.
"""
from __future__ import annotations

import os
from typing import Optional

_ENV_VAR = "W2T_COMPILE_CACHE"
_DEFAULT = os.path.join("~", ".cache", "w2t", "jax-cache")
_enabled_dir: Optional[str] = None


def resolve_cache_dir(path: Optional[str] = None) -> Optional[str]:
    """Resolve the cache directory per the module docstring; None = off."""
    raw = path or os.environ.get(_ENV_VAR) or _DEFAULT
    if raw.strip().lower() == "off":
        return None
    return os.path.expanduser(raw)


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax's persistent compilation cache at a writable directory.

    Idempotent; safe to call from every CLI entry path. Returns the
    active cache directory (None when disabled). Must run before the
    first compilation to benefit it, but calling later is harmless —
    programs compiled afterwards still populate the cache.
    """
    global _enabled_dir
    cache_dir = resolve_cache_dir(path)
    if cache_dir is None:
        return None
    if _enabled_dir == cache_dir:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took >=1s to compile (the jax default is 1s;
    # set explicitly so a future default change can't silently stop
    # caching the serving programs this exists for).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_dir = cache_dir
    return cache_dir
