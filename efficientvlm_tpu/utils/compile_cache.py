"""Persistent XLA compilation cache.

Cold compiles of the big KD programs take minutes through the tunneled
compile service; the on-disk cache makes every repeat run (bench re-runs,
driver restarts, resumed training) start in seconds. Keyed by HLO +
backend, so it is safe across processes.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "jax_comp")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Best-effort: never fails the caller (some backends/flags may not
    support the cache; compilation then just stays uncached)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir or DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover
        print(f"### persistent compile cache unavailable: {e}")
