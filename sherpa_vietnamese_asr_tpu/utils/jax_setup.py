# One-time JAX runtime setup for this framework.
#
# Enables the persistent compilation cache (first compiles of the Zipformer /
# PyanNet / beam-search programs take minutes on the TPU backend; cached
# compiles load in seconds across processes). Importing the package calls
# ensure_setup() once; it never overrides explicit user configuration.

from __future__ import annotations

import os

_DONE = False


def ensure_setup():
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # explicit user choice wins
    # Per-backend subdirectory: CPU AOT artifacts are machine-feature
    # sensitive and must not be shared with TPU entries (or across hosts).
    backend = os.environ.get("JAX_PLATFORMS", "") or "default"
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache",
        backend.replace(",", "_") or "default")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, including short compiles.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization only
