"""Persistent XLA compilation cache.

The big U-Net graphs take minutes to compile on a tunneled TPU; a
host-local persistent cache makes restarts (resume, repeated CLI modes,
the driver's bench run) hit warm compiles.  Opt out with
IDDIFF_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "/root/.cache/iddiff_xla"


def enable_compile_cache() -> bool:
    if os.environ.get("IDDIFF_NO_COMPILE_CACHE") == "1":
        return False
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception:
        return False
