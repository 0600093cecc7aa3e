"""JAX persistent compilation cache.

The whole-epoch scanned programs compile in minutes on the tunneled TPU
(one-time cost); the persistent cache makes every subsequent process
reuse them. Called by run.py, bench.py and the driver entry.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "BDE_COMPILE_CACHE", os.path.expanduser("~/.cache/bde_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs
    return path
