"""Persistent XLA/Mosaic compilation cache.

Compiles over the axon tunnel cost 15-60s per (function, bucket) shape;
the on-disk cache makes every run after the first start warm. Enabled by
bench.py and the CLI; safe to call multiple times.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
