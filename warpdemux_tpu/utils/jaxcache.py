"""Persistent XLA compilation cache.

Compiles on the remote-attached TPU cost tens of seconds per program; the
persistent cache makes every entry-point (CLI, bench, tests, live session)
reuse executables across processes. Safe no-op where the backend doesn't
support executable serialization.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT deserialization is unreliable here (machine-feature
            # mismatch on reload corrupts executables: "supplied 2 buffers
            # but compiled program expected 4"); CPU compiles are fast anyway.
            return
    except Exception:
        return
    cache_dir = path or os.environ.get(
        "WDX_COMPILATION_CACHE", "/root/.cache/wdx_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:
        pass  # older jax or read-only fs: compile as usual
