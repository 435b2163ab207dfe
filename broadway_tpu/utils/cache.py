"""Persistent XLA compile cache setup.

1080p pipeline compiles take minutes (the Pallas wavefront/MC kernels
go through the remote Mosaic compiler), so every entry point enables
the on-disk cache. The JAX_COMPILATION_CACHE_DIR environment variable
is NOT reliably picked up by the jax config default in this
environment; only an explicit `jax.config.update` is (verified: env
setdefault left jax.config.jax_compilation_cache_dir = None and no
cache writes happened; config.update produces cache hits).
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def ensure_compile_cache(path: str = None) -> str:
    """Point jax at the on-disk compile cache (idempotent; call before
    the first compile — importing jax is fine)."""
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(_REPO, "build", "jaxcache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
