"""Persistent XLA/Mosaic compilation cache.

The fused Pallas detector takes minutes of Mosaic compile at wide channel
counts on a cold process; with the persistent cache enabled, every later
process start (bench, serve, tests on the same shapes) re-loads the compiled
executable in well under a second.  Call :func:`enable_compilation_cache`
once at process start — bench.py and the realtime app entries do.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(
    os.environ.get(
        "OFPTPU_COMPILE_CACHE",
        Path(__file__).resolve().parents[2] / ".jax_cache",
    )
)


def enable_compilation_cache(cache_dir: str | Path | None = None) -> Path:
    """Enable JAX's persistent compilation cache (idempotent).

    :param cache_dir: cache directory; defaults to ``<repo>/.jax_cache`` or
        ``$OFPTPU_COMPILE_CACHE``.
    :returns: the cache directory in use.
    """
    import jax

    path = Path(cache_dir) if cache_dir is not None else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache anything that took ≥1 s to compile (default 60 s misses most of
    # the mid-sized programs the engine dispatches)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
