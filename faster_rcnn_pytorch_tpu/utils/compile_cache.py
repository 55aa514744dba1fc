"""Persistent XLA compile cache setup.

The ``JAX_COMPILATION_CACHE_DIR`` env var is silently ignored by the jax
build in this image (verified: no cache directory is ever created); only
the ``jax.config`` API enables the persistent cache. Every entry point
(bench, tools, tests) funnels through :func:`enable` so full-model
programs — minutes of compile through the tunnelled TPU runtime — are
compiled once per code change, not once per process.

The default cache lives inside the repo (gitignored) so it survives
across sessions and rounds, unlike ``/tmp``.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_DIR = os.path.join(_REPO, ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    """Idempotently enable the persistent compile cache (call after
    ``import jax``, before the first compilation)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", cache_dir or DEFAULT_DIR
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
