"""CLI runtime setup: platform selection + persistent compile cache.

Two quirks of this environment that every entry point must handle:

* The installed TPU platform plugin registers itself unconditionally and
  *overrides* the ``JAX_PLATFORMS`` env var — ``JAX_PLATFORMS=cpu python
  -m ...`` would still open the TPU runtime. Only the config API wins,
  so the env var is re-applied through ``jax.config`` here.
* The ``JAX_COMPILATION_CACHE_DIR`` env var is silently ignored by this
  jax build (utils/compile_cache.py); full-model programs take minutes
  to compile, so every CLI enables the persistent cache explicitly.
"""

from __future__ import annotations

import os


def setup_runtime() -> None:
    """Call at the top of every CLI ``main()`` before the first jax use."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    from faster_rcnn_pytorch_tpu.utils.compile_cache import enable

    enable()


def apply_matmul_precision(precision: str) -> None:
    """Set the global fp32 dot/conv precision (``--matmul_precision``).

    "default" leaves jax's TPU default (bfloat16 multiplies, fp32
    accumulate). "highest" selects the multi-pass true-fp32 MXU schedule
    — required when fp32 outputs must match a genuine-fp32 stack (the
    dual-stack parity drill's float32 leg vs torch-CPU).
    """
    if precision and precision != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", precision)
