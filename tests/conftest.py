"""Test harness config: force a virtual 8-device CPU platform.

Must run before anything imports jax (pytest imports conftest first), so
multi-chip sharding tests can run without TPU hardware, per the reference
test-strategy gap analysis (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compile cache: the @slow integration tests spend minutes in
# XLA CPU compiles of unchanged programs; with a warm cache the full
# suite (slow tests included) fits a normal CI budget. The cache lives
# inside the repo (gitignored) so it survives across sessions/rounds,
# unlike /tmp.
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from faster_rcnn_pytorch_tpu.utils.compile_cache import host_fingerprint  # noqa: E402

# Namespaced per host CPU feature set: XLA:CPU AOT cache entries from a
# different machine log SIGILL-risk errors when loaded (see
# compile_cache.host_fingerprint) — recompiling is the safe miss.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    f".jax_test_cache-{host_fingerprint()}",
)

# The image ships a TPU platform plugin ("axon") that overrides the
# JAX_PLATFORMS env var; an explicit config update after import wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NB: the JAX_COMPILATION_CACHE_DIR env var is ignored by this jax build
# (verified empirically — no cache dir is ever created); only the config
# API enables the persistent compile cache.
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def boxes_fixture(rs, n, scale=1.0):
    """Random well-formed xyxy boxes in [0, scale]."""
    xy1 = rs.uniform(0, 0.8 * scale, size=(n, 2))
    wh = rs.uniform(0.02 * scale, 0.4 * scale, size=(n, 2))
    xy2 = np.minimum(xy1 + wh, scale)
    return np.concatenate([xy1, xy2], axis=1).astype(np.float32)
