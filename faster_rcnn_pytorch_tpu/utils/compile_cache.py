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

import hashlib
import os

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def host_fingerprint() -> str:
    """Short hash of the host CPU feature set. XLA:CPU AOT executables
    are compiled for the build machine's features; loading them on a
    host with a different feature set logs ``cpu_aot_loader`` errors and
    'could lead to execution errors such as SIGILL'. The sandbox moves
    between machines across sessions, so cache dirs are namespaced per
    feature set — a mismatched host recompiles instead of loading
    foreign-CPU code."""
    # Flags + model identity alone are not enough: two sandbox VMs have
    # exposed byte-identical vendor/family/model/stepping/flags yet
    # produced AOT entries differing in LLVM *tuning* features
    # (+prefer-no-scatter/gather — chosen from microcode-level gather/
    # scatter behavior, not the model id). Hash the whole first-CPU
    # cpuinfo block (microcode + bugs lines included), dropping only
    # per-boot/per-core volatile fields.
    #
    # Known cosmetic noise, NOT a collision: on CPUs where XLA adds LLVM
    # tuning prefs (+prefer-no-scatter/+prefer-no-gather, Sapphire
    # Rapids-class), every warm-cache load logs a cpu_aot_loader
    # feature-mismatch error EVEN FOR ENTRIES WRITTEN BY THE SAME
    # MACHINE IN THE SAME BOOT (verified: write + reload in consecutive
    # processes warns, yet the persistent-cache hit is taken and the
    # result is correct). The loader compares the compile-side feature
    # string (which embeds tuning prefs) against getHostCPUFeatures
    # (which never reports them). No fingerprint can silence it; ignore
    # the warning when compile+run hosts are known-identical.
    volatile = {
        "processor", "cpu mhz", "bogomips", "apicid", "initial apicid",
        "core id", "cpu cores", "siblings", "physical id",
    }
    try:
        parts: list[str] = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first processor block
                key = line.split(":", 1)[0].strip().lower()
                if key in volatile:
                    continue
                if key == "flags":
                    parts.append(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                    )
                else:
                    parts.append(line.strip())
        if parts:
            return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


DEFAULT_DIR = os.path.join(_REPO, f".jax_cache-{host_fingerprint()}")


def enable(cache_dir: str | None = None) -> None:
    """Idempotently enable the persistent compile cache (call after
    ``import jax``, before the first compilation)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", cache_dir or DEFAULT_DIR
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
