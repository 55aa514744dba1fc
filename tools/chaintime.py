"""On-device timing via K-fold in-executable composition (tunnel-safe).

The attached runtime tunnels PJRT over RPC: ``block_until_ready`` does
not force remote execution (only host fetches do), per-call dispatch
costs ~1.4 ms RTT, and identical executions may be cached. Wall-clock
over Python-loop dispatches therefore measures the tunnel, not the chip.

This harness instead builds ONE executable that runs the op-under-test
K times inside ``lax.scan`` (inputs perturbed per step so nothing can be
CSE'd; results folded into a f32 accumulator so nothing is DCE'd),
fetches the scalar (the only real sync point), and reports the slope
  t_op = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)
which cancels dispatch, fetch RTT, and constant overheads.

Self-check: a 200 MB f32 elementwise op should report ~0.9 ms
(~470 GB/s effective HBM bandwidth on the attached v5e).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(
    step_fn, k_lo: int = 2, k_hi: int = 12, repeats: int = 3, args=()
):
    """Measure on-device seconds per invocation of ``step_fn``.

    Args:
      step_fn: ``f(i: int32 scalar, *args) -> f32 scalar``; should run
        the op under test with input perturbed by ``i`` and reduce to a
        scalar. Pass big arrays (params, images) through ``args`` —
        closed-over device arrays become constants EMBEDDED in the
        serialized program, and the tunnel's remote_compile endpoint
        rejects requests past a few hundred MB (HTTP 413; a closed-over
        VGG16 param tree is enough to trip it).
      k_lo/k_hi: chain lengths for the slope.
      repeats: fetch repetitions; the minimum is reported (tunnel noise
        is one-sided).

    Returns:
      (seconds_per_op, t_lo, t_hi)
    """

    def chained(k):
        @jax.jit
        def run(seed, *a):
            def body(carry, i):
                return carry + step_fn(i + seed, *a), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(k, dtype=jnp.int32)
            )
            return total

        return run

    run_lo, run_hi = chained(k_lo), chained(k_hi)

    def fetch_time(run, seed):
        t0 = time.perf_counter()
        v = np.asarray(run(jnp.int32(seed), *args))
        dt = time.perf_counter() - t0
        assert np.isfinite(v), "op under test produced non-finite result"
        return dt

    # compile + warm both
    fetch_time(run_lo, 0)
    fetch_time(run_hi, 0)
    t_lo = min(fetch_time(run_lo, 1000 + r) for r in range(repeats))
    t_hi = min(fetch_time(run_hi, 2000 + r) for r in range(repeats))
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


def selfcheck():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(50_000_000,)).astype(np.float32))

    def step(i):
        # abs(x + eps*i) cannot be algebraically hoisted out of the scan
        # (sum(c*x) = c*sum(x) can — and XLA does).
        return jnp.abs(x + 1e-9 * i.astype(jnp.float32)).sum()

    dt, *_ = chain_time(step)
    print(
        f"selfcheck 200MB elementwise+reduce: {dt*1000:.3f} ms "
        f"-> {0.2/dt:.0f} GB/s read"
    )


if __name__ == "__main__":
    selfcheck()
