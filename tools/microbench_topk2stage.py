"""A/B: global lax.top_k vs a per-tile two-stage reduction at FPN
propose shapes (A=159,882 anchors, k=2000/4000).

VERDICT r2 candidate (a): a per-LEVEL decomposition was already built,
measured slower, and deleted (DESIGN.md §6, 2026-08-18); this probes the
OTHER decomposition shape — uniform tiles of the flat score vector
(batched [T, A/T] top_k, merge T*k, re-top_k), which vectorizes the
first pass across a batch axis instead of 5 uneven level dispatches.

Exactness incl. tie order: tile-major merge order preserves global
index order for equal scores (asserted here on random inputs with
forced ties before timing).

Run on the chip: python tools/microbench_topk2stage.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from tools.chaintime import chain_time

A = 159_882  # FPN anchors at 800x800 (models/anchors.py multi-level)


@functools.partial(jax.jit, static_argnames=("k", "tiles"))
def two_stage_topk(score, k: int, tiles: int):
    """top_k(score, k) computed as merge of per-tile top_k — exact,
    including lowest-global-index tie order."""
    n = score.shape[0]
    tile_len = -(-n // tiles)
    n_pad = tile_len * tiles
    s = jnp.pad(score, (0, n_pad - n), constant_values=-jnp.inf)
    st = s.reshape(tiles, tile_len)
    kk = min(k, tile_len)
    vals, idx = jax.lax.top_k(st, kk)  # [T, kk]
    gidx = idx + (jnp.arange(tiles, dtype=idx.dtype) * tile_len)[:, None]
    flat_v = vals.reshape(-1)
    flat_i = gidx.reshape(-1)
    top_v, pos = jax.lax.top_k(flat_v, k)
    return top_v, flat_i[pos]


def check_exact():
    rs = np.random.RandomState(0)
    # quantized scores force plenty of cross-tile ties
    score = jnp.asarray(
        np.round(rs.uniform(size=(A,)) * 200.0) / 200.0, jnp.float32
    )
    for k in (2000, 4000):
        want_v, want_i = jax.lax.top_k(score, k)
        for tiles in (2, 4, 8, 16):
            got_v, got_i = two_stage_topk(score, k, tiles)
            np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
            np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    print("exactness (incl. tie order): OK for tiles in {2,4,8,16}, k in {2k,4k}")


def main():
    check_exact()
    rs = np.random.RandomState(1)
    score = jnp.asarray(rs.normal(size=(A,)).astype(np.float32))
    boxes = jnp.asarray(rs.uniform(0, 1, size=(A, 4)).astype(np.float32))

    for k in (2000, 4000):

        def global_topk(i, s, b):
            v, idx = jax.lax.top_k(s + i * 1e-6, k)
            return v.sum() + b[idx].sum()

        t, *_ = chain_time(global_topk, args=(score, boxes))
        print(f"k={k}  global top_k + gather      : {t*1e3:7.2f} ms")

        for tiles in (2, 4, 8, 16):

            def two_stage(i, s, b, tiles=tiles):
                v, idx = two_stage_topk(s + i * 1e-6, k, tiles)
                return v.sum() + b[idx].sum()

            t, *_ = chain_time(two_stage, args=(score, boxes))
            print(f"k={k}  two-stage T={tiles:2d} + gather   : {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
