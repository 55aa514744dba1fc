"""A/B the align global-fallback cond's materialization cost.

The round-3 trace (tools/capture_trace.py) shows FPN predict's single
largest fusion is `%cond.5.clone = (bf16[2,1000,12544]{1,2,0})` at
~6.8 ms/step: the exactness cond around the align dispatch
(ops/roi_align.py _msra_batch_primal) forces its result to materialize
in the fc6 dot's preferred S-minor layout — a ~50 MB strided transpose
at ~7 GB/s. Hypothesis: moving the flatten+fc6 INSIDE the cond branches
(cond output [B,S,1024], 4 MB) removes the transpose.

Variants (chaintimed at predict shapes, b2 x 1000 rois, 800 canvas):
  A: production — align_batch (global cond) -> reshape -> fc6
  B: cond-free — fast path only -> reshape -> fc6 (not exact; bound)
  C: fc6 inside both cond branches (exact, candidate productization)

Run on the chip: python tools/microbench_align_cond.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from tools.chaintime import chain_time

# ops/__init__ rebinds the package attr `roi_align` to the FUNCTION of
# the same name, so plain `import ... as ra` yields the function; fetch
# the module object itself.
import importlib

ra = importlib.import_module("faster_rcnn_pytorch_tpu.ops.roi_align")

B, S, C = 2, 1000, 256
CANVAS = 800
STRIDES = (4, 8, 16, 32)
FDIM = 7 * 7 * C
FC_OUT = 1024


def make_inputs():
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(
            rs.normal(size=(B, CANVAS // s, CANVAS // s, C)).astype(np.float32),
            jnp.bfloat16,
        )
        for s in STRIDES
    )
    # anchor-shaped rois in canvas pixels (same distribution rule as
    # profile_fpn_train: size log-uniform [16,400], aspect [1/3,3])
    size = np.exp(rs.uniform(np.log(16), np.log(400), size=(B, S)))
    aspect = np.exp(rs.uniform(np.log(1 / 3), np.log(3), size=(B, S)))
    w = size * np.sqrt(aspect)
    h = size / np.sqrt(aspect)
    cx = rs.uniform(0, CANVAS, size=(B, S))
    cy = rs.uniform(0, CANVAS, size=(B, S))
    rois = np.stack(
        [
            np.clip(cx - w / 2, 0, CANVAS),
            np.clip(cy - h / 2, 0, CANVAS),
            np.clip(cx + w / 2, 0, CANVAS),
            np.clip(cy + h / 2, 0, CANVAS),
        ],
        -1,
    ).astype(np.float32)
    kernel = jnp.asarray(
        (rs.normal(size=(FDIM, FC_OUT)) * 0.01).astype(np.float32), jnp.bfloat16
    )
    bias = jnp.zeros((FC_OUT,), jnp.bfloat16)
    return feats, jnp.asarray(rois), kernel, bias


def fc(x, kernel, bias):
    return jax.nn.relu(
        jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            kernel,
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        + bias
    )


def main():
    feats, rois, kernel, bias = make_inputs()

    def variant_a(i, *args):
        f, r, k_, b_ = args[:4], args[4], args[5], args[6]
        pooled = ra.multiscale_roi_align_batch(f, r + i * 1e-3, STRIDES)
        x = pooled.reshape(B, S, FDIM)
        return fc(x, k_, b_).astype(jnp.float32).sum()

    def variant_b(i, *args):
        f, r, k_, b_ = args[:4], args[4], args[5], args[6]
        pooled = ra._batch_window_kernel(f, r + i * 1e-3, STRIDES, 7, 2)
        x = pooled.reshape(B, S, FDIM)
        return fc(x, k_, b_).astype(jnp.float32).sum()

    def variant_c(i, *args):
        f, r, k_, b_ = args[:4], args[4], args[5], args[6]
        rr = r + i * 1e-3
        from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
            roi_window_geometry,
            window_dims,
            _round8,
        )

        level_dims = tuple((x.shape[1], x.shape[2]) for x in f)
        k = min(ra.OVERSIZE_K, S)
        win_y, win_x = window_dims(level_dims)
        w_pad = max(_round8(max(d[1] for d in level_dims)) + 8, win_x)
        over = jax.vmap(
            lambda r_: (
                ~roi_window_geometry(
                    r_, level_dims, STRIDES, 7, 2, win_y, win_x, w_pad
                )[4]
            ).sum()
        )(rr).max()

        def fast(_):
            pooled = ra._batch_window_kernel(f, rr, STRIDES, 7, 2)
            return fc(pooled.reshape(B, S, FDIM), k_, b_)

        def corner(_):
            pooled = ra._corner_batch_chunked(f, rr, STRIDES, 7, 2)
            return fc(pooled.reshape(B, S, FDIM), k_, b_)

        out = jax.lax.cond(over <= k, fast, corner, None)
        return out.astype(jnp.float32).sum()

    args = (*feats, rois, kernel, bias)
    for name, fn in (
        ("A production cond->reshape->fc6", variant_a),
        ("B cond-free fast->reshape->fc6 ", variant_b),
        ("C fc6 inside cond branches     ", variant_c),
    ):
        t, *_ = chain_time(fn, k_lo=2, k_hi=6, args=args)
        print(f"{name}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
