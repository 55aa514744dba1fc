"""A/B: per-sample (2,2,c) corner gather vs per-bin (W,W,c) window gather.

The current multiscale_roi_align issues one gather index per bilinear
sample (n*196 per image). The per-bin formulation issues one index per
output bin (n*49) with a (W,W,c) slice — same bytes at W=4, 4x fewer
indices. If the gather is index-issue bound (DESIGN.md: ~23M idx/s),
this should be ~4x faster.

Run: python tools/microbench_binwindow.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

from tools.chaintime import chain_time

B, N, C, P, U = 2, 1000, 256, 7, 2
S = P * U
H, W_BUF = 375, 200  # level-stacked buffer for an 800x800 canvas


def main():
    rs = np.random.RandomState(0)
    buf = jnp.asarray(rs.normal(size=(B, H, W_BUF, C)).astype(np.float32))

    # per-sample starts: [B, N*S*S] (y, x) pairs
    ys = rs.randint(0, H - 2, size=(B, N * S * S, 1)).astype(np.int32)
    xs = rs.randint(0, W_BUF - 2, size=(B, N * S * S, 1)).astype(np.int32)
    samp_starts = jnp.asarray(np.concatenate([ys, xs], -1))
    w_samp = jnp.asarray(rs.rand(B, N * S * S, 2, 2, 1).astype(np.float32))

    # per-bin starts: [B, N*P*P]
    ysb = rs.randint(0, H - 4, size=(B, N * P * P, 1)).astype(np.int32)
    xsb = rs.randint(0, W_BUF - 4, size=(B, N * P * P, 1)).astype(np.int32)
    bin_starts = jnp.asarray(np.concatenate([ysb, xsb], -1))
    w_bin = jnp.asarray(rs.rand(B, N * P * P, 4, 4, 1).astype(np.float32))

    def gather_reduce(slice_hw):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))

        def one(buf1, starts1, w1):
            g = jax.lax.gather(buf1, starts1, dn,
                               slice_sizes=(slice_hw, slice_hw, C),
                               mode="clip")
            return (g * w1).sum(axis=(1, 2))

        return one

    def step_samp(i, buf, starts, w):
        out = jax.vmap(gather_reduce(2))(buf + i * 1e-6, starts, w)
        return out.sum()

    def step_bin(i, buf, starts, w):
        out = jax.vmap(gather_reduce(4))(buf + i * 1e-6, starts, w)
        return out.sum()

    t, *_ = chain_time(step_samp, args=(buf, samp_starts, w_samp))
    print(f"f32  per-sample (2,2,{C}) x {B * N * S * S} idx: {t * 1e3:8.3f} ms")
    t, *_ = chain_time(step_bin, args=(buf, bin_starts, w_bin))
    print(f"f32  per-bin    (4,4,{C}) x {B * N * P * P} idx: {t * 1e3:8.3f} ms")

    buf16 = buf.astype(jnp.bfloat16)

    def step_samp16(i, buf, starts, w):
        out = jax.vmap(
            lambda b, s, ww: gather_reduce(2)(b + jnp.bfloat16(i) * jnp.bfloat16(1e-6), s, ww)
        )(buf, starts, w)
        return out.sum()

    def step_bin16(i, buf, starts, w):
        out = jax.vmap(
            lambda b, s, ww: gather_reduce(4)(b + jnp.bfloat16(i) * jnp.bfloat16(1e-6), s, ww)
        )(buf, starts, w)
        return out.sum()

    t, *_ = chain_time(step_samp16, args=(buf16, samp_starts, w_samp.astype(jnp.bfloat16)))
    print(f"bf16 per-sample (2,2,{C}) x {B * N * S * S} idx: {t * 1e3:8.3f} ms")
    t, *_ = chain_time(step_bin16, args=(buf16, bin_starts, w_bin.astype(jnp.bfloat16)))
    print(f"bf16 per-bin    (4,4,{C}) x {B * N * P * P} idx: {t * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
