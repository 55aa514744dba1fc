"""A/B + correctness: Pallas scatter-accumulate align backward vs the
dense-matmul VJP, on the real chip at the FPN head's production shapes.

Correctness first: the kernel's RMW hazard protocol (write-after-write
through overlapping windows) cannot be exercised by the sequential
Pallas interpreter, so this script compares the REAL kernel against the
dense VJP on an overlap-heavy roi set (a clump of near-identical boxes)
before timing. Run after any change to ops/pallas/roi_window_kernel.py.

Usage: python tools/microbench_align_bwd.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

from faster_rcnn_pytorch_tpu.ops.roi_align import _dense_vjp  # noqa: E402
from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (  # noqa: E402
    roi_window_align_bwd,
)
from tools.chaintime import chain_time  # noqa: E402

B, C, CAN = 2, 256, 800
STRIDES = (4, 8, 16, 32)


def make_rois(rs, n):
    xy1 = rs.uniform(0, 600, size=(B, n - 16, 2))
    wh = np.exp(rs.uniform(np.log(8), np.log(500), size=(B, n - 16, 2)))
    r = np.concatenate([xy1, np.minimum(xy1 + wh, CAN)], -1)
    # Overlap-heavy clump: near-identical windows on consecutive rois
    # after any reordering — stresses the RMW hazard waits.
    clump = np.tile(np.array([[100.0, 100.0, 260.0, 260.0]]), (B, 16, 1))
    clump += rs.uniform(-4, 4, size=clump.shape)
    clump[..., 2:] = np.maximum(clump[..., 2:], clump[..., :2] + 4)
    return jnp.asarray(np.concatenate([r, clump], axis=1).astype(np.float32))


def main():
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(
            rs.normal(size=(B, CAN // s, CAN // s, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for s in STRIDES
    )
    level_dims = tuple((f.shape[1], f.shape[2]) for f in feats)

    # --- correctness: real kernel vs dense VJP (fits-masked both sides)
    rois = make_rois(rs, 256)
    g = jnp.asarray(
        rs.normal(size=(B, 256, 7, 7, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dfs, fits = jax.block_until_ready(
        roi_window_align_bwd(g, rois, level_dims, STRIDES, 7, 2)
    )
    gz = (g.astype(jnp.float32) * fits[..., None, None, None]).astype(g.dtype)
    want = _dense_vjp(feats, rois, gz, STRIDES, 7, 2)
    n_bad = 0
    for lvl, (got_l, want_l) in enumerate(zip(dfs, want)):
        a = np.asarray(got_l, np.float32)
        b = np.asarray(want_l, np.float32)
        err = np.abs(a - b) / np.maximum(np.abs(b), 1e-2)
        bad = int((err > 2e-2).sum())  # bf16 inputs: ~1% tolerance
        n_bad += bad
        print(
            f"level {lvl}: max rel err {err.max():.2e}  "
            f"({bad} cells beyond tolerance)"
        )
    fitn = int(np.asarray(fits).sum())
    print(f"fits: {fitn}/{fits.size} rois via kernel")
    if n_bad:
        print("CORRECTNESS FAIL — do not trust the timings below")
    else:
        print("correctness OK")

    # --- timing
    for n in (512, 1000):
        rois = make_rois(rs, n)
        g = jnp.asarray(
            rs.normal(size=(B, n, 7, 7, C)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def dense_path(i, f, r, gg):
            out = _dense_vjp(f, r + i * 1e-3, gg, STRIDES, 7, 2)
            return sum(o.astype(jnp.float32).sum() for o in out)

        def kernel_path(i, f, r, gg):
            out, _ = roi_window_align_bwd(
                gg, r + i * 1e-3, level_dims, STRIDES, 7, 2
            )
            return sum(o.astype(jnp.float32).sum() for o in out)

        t, *_ = chain_time(dense_path, args=(feats, rois, g))
        print(f"dense-matmul VJP     b{B}x{n}: {t * 1e3:8.2f} ms")
        t, *_ = chain_time(kernel_path, args=(feats, rois, g))
        print(f"scatter-accum kernel b{B}x{n}: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
