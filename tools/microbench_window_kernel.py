"""A/B: per-roi window-DMA Pallas kernel vs XLA bin-window gather.

Chain-timed (tunnel-safe) on the real chip at the FPN head's two
production shapes: train (b2 x 512 rois) and predict (b2 x 1000 rois).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

from faster_rcnn_pytorch_tpu.ops.roi_align import (  # noqa: E402
    _batch_window_kernel,
    _single_fast,
)
from tools.chaintime import chain_time  # noqa: E402

B, C, CAN = 2, 256, 800
STRIDES = (4, 8, 16, 32)


def main():
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(
            rs.normal(size=(B, CAN // s, CAN // s, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for s in STRIDES
    )
    for n in (512, 1000):
        xy1 = rs.uniform(0, 600, size=(B, n, 2))
        wh = np.exp(rs.uniform(np.log(8), np.log(500), size=(B, n, 2)))
        rois = jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, 800)], -1).astype(
                np.float32
            )
        )

        def gather_path(i, f, r):
            out = jax.vmap(
                lambda ff, rr: _single_fast(ff, rr, STRIDES, 7, 2)
            )(f, r + i * 1e-3)
            return out.astype(jnp.float32).sum()

        def kernel_path(i, f, r):
            out = _batch_window_kernel(f, r + i * 1e-3, STRIDES, 7, 2)
            return out.astype(jnp.float32).sum()

        t, *_ = chain_time(gather_path, args=(feats, rois))
        print(f"bin-window gather  b{B}x{n}: {t * 1e3:8.2f} ms")
        t, *_ = chain_time(kernel_path, args=(feats, rois))
        print(f"window-DMA kernel  b{B}x{n}: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
