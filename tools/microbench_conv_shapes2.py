"""Does the batch>=8 fast-conv effect extend to stage 2 (128 ch)?

Companion to microbench_conv_shapes.py: VGG stage-2 shapes (128x128 at
400px) and the 3->64 conv1_1, batch vs slab-equivalent batch at equal
work, fwd and fwd+bwd. Decides whether _slab_stage should also cover
stage 2 / conv1_1-only variants.

Run: python tools/microbench_conv_shapes2.py
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

# (b, h, w, cin, cout): stage-2 conv2_2 equal-work factorizations, then
# conv2_1 (64->128) and conv1_1 (3->64) pairs.
SHAPES = (
    (2, 400, 400, 128, 128),
    (4, 400, 400, 128, 128),
    (8, 200, 400, 128, 128),   # b4 slabbed S=2
    (16, 100, 400, 128, 128),  # b4 slabbed S=4
    (8, 400, 400, 128, 128),
    (4, 400, 400, 64, 128),    # conv2_1
    (16, 100, 400, 64, 128),   # conv2_1 slabbed S=4
    (4, 800, 800, 3, 64),      # conv1_1
    (16, 200, 800, 3, 64),     # conv1_1 slabbed S=4
)


def main():
    rs = np.random.RandomState(0)
    for b, h, wid, cin, cout in SHAPES:
        w = jnp.asarray(
            (rs.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
        )
        x = jnp.asarray(
            rs.normal(size=(b, h, wid, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def conv(ww, xx):
            return jax.lax.conv_general_dilated(
                xx,
                ww.astype(jnp.bfloat16),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fwd(i, xx):
            return conv(w, xx + i.astype(jnp.bfloat16) * 1e-3).astype(
                jnp.float32
            ).sum()

        t, *_ = chain_time(fwd, k_lo=2, k_hi=6, args=(x,))

        def fwdbwd(i, xx):
            gw, gx = jax.grad(
                lambda a, v: (conv(a, v).astype(jnp.float32) ** 2).sum(),
                argnums=(0, 1),
            )(w, xx + i.astype(jnp.bfloat16) * 1e-3)
            return (gw.astype(jnp.float32) ** 2).sum() + (
                gx.astype(jnp.float32) ** 2
            ).sum()

        tb, *_ = chain_time(fwdbwd, k_lo=2, k_hi=6, args=(x,))
        flop = 2 * b * h * wid * 9 * cin * cout
        print(
            f"[{b:3d},{h:4d},{wid:4d},{cin:3d}->{cout:3d}]  "
            f"fwd {t * 1e3:7.2f} ms {flop / max(t, 1e-9) / 1e12:6.1f} TF/s   "
            f"f+b {tb * 1e3:7.2f} ms"
        )


if __name__ == "__main__":
    main()
