"""Why is conv1_2 (3x3, 64->64) 3x faster per-FLOP at batch 8 than 4?

Sweeps equal-work shape factorizations of the VGG stem conv — batch vs
height splits at constant B*H*W — to find which dimension triggers
XLA's fast strategy, plus bigger-batch points for the trend.

Run: python tools/microbench_conv_shapes.py
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

# equal total work (B*H = 3200 at W=800) in different factorizations,
# then the actual b4/b8 points and a width variant
SHAPES = (
    (1, 3200, 800),
    (2, 1600, 800),
    (4, 800, 800),
    (8, 400, 800),
    (16, 200, 800),
    (32, 100, 800),
    (8, 800, 800),   # the fast b8 point (2x work)
    (4, 800, 1600),  # b4 at 2x width (2x work)
)
CIN = COUT = 64


def main():
    rs = np.random.RandomState(0)
    w = jnp.asarray((rs.normal(size=(3, 3, CIN, COUT)) * 0.05).astype(np.float32))
    for b, h, wid in SHAPES:
        x = jnp.asarray(
            rs.normal(size=(b, h, wid, CIN)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def conv(xx):
            return jax.lax.conv_general_dilated(
                xx,
                w.astype(jnp.bfloat16),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fwd(i, xx):
            return (
                conv(xx + i.astype(jnp.bfloat16) * 1e-3).astype(jnp.float32).sum()
            )

        t, *_ = chain_time(fwd, k_lo=2, k_hi=6, args=(x,))
        flop = 2 * b * h * wid * 9 * CIN * COUT
        print(
            f"[{b:3d}, {h:4d}, {wid:4d}, {CIN}]  fwd {t * 1e3:7.2f} ms  "
            f"{flop / max(t, 1e-9) / 1e12:6.1f} TF/s"
        )


if __name__ == "__main__":
    main()
