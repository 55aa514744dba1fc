"""Is the FPN RPN head's 3x3 conv batch-bound at b2 like the VGG stem?

The FPN train profile shows rpn head fwd+bwd ~5.7 ms/b2 (difference of
backbone+rpn_out and backbone chains) — ~3x the naive roofline for the
five 256->256 3x3 convs. This sweeps the per-level shapes at b2 vs
slab-equivalent batch>=8 factorizations at equal work, fwd and fwd+bwd,
to decide whether _slab_stage-style row slabbing belongs in rpn_out.

Run: python tools/microbench_rpn_head.py
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

# (b, h, w, cin, cout): P2 200x200 at b2, slab-equivalents, then the
# smaller levels (P3 100, P4 50 — P5/P6 are noise).
SHAPES = (
    (2, 200, 200, 256, 256),
    (8, 50, 200, 256, 256),    # b2 slabbed S=4
    (16, 25, 200, 256, 256),   # b2 slabbed S=8
    (2, 100, 100, 256, 256),   # P3
    (8, 25, 100, 256, 256),    # P3 slabbed S=4
    (2, 50, 50, 256, 256),     # P4
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
            f"b{b:<3d}{h:>4d}x{wid:<4d}{cin:>4d}->{cout:<4d}"
            f" fwd {t*1e3:7.3f} ms {flop/t/1e12:6.1f} TF/s"
            f" | fwd+bwd {tb*1e3:7.3f} ms {3*flop/tb/1e12:6.1f} TF/s"
        )


if __name__ == "__main__":
    main()
