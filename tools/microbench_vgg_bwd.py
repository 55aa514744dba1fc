"""Chain-timed per-layer fwd+bwd attribution of the VGG16 backbone.

Companion to the forward table in DESIGN.md §6: finds where the 105 ms
backbone fwd+bwd (vs 18.3 ms fwd) actually goes, layer by layer, and
separates grad-wrt-input from grad-wrt-filter cost for the worst layer.

Run: python tools/microbench_vgg_bwd.py [batch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from tools.chaintime import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
# (hw, cin, cout) for each distinct conv shape in VGG16 at 800px, with
# its multiplicity in the stack.
LAYERS = (
    ("conv1_1", 800, 3, 64, 1),
    ("conv1_2", 800, 64, 64, 1),
    ("conv2_1", 400, 64, 128, 1),
    ("conv2_2", 400, 128, 128, 1),
    ("conv3_1", 200, 128, 256, 1),
    ("conv3_x", 200, 256, 256, 2),
    ("conv4_1", 100, 256, 512, 1),
    ("conv4_x", 100, 512, 512, 2),
    ("conv5_x", 50, 512, 512, 3),
)


def main():
    rs = np.random.RandomState(0)
    total_f = total_fb = 0.0
    rows = []
    for name, hw, cin, cout, mult in LAYERS:
        x = jnp.asarray(
            rs.normal(size=(B, hw, hw, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rs.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
        )

        def conv(ww, xx):
            return jax.lax.conv_general_dilated(
                xx,
                ww.astype(jnp.bfloat16),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fwd(i, ww, xx):
            return (
                conv(ww, xx + i.astype(jnp.bfloat16) * 1e-3)
                .astype(jnp.float32)
                .sum()
            )

        tf, *_ = chain_time(fwd, k_lo=2, k_hi=6, args=(w, x))

        def fwdbwd(i, ww, xx):
            gw, gx = jax.grad(
                lambda a, b: (conv(a, b).astype(jnp.float32) ** 2).sum(),
                argnums=(0, 1),
            )(ww, xx + i.astype(jnp.bfloat16) * 1e-3)
            return (gw.astype(jnp.float32) ** 2).sum() + (
                gx.astype(jnp.float32) ** 2
            ).sum()

        tfb, *_ = chain_time(fwdbwd, k_lo=2, k_hi=6, args=(w, x))

        # grad wrt filter only (activation-side grad dropped)
        def fwd_gw(i, ww, xx):
            gw = jax.grad(
                lambda a: (conv(a, xx + i.astype(jnp.bfloat16) * 1e-3)
                           .astype(jnp.float32) ** 2).sum()
            )(ww)
            return (gw.astype(jnp.float32) ** 2).sum()

        tgw, *_ = chain_time(fwd_gw, k_lo=2, k_hi=6, args=(w, x))

        flop = 2 * B * hw * hw * 9 * cin * cout
        rows.append((name, mult, tf, tfb, tgw, flop))
        total_f += mult * tf
        total_fb += mult * tfb

    print(f"{'layer':8} {'xN':>2} {'fwd ms':>8} {'f+b ms':>8} "
          f"{'f+gw ms':>8} {'bwd/fwd':>7} {'fwd TF/s':>8}")
    for name, mult, tf, tfb, tgw, flop in rows:
        print(
            f"{name:8} x{mult:1d} {tf * 1e3:8.2f} {tfb * 1e3:8.2f} "
            f"{tgw * 1e3:8.2f} {tfb / max(tf, 1e-9):7.1f} "
            f"{flop / max(tf, 1e-9) / 1e12:8.1f}"
        )
    print(f"sum of layers: fwd {total_f * 1e3:.1f} ms, "
          f"fwd+bwd {total_fb * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
