"""Chain-timed A/B of max-pool backward formulations on the chip.

The legacy train profile shows backbone fwd+bwd at ~105 ms vs an 18.3 ms
forward (5.7x; ~3x expected). Suspect: ``nn.max_pool`` lowers to
``lax.reduce_window`` whose gradient is XLA SelectAndScatter — slow on
TPU. Candidate: reshape-based 2x2/s2 pool ``x.reshape(n, h/2, 2, w/2, 2,
c).max((2, 4))`` whose backward is dense eq-mask arithmetic.

Run: python tools/microbench_pool_bwd.py
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

B = 4
SHAPES = ((800, 64), (400, 128), (200, 256), (100, 512))


def reduce_window_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def reshape_pool(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def main():
    rs = np.random.RandomState(0)
    for hw, c in SHAPES:
        x = jnp.asarray(
            rs.normal(size=(B, hw, hw, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        for name, pool in (
            ("reduce_window", reduce_window_pool),
            ("reshape      ", reshape_pool),
        ):

            def fwdbwd(i, xx):
                g = jax.grad(
                    lambda v: (pool(v).astype(jnp.float32) ** 2).sum()
                )(xx + i.astype(jnp.bfloat16) * 1e-3)
                return (g.astype(jnp.float32) ** 2).sum()

            t, *_ = chain_time(fwdbwd, k_lo=2, k_hi=8, args=(x,))

            def fwd(i, xx):
                return (
                    pool(xx + i.astype(jnp.bfloat16) * 1e-3)
                    .astype(jnp.float32)
                    .sum()
                )

            tf, *_ = chain_time(fwd, k_lo=2, k_hi=8, args=(x,))
            print(
                f"{hw}x{hw}x{c}  {name}: fwd {tf * 1e3:7.2f} ms   "
                f"fwd+bwd {t * 1e3:7.2f} ms"
            )


if __name__ == "__main__":
    main()
