"""Is the ResNet50 backbone batch-bound at train b2 like the VGG stem?

The FPN train profile shows backbone fwd+bwd 13.1 ms/b2 against a ~1 ms
forward — far above the canonical ~3x. This times the full backbone
(ResNet50+FPN neck) fwd and fwd+bwd at b2 800x800 vs equal-work b8
factorizations (smaller images, more of them) to see how much of that is
XLA's slow small-batch conv schedule vs inherent backward cost.

Equal-work comparisons are approximations of the slab headroom (no halo
cost included): if b8 at quarter-area runs ~2-3x faster per FLOP, a
per-stage slab pass like models/vgg.py's is worth building for ResNet.

Run: python tools/microbench_resnet_batch.py
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

from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model, init_detector_params

SHAPES = (
    (2, 800, 800),
    (8, 400, 400),   # equal work, batch 8
    (8, 200, 800),   # equal work, row-slab shape (S=4)
    (16, 100, 800),  # row-slab S=8
)


def main():
    rs = np.random.RandomState(0)
    model, cfg = build_model("fpn", num_classes=91)
    params = init_detector_params(model, jax.random.key(0))

    for b, h, w in SHAPES:
        images = jnp.asarray(
            rs.normal(size=(b, h, w, 3)).astype(np.float32)
        )

        def fwd(i, p, im):
            return sum(
                (x.astype(jnp.float32) ** 2).sum()
                for x in model.apply(p, im + i * 1e-4, method="features")
            )

        def fwdbwd(i, p, im):
            g = jax.grad(
                lambda pp: sum(
                    (x.astype(jnp.float32) ** 2).sum()
                    for x in model.apply(pp, im + i * 1e-4, method="features")
                )
            )(p)
            return sum((x * x).sum() for x in jax.tree.leaves(g))

        t, *_ = chain_time(fwd, k_lo=2, k_hi=5, args=(params, images))
        tb, *_ = chain_time(fwdbwd, k_lo=2, k_hi=5, args=(params, images))
        print(
            f"b{b:<3d}{h:>4d}x{w:<4d} fwd {t*1e3:7.2f} ms"
            f" | fwd+bwd {tb*1e3:7.2f} ms  (bwd/fwd {tb/max(t,1e-9):.1f}x)"
        )


if __name__ == "__main__":
    main()
