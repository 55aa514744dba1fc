"""Chain-time the FULL predict programs (legacy b4, FPN b2).

Separates on-device step time from the tunnel's per-dispatch floor: the
pipelined bench rows include ~3-5 ms/step of dispatch overhead that a
production (non-tunnelled) deployment would not pay; the chaintime slope
is the pure on-device number. Both are recorded in DESIGN.md §6 next to
the MFU statements.

Run on the chip: python tools/chaintime_predict.py
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

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    init_detector_params,
    predict,
)
from faster_rcnn_pytorch_tpu.utils.params import (
    cast_inference_params,
    model_compute_dtype,
)

CANVAS = 800


def run(generation: str, batch: int) -> None:
    model, cfg = build_model(
        generation, num_classes=21 if generation == "legacy" else 91
    )
    rs = np.random.RandomState(0)
    params = cast_inference_params(
        init_detector_params(model, jax.random.key(0)),
        model_compute_dtype(model),
    )
    images = jnp.asarray(
        rs.normal(size=(batch, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.ones((batch, 2), jnp.float32)

    def step(i, p, im, ex):
        det = model.apply(p, cfg, im + i * 1e-5, ex, method=predict)
        leaves = jax.tree.leaves(det)
        return sum(
            jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float32).sum()
            for x in leaves
        )

    t, *_ = chain_time(step, k_lo=2, k_hi=6, args=(params, images, extents))
    print(
        f"{generation} predict b{batch}: {t*1e3:7.2f} ms/step on-device "
        f"= {batch/t:6.1f} img/s (chaintime, no dispatch floor)"
    )


def main():
    run("legacy", 4)
    run("fpn", 2)


if __name__ == "__main__":
    main()
