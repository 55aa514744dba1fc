"""Benchmark harness: single-chip inference throughput of the flagship
LegacyFRCNN (VGG16) predict path at the reference's 800px eval resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md: FPS printed at
runtime only, GPU model unstated); ``vs_baseline`` is computed against a
measured-once PyTorch reference estimate stored below (single-image VGG16
Faster R-CNN on a datacenter GPU is commonly ~5-15 FPS; we use 10 img/s
as the nominal baseline until a GPU measurement exists).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: the predict program takes minutes to
# compile through the TPU tunnel; repeat bench runs reuse it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/frt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

NOMINAL_BASELINE_IMG_PER_SEC = 10.0
BATCH = 4
CANVAS = 800
WARMUP = 3
ITERS = 40  # large N amortises the tunnelled-TPU queue ramp


def main() -> None:
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        predict,
    )

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import init_detector_params

    model, cfg = build_model("legacy", num_classes=21)
    rs = np.random.RandomState(0)
    params = init_detector_params(model, jax.random.key(0))

    base = jnp.asarray(
        rs.normal(size=(BATCH, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    # Distinct device-resident inputs defeat any backend memoisation;
    # blocking once at the end measures pipelined (serving) throughput
    # rather than tunnel round-trip latency.
    images = [base + 0.001 * i for i in range(ITERS + WARMUP)]
    jax.block_until_ready(images)
    extents = jnp.ones((BATCH, 2), jnp.float32)

    @jax.jit
    def fn(params, images, extents):
        return model.apply(params, cfg, images, extents, method=predict)

    outs = [fn(params, im, extents) for im in images[:WARMUP]]
    jax.block_until_ready(outs)

    t0 = time.perf_counter()
    outs = [fn(params, im, extents) for im in images[WARMUP:]]
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "legacy_vgg16_predict_800px_images_per_sec",
                "value": round(img_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    img_per_sec / NOMINAL_BASELINE_IMG_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
