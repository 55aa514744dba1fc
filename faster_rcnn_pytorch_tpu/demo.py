"""Standalone demo CLI (counterpart of demo.py:141-173 ``demo_worker``).

``python -m faster_rcnn_pytorch_tpu.demo --config configs/voc_train.txt \
      --demo_root ./demo --thres 0.5``
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.config import load_options
from faster_rcnn_pytorch_tpu.engine.demo import demo
from faster_rcnn_pytorch_tpu.main import init_params
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    label_offset_for,
)
from faster_rcnn_pytorch_tpu.utils.checkpoint import resolve_and_load_params
from faster_rcnn_pytorch_tpu.utils.logging import print0


def main(argv=None) -> int:
    from faster_rcnn_pytorch_tpu.utils.runtime import setup_runtime

    setup_runtime()
    opts = load_options(argv)
    # num_classes by data type (demo.py:150-153).
    if opts.data_type == "voc":
        opts.num_classes = 21
    elif opts.model_generation == "legacy":
        opts.num_classes = 81
    else:
        opts.num_classes = 91
    dtype = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32
    model, cfg = build_model(
        opts.model_generation, opts.num_classes, dtype,
        label_offset=label_offset_for(opts.model_generation, opts.data_type),
    )
    params = init_params(model, opts)
    params, note = resolve_and_load_params(opts, params)
    print0(note)
    demo(model, cfg, params, opts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
