"""Standalone evaluation CLI (counterpart of test.py:172-212
``test_worker``): load a checkpoint (an epoch number, 'best', or a torch
.pth.tar for parity evaluation) and run the full eval protocol.

``python -m faster_rcnn_pytorch_tpu.test --config configs/voc_train.txt \
      --test_epoch best``
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.config import load_options
from faster_rcnn_pytorch_tpu.data.loader import build_dataloader
from faster_rcnn_pytorch_tpu.engine.evaluate import evaluate
from faster_rcnn_pytorch_tpu.main import init_params, label_map_for
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    label_offset_for,
)
from faster_rcnn_pytorch_tpu.utils.checkpoint import resolve_and_load_params
from faster_rcnn_pytorch_tpu.utils.logging import print0


def main(argv=None) -> int:
    from faster_rcnn_pytorch_tpu.utils.runtime import (
        apply_matmul_precision,
        setup_runtime,
    )

    setup_runtime()
    opts = load_options(argv)
    apply_matmul_precision(opts.matmul_precision)

    # SPMD eval over the local devices (single-host CLI): batch rows
    # shard over the mesh `data` axis exactly like main.py's per-epoch
    # eval. One device (single chip / plain CPU) degenerates to the
    # reference's sequential loop.
    import jax

    from faster_rcnn_pytorch_tpu.parallel.mesh import make_mesh

    mp = max(opts.model_parallel, 1)
    avail = opts.num_devices or len(jax.local_devices())
    n_dev = max((avail // mp) * mp, mp)
    mesh = make_mesh(n_dev, model_parallel=mp) if n_dev > 1 else None
    if opts.eval_batch_size == 0:
        opts.eval_batch_size = mesh.devices.shape[0] if mesh else 1

    _, test_loader = build_dataloader(opts)
    dtype = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32
    model, cfg = build_model(
        opts.model_generation, opts.num_classes, dtype,
        label_offset=label_offset_for(opts.model_generation, opts.data_type),
    )

    params = init_params(model, opts)  # fresh init or .pth.tar import
    params, note = resolve_and_load_params(opts, params)
    print0(note)

    coco_index = None
    if opts.data_type == "coco":
        import os

        from faster_rcnn_pytorch_tpu.data.coco import CocoIndex

        coco_index = CocoIndex(
            os.path.join(opts.data_root, "annotations", "instances_val2017.json")
        )

    result = evaluate(
        model,
        cfg,
        params,
        test_loader,
        data_type=opts.data_type,
        coco_index=coco_index,
        label_map=label_map_for(opts, coco_index),
        score_threshold=opts.thres,
        mesh=mesh,
        dump_path=opts.dump_detections or None,
    )
    print0(f"mAP = {result['map']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
