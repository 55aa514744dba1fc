"""Serving-export CLI: checkpoint -> self-contained AOT artifacts.

``python -m faster_rcnn_pytorch_tpu.export --config configs/voc_train.txt \
      --test_epoch best --export_dir ./export``

Exports the predict program for both canvas orientation buckets
(landscape and portrait, the loader's two static shapes) at
``--batch_size``, plus a ``manifest.json`` describing the calling
convention. The reference has no counterpart — its deployment story is
re-running model code in Python (demo.py:22-69); see ``serving.py``.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp

import jax

from faster_rcnn_pytorch_tpu.config import load_options
from faster_rcnn_pytorch_tpu.data.loader import canvas_buckets
from faster_rcnn_pytorch_tpu.main import init_params
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    label_offset_for,
)
from faster_rcnn_pytorch_tpu.serving import (
    PARAMS_SIDECAR,
    artifact_name,
    export_predict,
    save_artifact,
    save_params_sidecar,
    write_manifest,
)
from faster_rcnn_pytorch_tpu.utils.checkpoint import resolve_and_load_params
from faster_rcnn_pytorch_tpu.utils.logging import print0


def main(argv=None) -> int:
    from faster_rcnn_pytorch_tpu.utils.runtime import setup_runtime

    setup_runtime()
    opts = load_options(argv)

    platforms = None
    if opts.export_platforms:
        platforms = tuple(
            p.strip() for p in opts.export_platforms.split(",") if p.strip()
        )
        if set(platforms) != {jax.default_backend()}:
            # Any platform other than the one being traced needs the
            # pure-XLA op formulations: Pallas fast paths embed
            # backend-specific custom calls (serving.py cross-platform
            # notes).
            os.environ["FRT_ALIGN_KERNEL"] = "0"
            os.environ["FRT_FORCE_LAX_OPS"] = "1"

    # num_classes by data type, like the other CLIs (demo.py:150-153;
    # the train/test CLIs get it from build_dataloader, which export
    # deliberately does not need).
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

    params = init_params(model, opts)  # fresh init or .pth.tar import
    params, note = resolve_and_load_params(opts, params)
    print0(note)

    if opts.export_torch:
        # Reverse-migration mode: write a reference-format .pth.tar
        # (train.py:78-85 blob) instead of AOT serving artifacts, so a
        # TPU-trained model can be loaded by the reference ecosystem.
        from faster_rcnn_pytorch_tpu.utils.checkpoint import (
            save_torch_checkpoint,
        )

        save_torch_checkpoint(
            opts.export_torch, params, opts.model_generation
        )
        size_mb = os.path.getsize(opts.export_torch) / 1e6
        print0(f"wrote torch checkpoint {opts.export_torch} ({size_mb:.1f} MB)")
        return 0

    canvases = canvas_buckets(opts.resize, opts.max_size)

    os.makedirs(opts.export_dir, exist_ok=True)
    entries = []
    for canvas in canvases:
        exp = export_predict(
            model, cfg, params, canvas, opts.batch_size,
            score_threshold=opts.thres, platforms=platforms,
            params_as_args=opts.params_sidecar,
        )
        fname = artifact_name(canvas, opts.batch_size)
        save_artifact(exp, os.path.join(opts.export_dir, fname))
        size_mb = os.path.getsize(os.path.join(opts.export_dir, fname)) / 1e6
        entry = {
            "file": fname,
            "canvas_hw": list(canvas),
            "batch": opts.batch_size,
            "platforms": list(exp.platforms),
        }
        if opts.params_sidecar:
            entry["params_as_args"] = True
        entries.append(entry)
        print0(
            f"exported {fname} ({size_mb:.1f} MB, "
            f"platforms={list(exp.platforms)})"
        )

    extra = None
    if opts.params_sidecar:
        spath = os.path.join(opts.export_dir, PARAMS_SIDECAR)
        save_params_sidecar(model, params, spath)
        print0(
            f"wrote params sidecar {PARAMS_SIDECAR} "
            f"({os.path.getsize(spath) / 1e6:.1f} MB, shared by all buckets)"
        )
        extra = {"params_file": PARAMS_SIDECAR}

    mpath = write_manifest(opts.export_dir, entries, opts, extra=extra)
    print0(f"wrote {mpath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
