"""Real-data readiness drill: one command between "data appears" and
the BASELINE.md numbers.

Given a mounted VOC/COCO root and/or a released ``.pth.tar`` checkpoint,
this tool:

  1. validates the on-disk layout (the exact trees the loaders expect,
     data/voc.py:92-127 / data/coco.py:82-127 — same contracts the
     reference's downloaders produce, datasets/voc_dataset.py:18-62,
     datasets/coco_dataset.py:25-77);
  2. if a checkpoint is given, imports it through the product converter
     (utils/checkpoint.py import_legacy_torch_params — the reference's
     released ``frcnn.best.pth.tar``, README.md:104-111) and reports the
     parameter census;
  3. runs a bounded (<=N images) eval through the UNMODIFIED engine path
     (engine/evaluate.evaluate with max_images) and prints detections /
     mAP;
  4. prints the exact full-recipe commands that reproduce the published
     table (README.md:104-137 of the reference).

Proven against the synthetic shapes datasets (tests/test_preflight.py),
so the tool itself is known-good before real data ever mounts.

Usage:
  python tools/preflight_real_data.py --data_type voc --data_root /data/voc \
      [--checkpoint frcnn.best.pth.tar] [--limit 20] [--resize 800] \
      [--model_generation legacy] [--dtype bfloat16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_voc_layout(root: str) -> dict:
    """Counts + spot-checks for a VOC root; raises with a layout
    diagnosis when the tree is unusable."""
    from PIL import Image

    from faster_rcnn_pytorch_tpu.data.voc import (
        discover_voc_dirs,
        load_voc_records,
    )

    report: dict = {"root": root}
    if not os.path.isdir(root):
        raise SystemExit(f"[preflight] VOC root {root!r} is not a directory")
    for split in ("trainval", "test"):
        dirs = discover_voc_dirs(root, split)
        recs = load_voc_records(root, split)
        report[split] = {"dirs": dirs, "images": len(recs)}
        if not dirs:
            raise SystemExit(
                f"[preflight] no directory under {root} contains {split!r} "
                "in its name — expected e.g. "
                f"{root}/VOCtrainval_2007/VOCdevkit/VOC2007/{{JPEGImages,Annotations}} "
                "(data/voc.py:82-89 discovery contract)"
            )
        if not recs:
            raise SystemExit(
                f"[preflight] {dirs} matched split {split!r} but no "
                "(Annotations/*.xml, JPEGImages/*.jpg) pairs were found"
            )
        # Spot-check: first record's image opens and boxes are in-bounds.
        r = recs[0]
        with Image.open(r.image_path) as im:
            w, h = im.size
        if (w, h) != (r.width, r.height):
            raise SystemExit(
                f"[preflight] {r.image_path}: XML size "
                f"{(r.width, r.height)} != actual {(w, h)}"
            )
        if len(r.boxes) and not (
            r.boxes[:, 2].max() <= r.width
            and r.boxes[:, 3].max() <= r.height
        ):
            raise SystemExit(
                f"[preflight] {r.image_path}: boxes exceed image bounds"
            )
    return report


def check_coco_layout(root: str) -> dict:
    """Counts + spot-checks for a COCO root (train2017/val2017 +
    annotations/instances_*.json, the tree test.py:63-68 expects)."""
    from PIL import Image

    from faster_rcnn_pytorch_tpu.data.coco import load_coco_records

    report: dict = {"root": root}
    if not os.path.isdir(root):
        raise SystemExit(f"[preflight] COCO root {root!r} is not a directory")
    for split in ("train2017", "val2017"):
        ann = os.path.join(root, "annotations", f"instances_{split}.json")
        img_dir = os.path.join(root, split)
        if not os.path.exists(ann):
            raise SystemExit(
                f"[preflight] missing {ann} — expected "
                f"{root}/annotations/instances_{{train,val}}2017.json"
            )
        if not os.path.isdir(img_dir):
            raise SystemExit(f"[preflight] missing image dir {img_dir}")
        recs, index = load_coco_records(img_dir, ann)
        report[split] = {"images": len(recs), "categories": len(index.cats)}
        if not recs:
            raise SystemExit(f"[preflight] {ann} yielded zero usable images")
        r = recs[0]
        if not os.path.exists(r.image_path):
            raise SystemExit(
                f"[preflight] annotation names {os.path.basename(r.image_path)} "
                f"but it is absent from {img_dir} — partial image download?"
            )
        with Image.open(r.image_path) as im:
            w, h = im.size
        if (w, h) != (r.width, r.height):
            raise SystemExit(
                f"[preflight] {r.image_path}: index size mismatch"
            )
    return report


def check_checkpoint(path: str, generation: str, num_classes: int) -> dict:
    """Import a released torch checkpoint through the product converter
    and report its census."""
    from faster_rcnn_pytorch_tpu.utils.checkpoint import (
        import_legacy_torch_params,
        load_torch_state_dict,
    )
    from faster_rcnn_pytorch_tpu.utils.pretrained import _looks_like_checkpoint

    if not os.path.exists(path):
        raise SystemExit(f"[preflight] checkpoint {path!r} does not exist")
    reason = _looks_like_checkpoint(path)
    if reason is not None:
        raise SystemExit(
            f"[preflight] {path!r} does not look like a torch checkpoint: "
            f"{reason}"
        )
    sd = load_torch_state_dict(path)
    if generation != "legacy":
        raise SystemExit(
            "[preflight] only the legacy generation has released "
            "checkpoints (reference README.md:104-111)"
        )
    params = import_legacy_torch_params(sd, num_classes=num_classes)
    import numpy as np

    n = sum(int(np.prod(v.shape)) for v in _leaves(params))
    return {"path": path, "torch_keys": len(sd), "params": n}


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def run_mini_eval(opts, limit: int) -> dict:
    """<=limit-image eval through the unmodified engine path."""
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.data.loader import build_dataloader
    from faster_rcnn_pytorch_tpu.engine.evaluate import evaluate
    from faster_rcnn_pytorch_tpu.main import init_params, label_map_for
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        label_offset_for,
    )
    from faster_rcnn_pytorch_tpu.utils.checkpoint import resolve_and_load_params

    _, test_loader = build_dataloader(opts)
    dtype = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32
    model, cfg = build_model(
        opts.model_generation, opts.num_classes, dtype,
        label_offset=label_offset_for(opts.model_generation, opts.data_type),
    )
    params = init_params(model, opts)
    params, note = resolve_and_load_params(opts, params)
    print(f"[preflight] {note}")

    coco_index = None
    if opts.data_type == "coco":
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
        max_images=limit,
    )
    return {"map": float(result["map"]), "images": limit}


def full_recipe_commands(opts) -> list[str]:
    """The exact commands that reproduce the published table once the
    preflight passes (reference README.md:104-137)."""
    if opts.data_type == "voc":
        return [
            "# VOC07 train -> AP50 71.00 (75.81 with 07+12 in the root):",
            f"python -m faster_rcnn_pytorch_tpu.main --config configs/voc_train.txt "
            f"--data_root {opts.data_root}"
            + (f" --pretrained_backbone auto" if not opts.checkpoint else ""),
            "# eval the released checkpoint directly:",
            f"python -m faster_rcnn_pytorch_tpu.test --config configs/voc_train.txt "
            f"--data_root {opts.data_root} --checkpoint <frcnn.best.pth.tar>",
        ]
    return [
        "# COCO legacy recipe -> mAP 20.7:",
        f"python -m faster_rcnn_pytorch_tpu.main --config configs/coco_train.txt "
        f"--data_root {opts.data_root} --pretrained_backbone auto",
        "# exp1 FPN recipe -> mAP 24.1 (4-way data parallel):",
        f"python -m faster_rcnn_pytorch_tpu.main --config configs/coco_fpn_train.txt "
        f"--data_root {opts.data_root} --pretrained_backbone auto",
        "# eval a checkpoint:",
        f"python -m faster_rcnn_pytorch_tpu.test --config configs/coco_train.txt "
        f"--data_root {opts.data_root} --checkpoint <ckpt>",
    ]


def main(argv=None) -> int:
    import json

    from faster_rcnn_pytorch_tpu.config import load_options

    opts = load_options(argv)
    limit = int(os.environ.get("FRT_PREFLIGHT_LIMIT", "20"))

    print(f"[preflight] data layout check: {opts.data_type} at {opts.data_root}")
    if opts.data_type == "voc":
        layout = check_voc_layout(opts.data_root)
    else:
        layout = check_coco_layout(opts.data_root)
    print(f"[preflight] layout ok: {json.dumps(layout, default=str)}")

    if opts.checkpoint.endswith((".pth", ".pth.tar")):
        census = check_checkpoint(
            opts.checkpoint,
            opts.model_generation,
            # legacy class counts per data type (data/loader.py:529,550)
            21 if opts.data_type == "voc" else 81,
        )
        print(f"[preflight] checkpoint ok: {json.dumps(census)}")

    mini = run_mini_eval(opts, limit)
    print(f"[preflight] mini eval ok: {json.dumps(mini)}")

    print("[preflight] PASS — full published-recipe commands:")
    for line in full_recipe_commands(opts):
        print("  " + line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
