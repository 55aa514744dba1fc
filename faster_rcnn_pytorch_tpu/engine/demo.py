"""Image-folder demo inference (counterpart of demo.py:22-134).

Reference behaviour: glob ``demo_root/*.{type}``, normalise without
resizing (variable-size input, demo.py:11-19), predict with a confidence
threshold (typically 0.5), draw boxes with OpenCV, write to
``demo_root/detection_results/``, print FPS (demo.py:59-66).

Static-shape twist: each image is padded up to a /64-aligned canvas so
jit re-compiles only once per size bucket instead of once per image size.
"""

from __future__ import annotations

import functools
import glob
import os
import time

import jax
import numpy as np

from faster_rcnn_pytorch_tpu.data.loader import load_image
from faster_rcnn_pytorch_tpu.data.transforms import normalize
from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict
from faster_rcnn_pytorch_tpu.utils.label_info import class_colors, class_names


def _pad_to_bucket(image: np.ndarray, align: int = 64):
    h, w = image.shape[:2]
    ch = -(-h // align) * align
    cw = -(-w // align) * align
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:h, :w] = normalize(image)
    extent = np.array([w / cw, h / ch], np.float32)
    return canvas, extent


def draw_detections(image, boxes, labels, scores, names, colors):
    import cv2

    out = np.ascontiguousarray(image[:, :, ::-1])  # RGB -> BGR
    for box, lab, score in zip(boxes, labels, scores):
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        color = tuple(int(c) for c in colors[lab % len(colors)])
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        caption = f"{names[lab]}: {score:.2f}"
        (tw, th), _ = cv2.getTextSize(caption, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (x1, y1 - th - 4), (x1 + tw, y1), color, -1)
        cv2.putText(
            out, caption, (x1, y1 - 2), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
            (0, 0, 0), 1, cv2.LINE_AA,
        )
    return out


def demo(model, cfg, params, opts) -> list[dict]:
    """Run inference over ``opts.demo_root``; returns per-image results."""
    paths = sorted(
        glob.glob(os.path.join(opts.demo_root, f"*.{opts.demo_image_type}"))
    )
    out_dir = os.path.join(opts.demo_root, "detection_results")
    os.makedirs(out_dir, exist_ok=True)
    names = class_names(opts.data_type, opts.model_generation)
    colors = class_colors(len(names))
    thres = opts.thres  # used as-is, like the reference (demo.py:43)

    # One-time fp32->bf16 weight cast (bit-identical; utils/params.py).
    from faster_rcnn_pytorch_tpu.utils.params import (
        cast_inference_params,
        model_compute_dtype,
    )

    params = cast_inference_params(params, model_compute_dtype(model))

    @functools.partial(jax.jit)
    def predict_fn(p, image, extent):
        return model.apply(
            p, cfg, image[None], extent[None], score_threshold=thres,
            method=predict,
        )

    results = []
    t0 = time.time()
    for n, path in enumerate(paths):
        raw = load_image(path)
        h, w = raw.shape[:2]
        canvas, extent = _pad_to_bucket(raw)
        det = predict_fn(params, canvas, extent)
        valid = np.asarray(det.valid[0])
        scale = np.array([canvas.shape[1], canvas.shape[0]] * 2, np.float32)
        boxes = np.asarray(det.boxes[0])[valid] * scale
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
        labels = np.asarray(det.labels[0])[valid]
        scores = np.asarray(det.scores[0])[valid]
        results.append({"path": path, "boxes": boxes, "labels": labels, "scores": scores})
        print(f"{os.path.basename(path)}: {len(scores)} detections (thres={thres})")
        if opts.demo_vis:
            try:
                import cv2

                vis = draw_detections(raw, boxes, labels, scores, names, colors)
                cv2.imwrite(
                    os.path.join(out_dir, os.path.basename(path)), vis
                )
            except ImportError:
                pass
        if (n + 1) % 100 == 0:
            fps = (n + 1) / (time.time() - t0)
            print(f"[{n + 1}/{len(paths)}] {fps:.2f} FPS")
    if paths:
        print(f"demo done: {len(paths)} images, "
              f"{len(paths) / (time.time() - t0):.2f} FPS")
    return results
