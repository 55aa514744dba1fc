"""Evaluation loop (counterpart of test.py:13-164 ``test_and_eval``).

Per image: jitted ``predict`` on the padded canvas -> fixed [max_det]
detections -> rescale from canvas-normalised to original pixel coords ->
feed the COCO-protocol or VOC evaluator. One device->host transfer per
batch; the per-class NMS already ran on device (unlike the reference's
CPU/GPU ping-pong per class, models/model.py:382-402).
"""

from __future__ import annotations

import functools
import time

import jax
import numpy as np

from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict
from faster_rcnn_pytorch_tpu.utils.logging import print0


def _jitted_predict(model, cfg, score_threshold=None):
    # score_threshold is closed over as a static Python float (it gates a
    # comparison inside the statically-shaped multiclass NMS).
    @functools.partial(jax.jit, static_argnames=())
    def fn(params, images, extents):
        return model.apply(
            params, cfg, images, extents, score_threshold, method=predict
        )

    return fn


def detections_to_original_coords(det, batch, i):
    """Canvas-normalised detections -> original-image pixel xyxy."""
    valid = np.asarray(det.valid[i])
    boxes = np.asarray(det.boxes[i])[valid]
    labels = np.asarray(det.labels[i])[valid]
    scores = np.asarray(det.scores[i])[valid]
    canvas_h, canvas_w = batch["image"].shape[1:3]
    rh, rw = batch["resized_hw"][i]
    oh, ow = batch["orig_hw"][i]
    # canvas [0,1] -> resized px -> original px (test.py:68-71 rescales by
    # the stored true size).
    scale = np.array(
        [canvas_w * ow / rw, canvas_h * oh / rh] * 2, np.float32
    )
    return boxes * scale, labels, scores


def evaluate(
    model,
    cfg,
    params,
    loader,
    data_type: str = "voc",
    coco_index=None,
    label_map=None,
    score_threshold: float | None = None,
    max_images: int | None = None,
    max_detections: int | None = None,
) -> dict:
    """Run the full eval pass; returns {"map": ..., "stats": ...}.

    Args:
      label_map: callable mapping model 0-based foreground label ->
        dataset category id. Defaults: identity (voc), contiguous->cat
        (coco legacy) must be supplied by the caller.
      max_detections: per-image detection budget. Default: COCO keeps the
        protocol's maxDets=100; VOC keeps every per-class NMS survivor
        like the reference ``_suppress`` (models/model.py:382-402 has no
        cap) — post_k rois x (C-1) classes is an exact uncapped budget.
    """
    import dataclasses

    if max_detections is None and data_type == "voc":
        max_detections = cfg.post_nms_test * (cfg.num_classes - 1)
    if max_detections is not None and max_detections != cfg.max_detections:
        cfg = dataclasses.replace(cfg, max_detections=max_detections)
    predict_fn = _jitted_predict(model, cfg, score_threshold)
    # Vectorise the fg-label -> dataset-category mapping once (model
    # labels are 0..C-2); the per-detection Python loop was O(dets).
    label_map = label_map or (lambda x: x)
    label_table = np.asarray(
        [label_map(i) for i in range(cfg.num_classes - 1)], np.int64
    )

    predictions: dict[int, dict] = {}
    gts: dict[int, dict] = {}
    t0 = time.time()
    n_img = 0

    def consume(det, batch):
        nonlocal n_img
        for i in range(batch["image"].shape[0]):
            boxes, labels, scores = detections_to_original_coords(det, batch, i)
            img_id = int(batch["image_id"][i])
            predictions[img_id] = {
                "boxes": boxes,
                "labels": label_table[np.asarray(labels, np.int64)],
                "scores": scores,
            }
            if data_type == "voc":
                rec = loader.records_by_id[img_id]
                gts[img_id] = {
                    "boxes": rec.boxes,
                    "labels": rec.labels,
                    "difficult": rec.difficult,
                }
            n_img += 1

    # Keep a window of dispatched-but-unfetched batches in flight: jax
    # dispatch is async, and the host fetch in consume() is the sync
    # point — overlapping it with the next batches' device work (and the
    # runtime round-trip latency) instead of alternating
    # dispatch/fetch/dispatch like the reference's per-image loop
    # (test.py:38-88).
    from collections import deque

    pending: deque = deque()
    dispatched = 0
    for batch in loader.epoch(0):
        det = predict_fn(
            params, batch["image"], batch["extent"].astype(np.float32)
        )
        pending.append((det, batch))
        dispatched += batch["image"].shape[0]
        if len(pending) >= 8:
            consume(*pending.popleft())
        if max_images and dispatched >= max_images:
            break
    while pending:
        consume(*pending.popleft())
    infer_time = time.time() - t0
    n_det = sum(len(p["scores"]) for p in predictions.values())
    print0(
        f"eval inference: {n_img} images in {infer_time:.1f}s "
        f"({n_img / max(infer_time, 1e-9):.2f} img/s), "
        f"{n_det} detections above threshold"
    )

    if data_type == "voc":
        from faster_rcnn_pytorch_tpu.data.voc import VOC_CLASSES
        from faster_rcnn_pytorch_tpu.evaluation.voc_eval import voc_eval
        from faster_rcnn_pytorch_tpu.parallel.mesh import allgather_pyobj

        # Merge per-host shards like the COCO path (each host evaluated a
        # disjoint slice of the val set).
        import jax as _jax

        if _jax.process_count() > 1:
            for p, g in allgather_pyobj((predictions, gts)):
                predictions.update(p)
                gts.update(g)

        out = voc_eval(
            predictions,
            gts,
            num_classes=len(VOC_CLASSES),
            class_names=VOC_CLASSES,
        )
        return {"map": out["map"], "stats": out}

    from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator

    evaluator = CocoEvaluator(coco_index)
    evaluator.update(predictions)
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = evaluator.summarize()
    evaluator.print_summary()
    return {"map": float(stats[0]), "stats": stats}
