"""Evaluation loop (counterpart of test.py:13-164 ``test_and_eval``).

Per image: jitted ``predict`` on the padded canvas -> fixed [max_det]
detections -> rescale from canvas-normalised to original pixel coords ->
feed the COCO-protocol or VOC evaluator. One device->host transfer per
batch; the per-class NMS already ran on device (unlike the reference's
CPU/GPU ping-pong per class, models/model.py:382-402).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict
from faster_rcnn_pytorch_tpu.utils.logging import print0


def _jitted_predict(model, cfg, score_threshold=None, mesh=None, params=None):
    # score_threshold is closed over as a static Python float (it gates a
    # comparison inside the statically-shaped multiclass NMS).
    # Output is PACKED into one [B, D, 7] f32 array (xyxy, label, score,
    # valid): the tunnelled runtime pays a full round trip per host
    # fetch, and fetching four arrays per image serialized ~5 round
    # trips/image (~220 ms/img eval floor); one packed fetch per batch
    # is one.
    from faster_rcnn_pytorch_tpu.serving import pack_detections

    def fn(params, images, extents):
        det = model.apply(
            params, cfg, images, extents, score_threshold, method=predict
        )
        return pack_detections(det)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(fn)

    # SPMD eval: batch rows sharded over the mesh's `data` axis so the
    # per-epoch eval uses every chip like the train step does (a plain
    # jit with mesh-replicated params runs the SAME work on all devices
    # — device-count x redundancy, single-device throughput). Params
    # follow their training placement (replicated, or Megatron TP specs
    # for the roi-head FCs — parallel/mesh.py:tree_shardings).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from faster_rcnn_pytorch_tpu.parallel.mesh import (
        DATA_AXIS,
        tree_shardings,
    )

    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        fn,
        in_shardings=(tree_shardings(params, mesh), data, data),
        out_shardings=data,
    )


def detections_to_original_coords(packed, batch, i):
    """Canvas-normalised packed detections (host [B, D, 7] ndarray) ->
    original-image pixel xyxy for image ``i``."""
    d = packed[i]
    valid = d[:, 6] > 0.5
    boxes = d[valid, :4]
    labels = d[valid, 4].astype(np.int64)
    scores = d[valid, 5]
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
    mesh=None,
    dump_path: str | None = None,
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
      mesh: optional ``jax.sharding.Mesh``; with >1 devices, predict runs
        SPMD with batch rows sharded over the ``data`` axis (the global
        batch — per-host rows x hosts — must divide by the data-axis
        size; the loader wrap-pads every batch to a fixed size).
    """
    import dataclasses

    if max_detections is None and data_type == "voc":
        max_detections = cfg.post_nms_test * (cfg.num_classes - 1)
    if max_detections is not None and max_detections != cfg.max_detections:
        cfg = dataclasses.replace(cfg, max_detections=max_detections)
    # Hoist the per-step fp32->bf16 weight cast out of the jitted predict
    # (bit-identical outputs; ~0.8 GB/step of HBM cast traffic for the
    # legacy VGG16 — see utils/params.py).
    from faster_rcnn_pytorch_tpu.utils.params import (
        cast_inference_params,
        model_compute_dtype,
    )

    params = cast_inference_params(params, model_compute_dtype(model))
    if mesh is not None and mesh.devices.size > 1:
        from faster_rcnn_pytorch_tpu.parallel.mesh import shard_tree

        data_size = mesh.devices.shape[0]
        global_batch = loader.batch_size * jax.process_count()
        if global_batch % data_size:
            raise ValueError(
                f"SPMD eval needs the global eval batch ({loader.batch_size}"
                f" per host x {jax.process_count()} hosts) divisible by the"
                f" mesh data axis ({data_size}); set --eval_batch_size"
            )
        params = shard_tree(params, mesh)  # no-op if already placed
    else:
        mesh = None
    predict_fn = _jitted_predict(model, cfg, score_threshold, mesh, params)
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

    def consume(packed, batch):
        nonlocal n_img
        for i in range(batch["image"].shape[0]):
            boxes, labels, scores = detections_to_original_coords(
                packed, batch, i
            )
            img_id = int(batch["image_id"][i])
            predictions[img_id] = {
                "boxes": boxes,
                "labels": label_table[labels],
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
    # dispatch is async and the host fetch is the sync point. The fetch
    # itself pays a full runtime round trip (tunnelled backends: tens of
    # ms), so fetches run on a small thread pool — overlapping both the
    # next batches' device work AND each other's round-trip latency —
    # instead of alternating dispatch/fetch/dispatch like the
    # reference's per-image loop (test.py:38-88). Packed [B, D, 7]
    # output keeps it to one fetch per batch (see _jitted_predict).
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pending: deque = deque()
    dispatched = 0

    multihost = mesh is not None and jax.process_count() > 1
    if multihost:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from faster_rcnn_pytorch_tpu.parallel.mesh import DATA_AXIS

        data_sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        # Multi-host SPMD: each host's loader shard is its slice of the
        # global batch (make_mesh orders devices process-major, so slice
        # h of the global array lands on host h's devices).
        if multihost:
            return jax.make_array_from_process_local_data(
                data_sh, np.ascontiguousarray(x)
            )
        return x

    def fetch(det):
        # Host-local rows only: with a global mesh the full array is not
        # addressable from one process, and each host consumes exactly
        # the predictions for its own loader shard.
        if multihost:
            shards = sorted(
                det.addressable_shards,
                key=lambda s: s.index[0].start or 0,
            )
            return np.concatenate([np.asarray(s.data) for s in shards])
        return np.asarray(det)

    with ThreadPoolExecutor(max_workers=4) as pool:
        for batch in loader.epoch(0):
            det = predict_fn(
                params,
                put(batch["image"]),
                put(batch["extent"].astype(np.float32)),
            )
            pending.append(
                (pool.submit(lambda d=det: fetch(d)), batch)
            )
            dispatched += batch["image"].shape[0]
            if len(pending) >= 16:
                fut, b = pending.popleft()
                consume(fut.result(), b)
            if max_images and dispatched >= max_images:
                break
        while pending:
            fut, b = pending.popleft()
            consume(fut.result(), b)
    infer_time = time.time() - t0
    n_det = sum(len(p["scores"]) for p in predictions.values())
    print0(
        f"eval inference: {n_img} images in {infer_time:.1f}s "
        f"({n_img / max(infer_time, 1e-9):.2f} img/s), "
        f"{n_det} detections above threshold"
    )

    if dump_path:
        # This host's shard of raw detections + gts, for offline
        # cross-stack diffing (tools/dualstack_parity decomposition).
        import pickle

        with open(dump_path, "wb") as f:
            pickle.dump({"predictions": predictions, "gts": gts}, f)
        print0(
            f"dumped {len(predictions)} images' detections to {dump_path}"
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
