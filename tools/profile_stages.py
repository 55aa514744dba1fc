"""Per-stage wall-clock attribution for predict, on the attached chip.

VERDICT round-1 weak #1/#5 asked for trace-driven attribution before
optimising. The tunnelled runtime makes raw ``jax.profiler`` traces
unreliable to fetch, so this script jits each pipeline stage separately
(backbone / RPN head / propose / roi head / NMS) with device-resident
inputs and measures pipelined wall-clock per stage — the same methodology
as bench.py, so the numbers compose with the headline rows.

Usage: python tools/profile_stages.py [legacy|fpn] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402
_enable_cache()


from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    FPNFRCNN,
    _head_apply,
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.models.rpn import propose
from faster_rcnn_pytorch_tpu.ops.boxes import cxcy_to_xy, decode, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms
from faster_rcnn_pytorch_tpu.models.targets import REG_STD

CANVAS = 800
WARMUP = 3
ITERS = 20


def timed(fn, feeds):
    outs = [fn(*feeds[i % len(feeds)]) for i in range(WARMUP)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*feeds[i % len(feeds)]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS


def main():
    generation = sys.argv[1] if len(sys.argv) > 1 else "fpn"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    model, cfg = build_model(
        generation, num_classes=21 if generation == "legacy" else 91
    )
    rs = np.random.RandomState(0)
    params = init_detector_params(model, jax.random.key(0))
    images = [
        jnp.asarray(rs.normal(size=(batch, CANVAS, CANVAS, 3)).astype(np.float32))
        for _ in range(4)
    ]
    extents = jnp.ones((batch, 2), jnp.float32)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))

    @jax.jit
    def backbone(params, im):
        return model.apply(params, im, method="features")

    @jax.jit
    def rpn(params, feats):
        return model.apply(params, feats, method="rpn_out")

    @jax.jit
    def run_propose(cls, reg, extents):
        return jax.vmap(
            lambda c, r, e: propose(
                c, r, anchors, e,
                pre_k=cfg.pre_nms_test, post_k=cfg.post_nms_test,
                nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
                nms_tile=cfg.rpn_nms_tile,
            )
        )(cls, reg, extents)

    @jax.jit
    def head(params, feats, rois):
        return model.apply(
            params, feats, rois, (CANVAS, CANVAS),
            method=lambda m, f, r, hw: _head_apply(m, f, r, hw),
        )

    @jax.jit
    def suppress(head_cls, head_reg, rois, valid):
        b = head_cls.shape[0]
        s = cfg.post_nms_test
        probs = jax.nn.softmax(head_cls, axis=-1)
        probs = jnp.where(valid[:, :, None], probs, 0.0)
        reg = head_reg.reshape(b, s, cfg.num_classes, 4) * REG_STD
        rois_c = xy_to_cxcy(rois)[:, :, None, :]
        boxes = jnp.clip(cxcy_to_xy(decode(reg, rois_c)), 0.0, 1.0)
        return jax.vmap(
            lambda bb, pp: multiclass_nms(
                bb, pp, cfg.score_threshold, cfg.nms_iou,
                num_classes=cfg.num_classes,
                per_class_k=cfg.max_detections, max_det=cfg.max_detections,
            )
        )(boxes, probs)

    feats = backbone(params, images[0])
    cls, reg = rpn(params, feats)
    props = run_propose(cls, reg, extents)
    hc, hr = head(params, feats, props.rois)
    jax.block_until_ready((feats, cls, reg, props, hc, hr))

    rows = []
    rows.append(("backbone", timed(backbone, [(params, im) for im in images])))
    rows.append(("rpn_head", timed(rpn, [(params, feats)])))
    rows.append(("propose(topk+nms)", timed(run_propose, [(cls, reg, extents)])))
    rows.append(("roi_head(align+fc)", timed(head, [(params, feats, props.rois)])))
    rows.append(("multiclass_nms", timed(suppress, [(hc, hr, props.rois, props.valid)])))

    total = sum(t for _, t in rows)
    print(f"\n{generation} predict {CANVAS}x{CANVAS} b{batch} — per-stage (ms):")
    for name, t in rows:
        print(f"  {name:24s} {t*1000:8.2f}  ({100*t/total:5.1f}%)")
    print(f"  {'SUM':24s} {total*1000:8.2f}")
    print(f"  stage-sum throughput: {batch/total:.1f} img/s")


if __name__ == "__main__":
    main()
