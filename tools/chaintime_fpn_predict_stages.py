"""Cumulative-prefix chaintime attribution of FPN predict b2.

The full program chain-times at ~20 ms but the isolated stage timings
sum to ~10-12 — pipelined stage numbers (tools/profile_fpn.py) and
isolated chaintimes both miss cross-stage effects. This measures
PREFIXES of the real predict computation under one methodology, so the
deltas are the honest per-stage costs inside the fused program:

  P0 backbone features
  P1 + rpn head
  P2 + propose (vmapped)
  P3 + head (MultiScaleRoIAlign + FCs)
  P4 + decode/softmax tail
  P5 + multiclass NMS (= full predict)

Run on the chip: python tools/chaintime_fpn_predict_stages.py [batch]
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
    REG_STD,
    _head_apply,
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.models.rpn import propose
from faster_rcnn_pytorch_tpu.ops.boxes import cxcy_to_xy, decode, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms
from faster_rcnn_pytorch_tpu.utils.params import (
    cast_inference_params,
    model_compute_dtype,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CANVAS = 800


def _sum(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return sum(
        jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0.0).sum()
        for x in leaves
    )


def main():
    model, cfg = build_model("fpn", num_classes=91)
    rs = np.random.RandomState(0)
    params = cast_inference_params(
        init_detector_params(model, jax.random.key(0)),
        model_compute_dtype(model),
    )
    images = jnp.asarray(
        rs.normal(size=(BATCH, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.ones((BATCH, 2), jnp.float32)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))

    def prefix(stop: int):
        # method-style fn (first arg = bound module) so model.head works
        def stage_fn(mdl, im, ex):
            feats = mdl.features(im)
            if stop == 0:
                return _sum(feats)
            rpn_cls, rpn_reg = mdl.rpn_out(feats)
            if stop == 1:
                return _sum((rpn_cls, rpn_reg))
            props = jax.vmap(
                lambda c, r, e: propose(
                    c, r, anchors, e,
                    pre_k=cfg.pre_nms_test, post_k=cfg.post_nms_test,
                    nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
                    nms_tile=cfg.rpn_nms_tile,
                )
            )(rpn_cls, rpn_reg, ex)
            if stop == 2:
                return _sum((props.rois, props.scores))
            head_cls, head_reg = _head_apply(
                mdl, feats, props.rois, (CANVAS, CANVAS)
            )
            if stop == 3:
                return _sum((head_cls, head_reg))
            s = cfg.post_nms_test
            probs = jax.nn.softmax(head_cls, axis=-1)
            probs = jnp.where(props.valid[:, :, None], probs, 0.0)
            reg = head_reg.reshape(BATCH, s, cfg.num_classes, 4) * REG_STD
            rois_c = xy_to_cxcy(props.rois)[:, :, None, :]
            boxes = jnp.clip(cxcy_to_xy(decode(reg, rois_c)), 0.0, 1.0)
            if stop == 4:
                return _sum((boxes, probs))
            out = jax.vmap(
                lambda b_, p_: multiclass_nms(
                    b_, p_, cfg.score_threshold, cfg.nms_iou,
                    num_classes=cfg.num_classes,
                    per_class_k=cfg.max_detections,
                    max_det=cfg.max_detections,
                )
            )(boxes, probs)
            return _sum(out)

        def fn(i, p, im, ex):
            return model.apply(p, im + i * 1e-5, ex, method=stage_fn)

        return fn

    names = [
        "P0 backbone",
        "P1 +rpn head",
        "P2 +propose",
        "P3 +align+FC head",
        "P4 +decode tail",
        "P5 +multiclass nms (full)",
    ]
    prev = 0.0
    for stop, name in enumerate(names):
        t, *_ = chain_time(
            prefix(stop), k_lo=2, k_hi=6, args=(params, images, extents)
        )
        print(
            f"{name:28s}: {t*1e3:7.2f} ms  (delta {t*1e3 - prev:+7.2f})"
        )
        prev = t * 1e3


if __name__ == "__main__":
    main()
