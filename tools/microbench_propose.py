"""Attribute the FPN propose cost (~2-4 ms/image at A=160k anchors).

After the rpn_targets layout fix, propose is the next [A, *]-minor
consumer: softmax over [A,2], decode/clip over [A,4], then top_k and
the tiled NMS. This times the full propose (test and train regimes) and
its stages in isolation to see whether the pre-top_k elementwise part
carries the same lane-padding cost.

Run: python tools/microbench_propose.py
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

from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model
from faster_rcnn_pytorch_tpu.models.rpn import propose
from faster_rcnn_pytorch_tpu.ops.boxes import cxcy_to_xy, decode, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.nms import nms

CANVAS = 800


def main():
    rs = np.random.RandomState(0)
    model, cfg = build_model("fpn", num_classes=91)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    a = anchors.shape[0]
    rpn_cls = jnp.asarray(rs.normal(size=(a, 2)).astype(np.float32))
    rpn_reg = jnp.asarray((rs.normal(size=(a, 4)) * 0.1).astype(np.float32))
    extent = jnp.ones((2,), jnp.float32)

    def full_test(i, c, r):
        p = propose(
            c + i * 1e-6, r, anchors, extent,
            pre_k=cfg.pre_nms_test, post_k=cfg.post_nms_test,
            nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
            nms_tile=cfg.rpn_nms_tile,
        )
        return p.rois.sum() + jnp.where(jnp.isfinite(p.scores), p.scores, 0.0).sum()

    def full_train(i, c, r):
        p = propose(
            c + i * 1e-6, r, anchors, extent,
            pre_k=cfg.pre_nms_train, post_k=cfg.post_nms_train,
            nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
            nms_tile=cfg.rpn_nms_tile,
        )
        return p.rois.sum() + jnp.where(jnp.isfinite(p.scores), p.scores, 0.0).sum()

    def pre_topk(i, c, r):
        fg = jax.nn.softmax(c + i * 1e-6, axis=-1)[:, 1]
        boxes = cxcy_to_xy(decode(r, xy_to_cxcy(anchors)))
        hi = jnp.concatenate([extent, extent])
        boxes = jnp.clip(boxes, 0.0, hi[None, :])
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        ok = (ws >= cfg.proposal_min_size) & (hs >= cfg.proposal_min_size)
        score = jnp.where(ok, fg, -jnp.inf)
        return jnp.where(jnp.isfinite(score), score, 0.0).sum() + boxes.sum()

    def topk_gather(i, c, r):
        fg = jax.nn.softmax(c + i * 1e-6, axis=-1)[:, 1]
        boxes = cxcy_to_xy(decode(r, xy_to_cxcy(anchors)))
        s, idx = jax.lax.top_k(fg, cfg.pre_nms_test)
        return s.sum() + boxes[idx].sum()

    def nms_only(i, c, r):
        boxes = jnp.asarray(
            rs.uniform(0, 1, size=(cfg.pre_nms_test, 4)).astype(np.float32)
        )
        scores = jnp.sort(
            jnp.asarray(rs.uniform(size=(cfg.pre_nms_test,)).astype(np.float32))
        )[::-1] + i * 1e-9
        _, keep, rois, sc = nms(
            boxes, scores, cfg.rpn_nms_iou, post_k=cfg.post_nms_test,
            valid=jnp.ones((cfg.pre_nms_test,), bool),
            tile=cfg.rpn_nms_tile, assume_sorted=True, return_boxes=True,
        )
        return rois.sum() + jnp.where(jnp.isfinite(sc), sc, 0.0).sum()

    for name, fn in (
        (f"FULL propose test (pre{cfg.pre_nms_test}->post{cfg.post_nms_test})", full_test),
        (f"FULL propose train (pre{cfg.pre_nms_train}->post{cfg.post_nms_train})", full_train),
        ("pre-top_k (softmax+decode+clip+mask)", pre_topk),
        (f"top_k {cfg.pre_nms_test} + box gather", topk_gather),
        (f"NMS only ({cfg.pre_nms_test}->{cfg.post_nms_test})", nms_only),
    ):
        t, *_ = chain_time(fn, args=(rpn_cls, rpn_reg))
        print(f"{name:44s}: {t*1e3:7.2f} ms (A={a})")


if __name__ == "__main__":
    main()
