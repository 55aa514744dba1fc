"""Attribute the FPN rpn_targets cost at 159,882 anchors.

Times the full assignment, then its pieces in isolation: the masked IoU
matrix, the two noise top_k rankings, the per-gt tie logic, and the
encode tail — to find what actually costs at A=160k.

NB: the piece rows intentionally keep the ORIGINAL [A, G]-major /
[A, 4]-minor formulations — they are the historical attribution that
led to the gt-major/SoA rewrite in models/targets.py (FULL 3.89 ->
0.73 ms/b2 on v5e; see DESIGN.md §6 and
tools/microbench_encode_layout.py). Only the FULL row runs the current
code.

Run: python tools/microbench_rpn_targets.py
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
from faster_rcnn_pytorch_tpu.models.targets import rpn_targets
from faster_rcnn_pytorch_tpu.ops.boxes import encode, masked_iou, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.sampling import _group_rank_topk

BATCH = 2
CANVAS = 800
G = 24


def main():
    rs = np.random.RandomState(0)
    model, cfg = build_model("fpn", num_classes=91)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    a = anchors.shape[0]
    gt = jnp.asarray(
        np.concatenate(
            [
                rs.uniform(0, 0.5, size=(BATCH, G, 2)),
                rs.uniform(0.5, 1.0, size=(BATCH, G, 2)),
            ],
            -1,
        ).astype(np.float32)
    )
    gt_mask = jnp.ones((BATCH, G), bool)

    def full(i, an, g, m):
        out = jax.vmap(
            lambda gi, mi: rpn_targets(
                an, gi + i * 1e-6, mi, jnp.ones((2,), jnp.float32),
                jax.random.key(0), allow_ties=True, boundary_filter=False,
            )
        )(g, m)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    def iou_only(i, an, g, m):
        out = jax.vmap(lambda gi, mi: masked_iou(an, gi + i * 1e-6, mi))(g, m)
        return out.sum()

    def iou_maxes(i, an, g, m):
        def one(gi, mi):
            iou = masked_iou(an, gi + i * 1e-6, mi)
            return (
                iou.max(axis=1).sum()
                + iou.argmax(axis=1).sum()
                + iou.max(axis=0).sum()
                + (iou == iou.max(axis=0)[None, :]).sum()
            )
        return jax.vmap(one)(g, m).sum()

    def topk_only(i, an, g, m):
        def one(gi, mi):
            noise = jax.random.uniform(jax.random.key(0), (a,)) + i * 1e-9
            mask = noise > 0.5
            r1 = _group_rank_topk(noise, mask, 128)
            r2 = _group_rank_topk(noise * 0.7, ~mask, 256)
            return (r1 + r2).sum()
        return jax.vmap(one)(g[:, 0, 0], m[:, 0]).sum()

    def encode_only(i, an, g, m):
        def one(gi, mi):
            matched = gi[jnp.zeros((a,), jnp.int32)]
            return encode(
                xy_to_cxcy(matched + i * 1e-6), xy_to_cxcy(an), eps=1e-8
            ).sum()
        return jax.vmap(one)(g, m).sum()

    for name, fn in (
        ("FULL rpn_targets", full),
        ("masked_iou only", iou_only),
        ("iou + maxes/argmaxes/ties", iou_maxes),
        ("2x _group_rank_topk", topk_only),
        ("encode tail", encode_only),
    ):
        t, *_ = chain_time(fn, args=(anchors, gt, gt_mask))
        print(f"{name:28s}: {t*1e3:7.2f} ms/b{BATCH} (A={a})")


if __name__ == "__main__":
    main()
