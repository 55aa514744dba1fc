"""A/B the batch axis of propose at FPN predict shapes (b2, A=159,882).

The in-program cumulative attribution charges vmapped propose 4.6 ms/b2
while the isolated single-image propose chain-times at ~1.0 ms — the
vmapped lowering (batched sort/top_k + lockstep while-loop NMS with
batch-indexed dynamic slices) costs ~2.3x per image. Candidates:

  vmap   — production
  map    — lax.map over the batch axis (sequential, body compiled once)
  unroll — python loop over the static batch (exact per-image program)

All three are mathematically identical per image (same propose()).

Run on the chip: python tools/microbench_propose_batch.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CANVAS = 800


def main():
    model, cfg = build_model("fpn", num_classes=91)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    a = anchors.shape[0]
    rs = np.random.RandomState(0)
    rpn_cls = jnp.asarray(rs.normal(size=(BATCH, a, 2)).astype(np.float32))
    rpn_reg = jnp.asarray(
        (rs.normal(size=(BATCH, a, 4)) * 0.1).astype(np.float32)
    )
    extents = jnp.ones((BATCH, 2), jnp.float32)

    def one(c, r, e):
        return propose(
            c, r, anchors, e,
            pre_k=cfg.pre_nms_test, post_k=cfg.post_nms_test,
            nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
            nms_tile=cfg.rpn_nms_tile,
        )

    def reduce(p):
        return (
            p.rois.astype(jnp.float32).sum()
            + jnp.where(jnp.isfinite(p.scores), p.scores, 0.0).sum()
        )

    def via_vmap(i, c, r, e):
        return reduce(jax.vmap(one)(c + i * 1e-6, r, e))

    def via_map(i, c, r, e):
        return reduce(jax.lax.map(lambda t: one(*t), (c + i * 1e-6, r, e)))

    def via_unroll(i, c, r, e):
        tot = jnp.float32(0.0)
        for b in range(BATCH):
            tot = tot + reduce(one(c[b] + i * 1e-6, r[b], e[b]))
        return tot

    for name, fn in (
        ("vmap (production)", via_vmap),
        ("lax.map          ", via_map),
        ("unrolled         ", via_unroll),
    ):
        t, *_ = chain_time(fn, k_lo=2, k_hi=6, args=(rpn_cls, rpn_reg, extents))
        print(f"propose b{BATCH} {name}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
