"""Stage-level timing of the FPN predict path on the attached chip.

Each stage is its own jitted program timed with the pipelined large-N
pattern (>=30 distinct device-resident inputs, one final block) — the
only reliable wall-clock methodology through the tunnelled runtime
(DESIGN.md). Stage sums won't exactly equal end-to-end (fusion across
stage boundaries is lost) but attribute where the time goes.

Run: python tools/profile_fpn.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402
_enable_cache()

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (  # noqa: E402
    build_model,
    init_detector_params,
    predict,
)
from faster_rcnn_pytorch_tpu.models import anchors as anchor_lib  # noqa: E402
from faster_rcnn_pytorch_tpu.models.rpn import propose  # noqa: E402
from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms  # noqa: E402
from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_batch  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CANVAS = 800
ITERS = 30
WARMUP = 3


def timed(name, fn, inputs):
    outs = [fn(*inputs[i]) for i in range(WARMUP)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*inputs[WARMUP + i]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:9.3f} ms/batch{BATCH}")
    return outs[-1], dt


def main():
    model, cfg = build_model("fpn", num_classes=91)
    rs = np.random.RandomState(0)
    params = init_detector_params(model, jax.random.key(0))

    base = jnp.asarray(rs.normal(size=(BATCH, CANVAS, CANVAS, 3)).astype(np.float32))
    images = [base + 1e-4 * i for i in range(ITERS + WARMUP)]
    jax.block_until_ready(images)
    extents = jnp.ones((BATCH, 2), jnp.float32)
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    total = 0.0

    # stage 1: backbone
    feats_fn = jax.jit(lambda p, im: model.apply(p, im, method="features"))
    feats, dt = timed("backbone (ResNet50+FPN)", feats_fn, [(params, im) for im in images])
    total += dt

    feats_list = [tuple(f + 1e-4 * i for f in feats) for i in range(ITERS + WARMUP)]
    jax.block_until_ready(feats_list)

    # stage 2: rpn head over 5 levels
    rpn_fn = jax.jit(lambda p, f: model.apply(p, f, method="rpn_out"))
    (rpn_cls, rpn_reg), dt = timed("rpn head (5 levels)", rpn_fn, [(params, f) for f in feats_list])
    total += dt

    cls_list = [rpn_cls + 1e-4 * i for i in range(ITERS + WARMUP)]
    jax.block_until_ready(cls_list)

    # stage 3: propose (255k anchors -> 1000 rois)
    def propose_fn(c, r):
        return jax.vmap(
            lambda ci, ri, e: propose(
                ci, ri, anchors, e,
                pre_k=cfg.pre_nms_test, post_k=cfg.post_nms_test,
                nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
                nms_tile=cfg.rpn_nms_tile,
            )
        )(c, r, extents)

    propose_jit = jax.jit(propose_fn)
    props, dt = timed(
        f"propose ({anchors.shape[0]} anchors)", propose_jit,
        [(c, rpn_reg) for c in cls_list],
    )
    total += dt

    rois_list = [jnp.clip(props.rois + 1e-5 * i, 0, 1) for i in range(ITERS + WARMUP)]
    jax.block_until_ready(rois_list)

    # stage 4a: multiscale roi align alone
    scale = jnp.array([CANVAS, CANVAS, CANVAS, CANVAS], jnp.float32)

    def align_fn(f, r):
        # batch entry point: keeps the oversize-fallback cond OUTSIDE
        # vmap (a vmapped cond lowers to select and runs both paths).
        return multiscale_roi_align_batch(
            (f[0], f[1], f[2], f[3]), r * scale, strides=(4, 8, 16, 32)
        )

    align_jit = jax.jit(align_fn)
    _, dt = timed(
        f"multiscale_roi_align ({cfg.post_nms_test} rois)", align_jit,
        [(feats, r) for r in rois_list],
    )

    # stage 4: full head (align + FCs)
    head_fn = jax.jit(
        lambda p, f, r: model.apply(p, f, r, (CANVAS, CANVAS), method="head")
    )
    (head_cls, head_reg), dt = timed(
        "head (align + fc6/fc7 + cls/reg)", head_fn,
        [(params, feats, r) for r in rois_list],
    )
    total += dt

    # stage 5: decode + multiclass nms
    probs = jax.nn.softmax(head_cls, axis=-1)
    boxes = jnp.clip(
        jnp.tile(rois_list[0][:, :, None, :], (1, 1, cfg.num_classes, 1)), 0, 1
    )
    probs_list = [probs * (1 - 1e-5 * i) for i in range(ITERS + WARMUP)]
    jax.block_until_ready(probs_list)

    def nms_fn(b, p):
        return jax.vmap(
            lambda bb, pp: multiclass_nms(
                bb, pp, cfg.score_threshold, cfg.nms_iou,
                num_classes=cfg.num_classes,
                per_class_k=cfg.max_detections, max_det=cfg.max_detections,
            )
        )(b, p)

    nms_jit = jax.jit(nms_fn)
    _, dt = timed(
        f"multiclass_nms ({cfg.num_classes - 1} classes)", nms_jit,
        [(boxes, p) for p in probs_list],
    )
    total += dt

    print(f"{'stage sum':34s} {total:9.3f} ms/batch{BATCH}")

    # end-to-end for reference
    e2e = jax.jit(lambda p, im: model.apply(p, cfg, im, extents, method=predict))
    _, dt = timed("end-to-end predict", e2e, [(params, im) for im in images])
    print(f"=> {BATCH / (dt / 1000):.1f} img/s")


if __name__ == "__main__":
    main()
