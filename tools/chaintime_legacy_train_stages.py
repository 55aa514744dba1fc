"""Cumulative-prefix chaintime attribution of the legacy train step.

Same methodology as tools/chaintime_fpn_predict_stages.py: measure
PREFIXES of the real forward_train + grad computation so the deltas
include cross-stage effects, pinning the ~10 ms the isolated stage
timings leave unattributed (DESIGN.md §6 round-3 legacy train table).

Prefixes (all under jax.grad where marked *):
  P0 * backbone features (train=True, slab stem)
  P1 * + rpn head
  P2 + propose TRAIN + both target makers (no grad — stop_gradient'd)
  P3 * + roi head on sampled rois
  P4 * + 4-part loss (= full grad program)
  P5 * + SGD momentum/weight-decay update (= full train step); the
       P5-P4 delta measures the optimizer directly (round-3's table
       left it as an HBM-traffic estimate — VERDICT r3 weak #3)

Run on the chip: python tools/chaintime_legacy_train_stages.py [batch]
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
    build_model,
    forward_train,
    init_detector_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
CANVAS = 800
MAX_GT = 24


def main():
    rs = np.random.RandomState(0)
    model, cfg = build_model("legacy", num_classes=21)
    params = init_detector_params(model, jax.random.key(0))

    images = jnp.asarray(
        rs.normal(size=(BATCH, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.ones((BATCH, 2), jnp.float32)
    xy1 = rs.uniform(0, 0.5, size=(BATCH, MAX_GT, 2))
    wh = rs.uniform(0.05, 0.4, size=(BATCH, MAX_GT, 2))
    gt_boxes = jnp.asarray(
        np.concatenate([xy1, np.minimum(xy1 + wh, 1.0)], -1).astype(np.float32)
    )
    gt_labels = jnp.asarray(
        rs.randint(0, 20, size=(BATCH, MAX_GT)).astype(np.int32)
    )
    gt_mask = jnp.asarray((np.arange(MAX_GT)[None, :] < 12).repeat(BATCH, 0))

    from faster_rcnn_pytorch_tpu.models.rpn import propose
    from faster_rcnn_pytorch_tpu.models.targets import (
        frcnn_targets,
        rpn_targets,
    )

    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))

    def grad_reduce(g):
        return sum(
            (x.astype(jnp.float32) ** 2).sum() for x in jax.tree.leaves(g)
        )

    def targets_stage(mdl, im, rng):
        feats = mdl.features(im, True)
        rpn_cls, rpn_reg = mdl.rpn_out(feats)
        rngs = jax.random.split(rng, (BATCH, 2))

        def per_image(c, r, e, b_, l_, m_, rr):
            props = propose(
                c, r, anchors, e,
                pre_k=cfg.pre_nms_train, post_k=cfg.post_nms_train,
                nms_iou=cfg.rpn_nms_iou, min_size=cfg.proposal_min_size,
                nms_tile=cfg.rpn_nms_tile_train or cfg.rpn_nms_tile,
            )
            tg = rpn_targets(
                anchors, b_, m_, e, rr[0],
                pos_iou=cfg.rpn_pos_iou, neg_iou=cfg.rpn_neg_iou,
                pos_quota=cfg.rpn_pos_quota, total_quota=cfg.rpn_total_quota,
                allow_ties=cfg.rpn_allow_ties,
                boundary_filter=cfg.rpn_boundary_filter,
            )
            roi = frcnn_targets(
                props.rois, props.valid, b_, l_, m_, rr[1],
                num_samples=cfg.roi_samples, pos_quota=cfg.roi_pos_quota,
                pos_iou=cfg.roi_pos_iou, label_offset=cfg.label_offset,
            )
            return tg, roi

        return jax.vmap(per_image)(
            rpn_cls, rpn_reg, extents, gt_boxes, gt_labels, gt_mask, rngs
        )

    def fn0(i, p, im):
        g = jax.grad(
            lambda pp: (
                model.apply(pp, im + i * 1e-4, True, method="features").astype(
                    jnp.float32
                )
                ** 2
            ).sum()
        )(p)
        return grad_reduce(g)

    def fn1(i, p, im):
        def loss(pp):
            def inner(mdl, x):
                f = mdl.features(x, True)
                c, r = mdl.rpn_out(f)
                return (c**2).sum() + (r**2).sum()

            return model.apply(pp, im + i * 1e-4, method=inner)

        return grad_reduce(jax.grad(loss)(p))

    def fn2(i, p, im):
        tg, roi = model.apply(
            p, im + i * 1e-4, jax.random.key(0), method=targets_stage
        )
        return (
            roi.rois.sum()
            + roi.labels.sum()
            + tg.labels.sum()
            + tg.reg_targets.sum()
        ).astype(jnp.float32)

    def fn3(i, p, im):
        def loss(pp):
            def inner(mdl, x):
                f = mdl.features(x, True)
                tg, roi = targets_stage(mdl, x, jax.random.key(0))
                hc, hr = mdl.head(f, roi.rois)
                return (hc**2).sum() + (hr**2).sum()

            return model.apply(pp, im + i * 1e-4, method=inner)

        return grad_reduce(jax.grad(loss)(p))

    def fn4(i, p, im, _os=None):
        def loss(pp):
            out = model.apply(
                pp, cfg, im + i * 1e-4, extents, gt_boxes, gt_labels,
                gt_mask, jax.random.key(0), method=forward_train,
            )
            l = out.losses
            return l.rpn_cls + l.rpn_reg + l.roi_cls + l.roi_reg

        return grad_reduce(jax.grad(loss)(p))

    import optax

    from faster_rcnn_pytorch_tpu.parallel.train_step import (
        make_lr_schedule,
        make_optimizer,
    )

    optimizer = make_optimizer(params, make_lr_schedule("constant", 1e-3, 1, 1))
    opt_state = optimizer.init(params)

    def fn5(i, p, im, os_):
        def loss(pp):
            out = model.apply(
                pp, cfg, im + i * 1e-4, extents, gt_boxes, gt_labels,
                gt_mask, jax.random.key(0), method=forward_train,
            )
            l = out.losses
            return l.rpn_cls + l.rpn_reg + l.roi_cls + l.roi_reg

        grads = jax.grad(loss)(p)
        updates, _ = optimizer.update(grads, os_, p)
        return grad_reduce(optax.apply_updates(p, updates))

    prev = 0.0
    for name, fn in (
        ("P0 grad(backbone)", fn0),
        ("P1 grad(+rpn head)", fn1),
        ("P2 propose+targets (no grad)", fn2),
        ("P3 grad(+roi head)", fn3),
        ("P4 grad(full loss)", fn4),
        ("P5 grad+SGD update = step", fn5),
    ):
        if fn in (fn0, fn1, fn2, fn3):
            t, *_ = chain_time(fn, k_lo=2, k_hi=5, args=(params, images))
        else:
            t, *_ = chain_time(
                fn, k_lo=2, k_hi=5, args=(params, images, opt_state)
            )
        print(f"{name:30s}: {t*1e3:8.2f} ms (delta {t*1e3-prev:+8.2f})")
        prev = t * 1e3


if __name__ == "__main__":
    main()
