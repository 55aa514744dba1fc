"""Chain-timed attribution of the LEGACY (VGG16) train step on the chip.

The legacy train step runs ~30 img/s at b4 while predict runs ~160 —
train is ~5.3x the forward, but fwd+bwd should cost ~3x. This tool
attributes the gap: full grad step, backbone fwd+bwd, rpn head fwd+bwd,
propose in the TRAIN regime (pre 12000 -> NMS -> 2000, vs test's
6000 -> 300), rpn/frcnn target assignment, and the roi head fwd+bwd
(RoIPool over 128 sampled rois + the 25088->4096 FCs).

Run: python tools/profile_legacy_train.py [batch]
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
    gt = np.concatenate(
        [
            rs.uniform(0, 0.5, size=(BATCH, MAX_GT, 2)),
            rs.uniform(0.5, 1.0, size=(BATCH, MAX_GT, 2)),
        ],
        -1,
    ).astype(np.float32)
    gt_boxes = jnp.asarray(gt)
    gt_labels = jnp.asarray(rs.randint(0, 20, size=(BATCH, MAX_GT)), jnp.int32)
    gt_mask = jnp.ones((BATCH, MAX_GT), bool)

    # ---- full train step: grad of the summed loss wrt params ----
    def full_step(i, p, im):
        def loss_fn(pp):
            out = model.apply(
                pp,
                cfg,
                im + i * 1e-5,
                extents,
                gt_boxes,
                gt_labels,
                gt_mask,
                jax.random.key(0),
                method=forward_train,
            )
            l = out.losses
            return l.rpn_cls + l.rpn_reg + l.roi_cls + l.roi_reg

        g = jax.grad(loss_fn)(p)
        return sum((x.astype(jnp.float32) ** 2).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(full_step, k_lo=2, k_hi=5, args=(params, images))
    full_ms = t * 1e3
    print(f"FULL train step (grad)        : {full_ms:8.2f} ms/b{BATCH}  "
          f"({BATCH / t:.1f} img/s)")

    # ---- backbone fwd+bwd ----
    # train=True engages the slab-batched stem exactly as the real train
    # forward does (models/vgg.py _slab_factor); the plain-stem variant
    # is timed too so the slab win stays visible in the table.
    def backbone_fwdbwd(train):
        def fn(i, p, im):
            g = jax.grad(
                lambda pp: (
                    model.apply(
                        pp, im + i * 1e-4, train, method="features"
                    ).astype(jnp.float32)
                    ** 2
                ).sum()
            )(p)
            return sum(
                (x.astype(jnp.float32) ** 2).sum() for x in jax.tree.leaves(g)
            )

        return fn

    t, *_ = chain_time(
        backbone_fwdbwd(True), k_lo=2, k_hi=5, args=(params, images)
    )
    print(f"backbone fwd+bwd (slab stem)  : {t * 1e3:8.2f} ms")
    t, *_ = chain_time(
        backbone_fwdbwd(False), k_lo=2, k_hi=5, args=(params, images)
    )
    print(f"backbone fwd+bwd (plain stem) : {t * 1e3:8.2f} ms")

    feats = jax.jit(lambda p, im: model.apply(p, im, method="features"))(
        params, images
    )

    # ---- rpn head fwd+bwd over the conv5 map ----
    def rpn_fwdbwd(i, p, f):
        def loss_fn(pp):
            c, r = model.apply(pp, f + i * 1e-4, method="rpn_out")
            return (c.astype(jnp.float32) ** 2).sum() + (
                r.astype(jnp.float32) ** 2
            ).sum()

        g = jax.grad(loss_fn)(p)
        return sum((x.astype(jnp.float32) ** 2).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(rpn_fwdbwd, args=(params, feats))
    print(f"rpn head fwd+bwd              : {t * 1e3:8.2f} ms")

    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    rpn_cls = jnp.asarray(
        rs.normal(size=(BATCH, anchors.shape[0], 2)).astype(np.float32)
    )
    rpn_reg = jnp.asarray(
        rs.normal(size=(BATCH, anchors.shape[0], 4)).astype(np.float32) * 0.1
    )

    # ---- propose, TRAIN regime (12000 -> NMS(0.7) -> 2000) ----
    from faster_rcnn_pytorch_tpu.models.rpn import propose

    def propose_train(i, c, r):
        p = jax.vmap(
            lambda ci, ri, ei: propose(
                ci + i * 1e-6,
                ri,
                anchors,
                ei,
                pre_k=cfg.pre_nms_train,
                post_k=cfg.post_nms_train,
                nms_iou=cfg.rpn_nms_iou,
                min_size=cfg.proposal_min_size,
                nms_tile=cfg.rpn_nms_tile_train or cfg.rpn_nms_tile,
            )
        )(c, r, extents)
        return p.rois.sum() + p.valid.sum()

    t, *_ = chain_time(propose_train, k_lo=2, k_hi=6, args=(rpn_cls, rpn_reg))
    print(
        f"propose train (pre{cfg.pre_nms_train}->post{cfg.post_nms_train})"
        f" : {t * 1e3:8.2f} ms"
    )

    # ---- rpn target assignment ({A} anchors x {MAX_GT} gt) ----
    from faster_rcnn_pytorch_tpu.models.targets import frcnn_targets, rpn_targets

    def rpn_tgt(i, a, g, m):
        out = jax.vmap(
            lambda gi, mi: rpn_targets(
                a,
                gi + i * 1e-6,
                mi,
                jnp.ones((2,), jnp.float32),
                jax.random.key(0),
                pos_iou=cfg.rpn_pos_iou,
                neg_iou=cfg.rpn_neg_iou,
                pos_quota=cfg.rpn_pos_quota,
                total_quota=cfg.rpn_total_quota,
                allow_ties=cfg.rpn_allow_ties,
                boundary_filter=cfg.rpn_boundary_filter,
            )
        )(g, m)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    t, *_ = chain_time(rpn_tgt, args=(anchors, gt_boxes, gt_mask))
    print(f"rpn targets ({anchors.shape[0]} anchors)    : {t * 1e3:8.2f} ms")

    # ---- frcnn target assignment (2000 proposals) ----
    prois = rs.uniform(0, 1, size=(BATCH, cfg.post_nms_train, 4)).astype(
        np.float32
    )
    prois = jnp.asarray(
        np.concatenate(
            [
                np.minimum(prois[..., :2], prois[..., 2:]),
                np.maximum(prois[..., :2], prois[..., 2:]),
            ],
            -1,
        )
    )
    pvalid = jnp.ones((BATCH, cfg.post_nms_train), bool)

    def roi_tgt(i, pr, pv, g, gl, m):
        out = jax.vmap(
            lambda a, b, c2, d, e: frcnn_targets(
                a,
                b,
                c2 + i * 1e-6,
                d,
                e,
                jax.random.key(0),
                num_samples=cfg.roi_samples,
                pos_quota=cfg.roi_pos_quota,
                pos_iou=cfg.roi_pos_iou,
                label_offset=cfg.label_offset,
            )
        )(pr, pv, g, gl, m)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    t, *_ = chain_time(roi_tgt, args=(prois, pvalid, gt_boxes, gt_labels, gt_mask))
    print(f"frcnn targets ({cfg.post_nms_train} rois)    : {t * 1e3:8.2f} ms")

    # ---- roi head fwd+bwd (RoIPool over 128 rois + 25088->4096 FCs) ----
    srois = jnp.asarray(
        np.concatenate(
            [prois[:, : cfg.roi_samples, :2], prois[:, : cfg.roi_samples, 2:]],
            -1,
        )
    )

    def head_fwdbwd(i, p, f, r):
        rp = jnp.clip(r + i.astype(jnp.float32) * 0.003, 0.0, 1.0)

        def loss_fn(pp):
            c, rg = model.apply(pp, f, rp, method="head")
            return (c.astype(jnp.float32) ** 2).sum() + (
                rg.astype(jnp.float32) ** 2
            ).sum()

        g = jax.grad(loss_fn)(p)
        return sum((x.astype(jnp.float32) ** 2).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(head_fwdbwd, k_lo=2, k_hi=6, args=(params, feats, srois))
    print(f"roi head fwd+bwd (128 rois)   : {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
