"""Chain-timed attribution of the FPN train step (fwd+bwd) on the chip.

Measures: full train-step grad, align fwd alone, align fwd+bwd (the
custom dense-matmul VJP), and backbone fwd+bwd — the candidates for the
next optimisation pass.

Run: python tools/profile_fpn_train.py [batch]
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

from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model, init_detector_params
from faster_rcnn_pytorch_tpu.ops.roi_align import (
    multiscale_roi_align_batch,
    multiscale_roi_align_dense,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CANVAS = 800
N_ROIS = 512  # train-mode sampled rois per image


def main():
    rs = np.random.RandomState(0)
    model, cfg = build_model("fpn", num_classes=91)
    params = init_detector_params(model, jax.random.key(0))

    images = jnp.asarray(
        rs.normal(size=(BATCH, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    feats = jax.jit(lambda p, im: model.apply(p, im, method="features"))(
        params, images
    )
    # Keep the backbone's native bf16 — the production head path feeds
    # the align bf16 features (half the window-DMA bytes). An earlier
    # revision cast to f32 here and overstated the align rows ~2x
    # (10.2 vs 4.7 ms fwd b2x512, 2026-08-19).
    feats4 = tuple(feats[:4])
    # Realistic proposal geometry: size log-uniform, aspect log-uniform
    # in [1/3, 3] (anchor-shaped). Sampling w and h INDEPENDENTLY
    # log-uniform (an earlier revision) creates ~60:1 slivers whose bin
    # span overflows the window kernel at their assigned FPN level and
    # routes them through the corner/dense fallbacks — that distribution
    # measured 9.2 ms align fwd b2x512 vs 4.7 ms for this one. Real
    # RPN proposals are anchor-shaped, not sliver-shaped.
    xy1 = rs.uniform(0, 600, size=(BATCH, N_ROIS, 2))
    size = np.exp(rs.uniform(np.log(16), np.log(400), size=(BATCH, N_ROIS, 1)))
    aspect = np.exp(rs.uniform(np.log(1 / 3), np.log(3), size=(BATCH, N_ROIS, 1)))
    wh = np.concatenate([size * np.sqrt(aspect), size / np.sqrt(aspect)], -1)
    rois = jnp.asarray(
        np.concatenate([xy1, np.minimum(xy1 + wh, CANVAS)], -1).astype(np.float32)
    )

    # Non-collapsible cotangent: with a CONSTANT cotangent and a scalar
    # reduce, XLA algebraically folds the one-hot VJP matmuls away
    # (sum(Wy^T @ 1 @ Wx) == (sum Wy)(sum Wx)) and reports ~0 ms.
    cot = jnp.asarray(
        rs.normal(size=(BATCH, N_ROIS, 7, 7, 256)).astype(np.float32)
    )

    def align_fwd(i, f, r):
        out = multiscale_roi_align_batch(tuple(x + i * 1e-6 for x in f), r)
        return (out.astype(jnp.float32) * cot).sum()

    # NB: the align is LINEAR in features, so grad-wrt-features depends
    # only on (rois, cotangent) — perturb ROIS per chain step or XLA
    # hoists the whole backward out of the timing scan as loop-invariant.
    def align_fwdbwd(i, f, r):
        rp = r + i.astype(jnp.float32) * 0.013
        g = jax.grad(
            lambda ff: (
                multiscale_roi_align_batch(ff, rp).astype(jnp.float32) * cot
            ).sum()
        )(f)
        return sum((x * x).sum() for x in g)

    def align_dense_fwdbwd(i, f, r):
        rp = r + i.astype(jnp.float32) * 0.013
        g = jax.grad(
            lambda ff: (
                jax.vmap(lambda f2, rr: multiscale_roi_align_dense(f2, rr))(
                    ff, rp
                ).astype(jnp.float32)
                * cot
            ).sum()
        )(f)
        return sum((x * x).sum() for x in g)

    def backbone_fwdbwd(i, p, im):
        g = jax.grad(
            lambda pp: sum(
                (x.astype(jnp.float32) ** 2).sum()
                for x in model.apply(pp, im + i * 1e-4, method="features")
            )
        )(p)
        return sum((x * x).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(align_fwd, args=(feats4, rois))
    print(f"align fwd (bin-window)      : {t * 1e3:8.2f} ms/b{BATCH}x{N_ROIS}")
    t, *_ = chain_time(align_fwdbwd, k_lo=2, k_hi=6, args=(feats4, rois))
    print(f"align fwd+bwd (production)  : {t * 1e3:8.2f} ms")
    t, *_ = chain_time(align_dense_fwdbwd, k_lo=2, k_hi=6, args=(feats4, rois))
    print(f"align fwd+bwd (all dense)   : {t * 1e3:8.2f} ms")
    t, *_ = chain_time(backbone_fwdbwd, k_lo=2, k_hi=5, args=(params, images))
    print(f"backbone fwd+bwd            : {t * 1e3:8.2f} ms")

    # rpn target assignment over the full FPN anchor set
    anchors = jnp.asarray(model.canvas_anchors(CANVAS, CANVAS))
    from faster_rcnn_pytorch_tpu.models.targets import rpn_targets

    gt = jnp.asarray(
        np.concatenate(
            [
                rs.uniform(0, 0.5, size=(BATCH, 24, 2)),
                rs.uniform(0.5, 1.0, size=(BATCH, 24, 2)),
            ],
            -1,
        ).astype(np.float32)
    )
    gt_mask = jnp.ones((BATCH, 24), bool)

    def rpn_tgt(i, a, g, m):
        out = jax.vmap(
            lambda gi, mi: rpn_targets(
                a,
                gi + i * 1e-6,
                mi,
                jnp.ones((2,), jnp.float32),
                jax.random.key(0),
                allow_ties=True,
                boundary_filter=False,
            )
        )(g, m)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    t, *_ = chain_time(rpn_tgt, args=(anchors, gt, gt_mask))
    print(f"rpn targets ({anchors.shape[0]} anchors): {t * 1e3:8.2f} ms")

    # propose, train regime (pre_k=4000 -> NMS -> 1000) over the full set
    from faster_rcnn_pytorch_tpu.models.rpn import propose

    rpn_cls = jnp.asarray(
        rs.normal(size=(BATCH, anchors.shape[0], 2)).astype(np.float32)
    )
    rpn_reg = jnp.asarray(
        rs.normal(size=(BATCH, anchors.shape[0], 4)).astype(np.float32) * 0.1
    )
    extents = jnp.ones((BATCH, 2), jnp.float32)

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
                nms_tile=cfg.rpn_nms_tile,
            )
        )(c, r, extents)
        return p.rois.sum() + p.valid.sum()

    t, *_ = chain_time(propose_train, args=(rpn_cls, rpn_reg))
    print(f"propose train (pre{cfg.pre_nms_train}->post{cfg.post_nms_train}): {t * 1e3:8.2f} ms")

    # frcnn target assignment (1000 proposals + gt, IoU + quota sampling)
    from faster_rcnn_pytorch_tpu.models.targets import frcnn_targets

    prois = jnp.asarray(
        rs.uniform(0, 1, size=(BATCH, cfg.post_nms_train, 4)).astype(np.float32)
    )
    prois = jnp.concatenate(
        [jnp.minimum(prois[..., :2], prois[..., 2:]),
         jnp.maximum(prois[..., :2], prois[..., 2:])], -1
    )
    pvalid = jnp.ones((BATCH, cfg.post_nms_train), bool)
    glab = jnp.ones((BATCH, 24), jnp.int32)

    def roi_tgt(i, pr, pv, g, gl, m):
        out = jax.vmap(
            lambda a, b, c2, d, e: frcnn_targets(
                a, b, c2 + i * 1e-6, d, e, jax.random.key(0),
                num_samples=cfg.roi_samples,
                pos_quota=cfg.roi_pos_quota,
                pos_iou=cfg.roi_pos_iou,
                label_offset=cfg.label_offset,
            )
        )(pr, pv, g, gl, m)
        return sum(
            x.astype(jnp.float32).sum() for x in jax.tree.leaves(out)
        )

    t, *_ = chain_time(roi_tgt, args=(prois, pvalid, gt, glab, gt_mask))
    print(f"frcnn targets ({cfg.post_nms_train} rois): {t * 1e3:8.2f} ms")

    # rpn head fwd+bwd (5-level 3x3 conv + cls/reg)
    def rpn_head_fwdbwd(i, p, im):
        def f(pp):
            fs = model.apply(pp, im + i * 1e-4, method="features")
            c, r = model.apply(pp, fs, method="rpn_out")
            return (c.astype(jnp.float32) ** 2).sum() + (
                r.astype(jnp.float32) ** 2
            ).sum()

        g = jax.grad(f)(p)
        return sum((x * x).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(rpn_head_fwdbwd, k_lo=2, k_hi=5, args=(params, images))
    print(f"backbone+rpn_out fwd+bwd    : {t * 1e3:8.2f} ms")

    # head FCs fwd+bwd on pre-pooled features (align excluded)
    from flax.core import freeze

    def head_fc_fwdbwd(i, p, pooled):
        def f(pp):
            x = (pooled + i * 1e-6).reshape(BATCH * N_ROIS, -1)
            out = model.apply(pp, x, method="head_fc") if hasattr(
                model, "head_fc"
            ) else None
            return (out.astype(jnp.float32) ** 2).sum()

        g = jax.grad(f)(p)
        return sum((x * x).sum() for x in jax.tree.leaves(g))

    # full train step (grad of total loss, no optimizer)
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import forward_train

    gt_lab = jnp.ones((BATCH, 24), jnp.int32)

    def full_step(i, p, im):
        def loss_fn(pp):
            out = model.apply(
                pp,
                cfg,
                im + i * 1e-4,
                extents,
                gt,
                gt_lab,
                gt_mask,
                jax.random.key(0),
                method=forward_train,
            )
            return out.losses.total.sum()

        g = jax.grad(loss_fn)(p)
        return sum((x * x).sum() for x in jax.tree.leaves(g))

    t, *_ = chain_time(full_step, k_lo=2, k_hi=5, args=(params, images))
    print(f"FULL train fwd+bwd          : {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
