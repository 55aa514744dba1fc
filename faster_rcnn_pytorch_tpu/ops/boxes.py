"""Box geometry primitives (pure JAX, shape-polymorphic over leading dims).

Functional counterparts of the reference's box utilities
(reference: utils/util.py:15-102 and util/box_ops.py:6-44), with two
TPU-first differences:

* every function broadcasts over arbitrary leading batch dims, and
* pairwise reductions accept validity masks so padded boxes never have to
  be filtered out (XLA needs static shapes; the reference boolean-masks).

Coordinate conventions follow the reference exactly: boxes are either
``xyxy`` corner form or ``cxcywh`` center form, normalised to [0, 1] of the
image (the "boxes live in [0,1]" contract of datasets/transforms_.py:307-316).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cxcy_to_xy(cxcy: Array) -> Array:
    """Center form (cx, cy, w, h) -> corner form (x1, y1, x2, y2).

    Reference: utils/util.py:15-19.
    """
    xy1 = cxcy[..., :2] - cxcy[..., 2:] / 2.0
    xy2 = cxcy[..., :2] + cxcy[..., 2:] / 2.0
    return jnp.concatenate([xy1, xy2], axis=-1)


def xy_to_cxcy(xy: Array) -> Array:
    """Corner form (x1, y1, x2, y2) -> center form (cx, cy, w, h).

    Reference: utils/util.py:22-26.
    """
    cxcy = (xy[..., 2:] + xy[..., :2]) / 2.0
    wh = xy[..., 2:] - xy[..., :2]
    return jnp.concatenate([cxcy, wh], axis=-1)


def encode(gt_cxywh: Array, anc_cxywh: Array, eps: float = 0.0) -> Array:
    """Encode ground-truth boxes as regression deltas w.r.t. anchors.

    ``t_xy = (g_xy - a_xy) / a_wh``, ``t_wh = log(g_wh / a_wh)``.
    Reference: utils/util.py:39-43.

    ``eps`` guards the log/div against degenerate (zero-size, padded)
    anchors; the reference has no guard because it filters beforehand.
    """
    a_wh = anc_cxywh[..., 2:]
    if eps:
        a_wh = jnp.maximum(a_wh, eps)
    t_xy = (gt_cxywh[..., :2] - anc_cxywh[..., :2]) / a_wh
    g_wh = gt_cxywh[..., 2:]
    if eps:
        g_wh = jnp.maximum(g_wh, eps)
    t_wh = jnp.log(g_wh / a_wh)
    return jnp.concatenate([t_xy, t_wh], axis=-1)


def decode(t_cxcy: Array, anc_cxywh: Array) -> Array:
    """Decode regression deltas against anchors -> center-form boxes.

    Reference: utils/util.py:46-50.
    """
    cxcy = t_cxcy[..., :2] * anc_cxywh[..., 2:] + anc_cxywh[..., :2]
    wh = jnp.exp(t_cxcy[..., 2:]) * anc_cxywh[..., 2:]
    return jnp.concatenate([cxcy, wh], axis=-1)


def box_area(xy: Array) -> Array:
    """Area of corner-form boxes. Reference: util/box_ops.py:6."""
    return (xy[..., 2] - xy[..., 0]) * (xy[..., 3] - xy[..., 1])


def _pairwise_intersection(set_1: Array, set_2: Array) -> Array:
    """[..., n1, 4] x [..., n2, 4] -> [..., n1, n2] intersection areas.

    Reference: utils/util.py:89-102 (find_intersection).
    """
    lo = jnp.maximum(set_1[..., :, None, :2], set_2[..., None, :, :2])
    hi = jnp.minimum(set_1[..., :, None, 2:], set_2[..., None, :, 2:])
    wh = jnp.clip(hi - lo, 0.0)
    return wh[..., 0] * wh[..., 1]


def jaccard_iou(set_1: Array, set_2: Array, eps: float = 1e-5) -> Array:
    """Pairwise IoU with the reference's union-side epsilon.

    This matches the legacy model's ``find_jaccard_overlap``
    (utils/util.py:66-86): ``union = a1 + a2 - inter + 1e-5``.
    """
    inter = _pairwise_intersection(set_1, set_2)
    a1 = box_area(set_1)[..., :, None]
    a2 = box_area(set_2)[..., None, :]
    union = a1 + a2 - inter + eps
    return inter / union


def box_iou(set_1: Array, set_2: Array) -> tuple[Array, Array]:
    """Pairwise (IoU, union) without epsilon, DETR-style.

    Matches util/box_ops.py:24-44 used by the FPN-generation model. A tiny
    denominator floor avoids NaN for coincident degenerate padded boxes
    (which the caller must mask anyway).
    """
    inter = _pairwise_intersection(set_1, set_2)
    a1 = box_area(set_1)[..., :, None]
    a2 = box_area(set_2)[..., None, :]
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, 1e-12)
    return iou, union


def pairwise_iou(set_1: Array, set_2: Array, eps: float = 1e-5) -> Array:
    """Alias of :func:`jaccard_iou`; single-output pairwise IoU."""
    return jaccard_iou(set_1, set_2, eps=eps)


def masked_iou(
    boxes: Array,
    gt: Array,
    gt_mask: Array,
    eps: float = 1e-5,
) -> Array:
    """IoU of ``boxes`` [..., n, 4] vs padded ``gt`` [..., g, 4].

    Padded gt slots (``gt_mask == False``) get IoU ``-1`` so that
    downstream argmax/threshold logic can never select them while still
    operating on static shapes. Large 2-D problems (the per-anchor
    assignment matrix, ~200k x G in the FPN generation) dispatch to the
    blocked Pallas kernel on TPU.
    """
    if (
        boxes.ndim == 2
        and boxes.shape[0] * gt.shape[0] >= (1 << 20)
    ):
        from faster_rcnn_pytorch_tpu.ops.roi_pool import use_pallas_ops

        if use_pallas_ops():
            from faster_rcnn_pytorch_tpu.ops.pallas.iou_kernel import (
                pairwise_iou_pallas,
            )

            m_pad = max(-(-gt.shape[0] // 128) * 128, 128)
            iou = pairwise_iou_pallas(
                boxes, gt, eps=eps, block_n=512, block_m=min(m_pad, 512)
            )
            return jnp.where(gt_mask[..., None, :], iou, -1.0)
    iou = jaccard_iou(boxes, gt, eps=eps)
    return jnp.where(gt_mask[..., None, :], iou, -1.0)


def masked_iou_gt_major(
    gt: Array,
    gt_mask: Array,
    boxes: Array,
    eps: float = 1e-5,
) -> Array:
    """Transposed masked IoU: ``[G, N]`` with the big ``N`` axis minor.

    Same arithmetic as :func:`masked_iou` (the reference's eps-union
    convention, utils/util.py:66-86) but laid out gt-major and computed
    per box component, so no temporary carries a minor dim of 2 or 4.
    On TPU a ``[N, 4]``-minor array tiles to (8, 128) lanes and wastes
    97% of the bandwidth — the FPN target assignment at N=160k anchors
    is layout-bound, not compute-bound
    (tools/microbench_encode_layout.py: the [A, 4] encode tail alone
    measures 1.84 ms vs 0.03 ms in component layout on v5e).

    ``boxes`` is typically the canvas anchor constant, so its component
    slices constant-fold at compile time. Padded gt rows
    (``gt_mask == False``) get IoU ``-1`` like :func:`masked_iou`.
    """
    gx1 = gt[:, 0][:, None]
    gy1 = gt[:, 1][:, None]
    gx2 = gt[:, 2][:, None]
    gy2 = gt[:, 3][:, None]
    bx1 = boxes[:, 0][None, :]
    by1 = boxes[:, 1][None, :]
    bx2 = boxes[:, 2][None, :]
    by2 = boxes[:, 3][None, :]
    iw = jnp.clip(jnp.minimum(gx2, bx2) - jnp.maximum(gx1, bx1), 0.0, None)
    ih = jnp.clip(jnp.minimum(gy2, by2) - jnp.maximum(gy1, by1), 0.0, None)
    inter = iw * ih
    union = (gx2 - gx1) * (gy2 - gy1) + (bx2 - bx1) * (by2 - by1) - inter + eps
    return jnp.where(gt_mask[:, None], inter / union, -1.0)


def clip_boxes(xy: Array, lo: float = 0.0, hi: float = 1.0) -> Array:
    """Clamp corner boxes into [lo, hi] (reference clamps rois to [0,1],
    models/model.py:34)."""
    return jnp.clip(xy, lo, hi)


def generalized_box_iou(set_1: Array, set_2: Array) -> Array:
    """Pairwise GIoU, util/box_ops.py:47-61 parity (carried for API
    completeness; unused in the Faster R-CNN loss)."""
    iou, union = box_iou(set_1, set_2)
    lo = jnp.minimum(set_1[..., :, None, :2], set_2[..., None, :, :2])
    hi = jnp.maximum(set_1[..., :, None, 2:], set_2[..., None, :, 2:])
    wh = jnp.clip(hi - lo, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-12)


def masks_to_boxes(masks: Array) -> Array:
    """Bounding boxes (xyxy, pixel coords) of binary masks [n, h, w].

    Parity with util/box_ops.py:64-88; returns zeros for empty masks.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = 1e8
    m = masks.astype(bool)
    x_min = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m, xs, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m, ys, -big), axis=(1, 2))
    any_ = m.any(axis=(1, 2))
    out = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_[:, None], out, 0.0)
