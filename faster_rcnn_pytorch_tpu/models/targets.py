"""Training target assignment, fully masked / fixed-shape.

Counterparts of the reference target makers:

* :func:`rpn_targets` — ``RPNTargetMaker`` (models/model.py:182-266
  legacy; models/new_model.py:299-349 FPN variant),
* :func:`frcnn_targets` — ``FastRcnnTargetMaker`` (models/model.py:123-179
  legacy; ``FRCNNTargetMaker`` models/new_model.py:153-206 FPN variant).

Reference semantics preserved with masks instead of boolean filtering:

* legacy RPN keeps only anchors fully inside the image
  (models/model.py:189-190) — here "inside" means inside the *valid
  extent* of the padded canvas; outside anchors are permanently ignore
  (-1) and excluded from per-gt argmax,
* labels: -1 ignore / 0 negative (maxIoU < 0.3) / 1 positive (per-gt
  argmax, then maxIoU >= 0.7),
* subsampling quotas (<=128 pos, 256 total RPN; 32 pos / 128 total RoI
  legacy, 128/512 FPN) via noise-ranked selection (:mod:`..ops.sampling`),
* gt boxes are concatenated into the roi set so every image has
  guaranteed positives (models/model.py:135),
* RoI regression targets normalised by std (0.1, 0.1, 0.2, 0.2)
  (models/model.py:174-177).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.ops.boxes import (
    encode,
    masked_iou,
    masked_iou_gt_major,
    xy_to_cxcy,
)
from faster_rcnn_pytorch_tpu.ops.sampling import (
    _group_rank_topk,
    sample_pos_neg,
)

Array = jax.Array

# numpy, NOT jnp: a module-level jnp array initialises the jax backend
# at import time — before CLIs can apply the platform override
# (utils/runtime.py) — and pins a device constant that lowering then
# block-fetches through the remote runtime.
REG_STD = np.array([0.1, 0.1, 0.2, 0.2], dtype=np.float32)


class RPNTargets(NamedTuple):
    labels: Array  # [A] int32 in {-1, 0, 1}
    reg_targets: Array  # [A, 4] encoded deltas (defined where labels == 1)


class RoITargets(NamedTuple):
    rois: Array  # [S, 4] sampled rois (xyxy, canvas coords)
    labels: Array  # [S] int32 class target, 0 = background, -1 = invalid
    reg_targets: Array  # [S, 4] normalised encoded deltas
    is_pos: Array  # [S] bool
    valid: Array  # [S] bool


def rpn_targets(
    anchors: Array,
    gt_boxes: Array,
    gt_mask: Array,
    extent: Array,
    rng: Array,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    pos_quota: int = 128,
    total_quota: int = 256,
    allow_ties: bool = False,
    boundary_filter: bool = True,
) -> RPNTargets:
    """Assign {-1,0,1} labels + regression targets to every anchor.

    Args:
      anchors: ``[A, 4]`` xyxy in [0,1] canvas coords.
      gt_boxes: ``[G, 4]`` padded gt boxes (canvas coords).
      gt_mask: ``[G]`` validity of gt slots.
      extent: ``[2]`` (w_frac, h_frac) valid image extent; anchors
        crossing it are ignored (legacy boundary filter,
        models/model.py:189).
      allow_ties: FPN variant marks *all* anchors tied at the per-gt max
        IoU positive (models/new_model.py:316-318); legacy takes a single
        argmax (models/model.py:213).
      boundary_filter: ``False`` assigns labels to *every* anchor,
        including ones extending past the canvas, like the FPN variant
        (models/new_model.py:303-307 has no inside-image filter).
    """
    a = anchors.shape[0]
    if boundary_filter:
        inside = (
            (anchors[:, 0] >= 0.0)
            & (anchors[:, 1] >= 0.0)
            & (anchors[:, 2] <= extent[0])
            & (anchors[:, 3] <= extent[1])
        )
    else:
        inside = jnp.ones((a,), bool)

    # IoU in gt-major [G, A] layout: with the anchor axis minor every
    # temporary lane-packs; the [A, G] orientation (G=24 minor, padded
    # to 128 lanes) made the whole assignment layout-bound at FPN scale
    # (tools/microbench_rpn_targets.py / microbench_encode_layout.py).
    iou = masked_iou_gt_major(gt_boxes, gt_mask, anchors)  # [G, A]
    iou = jnp.where(inside[None, :], iou, -1.0)
    iou_max = iou.max(axis=0)  # [A]
    iou_argmax = iou.argmax(axis=0)  # [A]

    labels = jnp.full((a,), -1, dtype=jnp.int32)
    labels = jnp.where(inside & (iou_max < neg_iou) & (iou_max >= 0.0), 0, labels)

    # Per-gt best anchor(s) -> positive ("allow low quality matches").
    per_gt_max = iou.max(axis=1)  # [G]
    if allow_ties:
        is_best = (iou == per_gt_max[:, None]) & gt_mask[:, None] & (
            per_gt_max[:, None] > -1.0
        )
        best_any = is_best.any(axis=0)
    else:
        per_gt_argmax = iou.argmax(axis=1)  # [G]
        # .max, not .set: a padded gt's argmax over an all(-1) row is 0,
        # and a duplicate-index scatter-set could clobber a real gt whose
        # best anchor is also 0 with False.
        best_any = (
            jnp.zeros((a,), jnp.int32)
            .at[per_gt_argmax]
            .max((gt_mask & (per_gt_max > -1.0)).astype(jnp.int32))
            > 0
        )
    labels = jnp.where(best_any & inside, 1, labels)
    labels = jnp.where(inside & (iou_max >= pos_iou), 1, labels)

    # Subsample: demote excess positives, then negatives, to ignore
    # (models/model.py:225-236 keeps quotas 128 pos / 256 total).
    k_pos, k_neg = jax.random.split(rng)
    pos_mask = labels == 1
    n_pos = pos_mask.sum()
    pos_rank = _group_rank_topk(jax.random.uniform(k_pos, (a,)), pos_mask, pos_quota)
    labels = jnp.where(pos_mask & (pos_rank >= pos_quota), -1, labels)

    n_pos_kept = jnp.minimum(n_pos, pos_quota)
    neg_mask = labels == 0
    neg_rank = _group_rank_topk(jax.random.uniform(k_neg, (a,)), neg_mask, total_quota)
    labels = jnp.where(
        neg_mask & (neg_rank >= total_quota - n_pos_kept), -1, labels
    )

    # Encode tail in per-component (SoA) layout: the [A, 4]-minor form
    # of gather + xy_to_cxcy + encode measured 1.84 ms/b2 at A=160k on
    # v5e vs 0.03 ms like this (tools/microbench_encode_layout.py) —
    # the arithmetic is unchanged (matched-row selection via a one-hot
    # matvec is exact: one 0/1 coefficient per row). Anchor component
    # slices constant-fold (anchors is a per-canvas constant).
    safe_arg = jnp.where(gt_mask.any(), iou_argmax, 0)
    onehot = jax.nn.one_hot(safe_arg, gt_boxes.shape[0], dtype=jnp.float32)
    mx1 = onehot @ gt_boxes[:, 0]
    my1 = onehot @ gt_boxes[:, 1]
    mx2 = onehot @ gt_boxes[:, 2]
    my2 = onehot @ gt_boxes[:, 3]
    ax1, ay1, ax2, ay2 = (anchors[:, i] for i in range(4))
    aw = jnp.maximum(ax2 - ax1, 1e-8)
    ah = jnp.maximum(ay2 - ay1, 1e-8)
    pos = labels == 1
    zero = jnp.zeros((a,), anchors.dtype)
    tx = jnp.where(pos, ((mx1 + mx2) / 2.0 - (ax1 + ax2) / 2.0) / aw, zero)
    ty = jnp.where(pos, ((my1 + my2) / 2.0 - (ay1 + ay2) / 2.0) / ah, zero)
    tw = jnp.where(pos, jnp.log(jnp.maximum(mx2 - mx1, 1e-8) / aw), zero)
    th = jnp.where(pos, jnp.log(jnp.maximum(my2 - my1, 1e-8) / ah), zero)
    reg = jnp.stack([tx, ty, tw, th], axis=-1)
    return RPNTargets(labels=labels, reg_targets=reg)


def frcnn_targets(
    rois: Array,
    roi_valid: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_mask: Array,
    rng: Array,
    num_samples: int = 128,
    pos_quota: int = 32,
    pos_iou: float = 0.5,
    label_offset: int = 1,
) -> RoITargets:
    """Sample rois and build classification/regression targets.

    Args:
      rois: ``[R, 4]`` proposals (gt not yet appended).
      roi_valid: ``[R]`` proposal validity.
      gt_labels: ``[G]`` int labels. ``label_offset=1`` reproduces the
        legacy ``label + 1`` background shift (models/model.py:141); the
        FPN variant uses raw 1-based COCO ids with offset 0
        (models/new_model.py:166).
    """
    cand = jnp.concatenate([rois, gt_boxes], axis=0)
    cand_valid = jnp.concatenate([roi_valid, gt_mask], axis=0)

    iou = masked_iou(cand, gt_boxes, gt_mask)  # [R+G, G]
    iou = jnp.where(cand_valid[:, None], iou, -1.0)
    iou_max = iou.max(axis=1)
    iou_argmax = iou.argmax(axis=1)

    pos_mask = cand_valid & (iou_max >= pos_iou)
    neg_mask = cand_valid & (iou_max < pos_iou) & (iou_max >= 0.0)

    idx, is_pos, valid = sample_pos_neg(
        rng, pos_mask, neg_mask, num_samples, pos_quota
    )
    sample_rois = cand[idx]
    matched_gt = gt_boxes[iou_argmax[idx]]
    matched_label = gt_labels[iou_argmax[idx]].astype(jnp.int32) + label_offset

    labels = jnp.where(is_pos, matched_label, 0)
    labels = jnp.where(valid, labels, -1)

    reg = encode(xy_to_cxcy(matched_gt), xy_to_cxcy(sample_rois), eps=1e-8)
    reg = reg / REG_STD[None, :]
    reg = jnp.where(is_pos[:, None], reg, 0.0)
    return RoITargets(
        rois=sample_rois,
        labels=labels,
        reg_targets=reg,
        is_pos=is_pos,
        valid=valid,
    )
