"""Four-part Faster R-CNN loss, mask-based.

Counterpart of losses/loss.py:5-85. Reference semantics, re-expressed
without dynamic shapes:

* ``CrossEntropyLoss(ignore_index=-1)`` -> masked softmax-CE averaged
  over non-ignored entries,
* RPN smooth-L1 (beta=1/9) summed over positive anchors, normalised by
  the number of non-ignored labels (losses/loss.py:33-38),
* RoI head CE over the fixed sample budget + smooth-L1 (beta=1) on
  positives normalised by the sample count (losses/loss.py:49-59),
* total = unweighted sum of the four terms (losses/loss.py:84).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class LossBreakdown(NamedTuple):
    total: Array
    rpn_cls: Array
    rpn_reg: Array
    roi_cls: Array
    roi_reg: Array


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    """Elementwise smooth-L1 (losses/loss.py:5-14 semantics)."""
    x = jnp.abs(pred - target)
    return jnp.where(x >= beta, x - 0.5 * beta, 0.5 * x * x / beta)


def masked_cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean softmax-CE over entries with ``label >= 0`` (ignore -1)."""
    n_cls = logits.shape[-1]
    valid = labels >= 0
    safe = jnp.clip(labels, 0, n_cls - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom


def rpn_loss(
    pred_cls: Array,
    pred_reg: Array,
    target_cls: Array,
    target_reg: Array,
    beta: float = 1.0 / 9.0,
) -> tuple[Array, Array]:
    """RPN objectness CE + positive-anchor box regression.

    Shapes: ``[A, 2]``, ``[A, 4]``, ``[A]``, ``[A, 4]``.
    """
    cls_loss = masked_cross_entropy(pred_cls, target_cls)
    pos = target_cls > 0
    reg = smooth_l1(pred_reg, target_reg, beta).sum(axis=-1)
    denom = jnp.maximum((target_cls >= 0).sum(), 1)
    reg_loss = jnp.where(pos, reg, 0.0).sum() / denom
    return cls_loss, reg_loss


def roi_loss(
    pred_cls: Array,
    pred_reg: Array,
    target_cls: Array,
    target_reg: Array,
    beta: float = 1.0,
) -> tuple[Array, Array]:
    """RoI head classification + class-gathered box regression.

    ``pred_reg`` is the per-sample regression row already gathered at the
    target class (models/model.py:340-341): shapes ``[S, C]``, ``[S, 4]``,
    ``[S]``, ``[S, 4]``.
    """
    cls_loss = masked_cross_entropy(pred_cls, target_cls)
    pos = target_cls > 0
    reg = smooth_l1(pred_reg, target_reg, beta).sum(axis=-1)
    denom = jnp.maximum((target_cls >= 0).sum(), 1)
    reg_loss = jnp.where(pos, reg, 0.0).sum() / denom
    return cls_loss, reg_loss


def build_loss(opts=None):
    """Criterion factory (API parity with losses/build.py:4-6)."""
    del opts
    return frcnn_loss


def frcnn_loss(pred, target) -> LossBreakdown:
    """Total loss from (pred, target) 4-tuples — API parity with
    ``FRCNNLoss.forward`` (losses/loss.py:71-85)."""
    pred_rpn_cls, pred_rpn_reg, pred_roi_cls, pred_roi_reg = pred
    tg_rpn_cls, tg_rpn_reg, tg_roi_cls, tg_roi_reg = target
    rc, rr = rpn_loss(pred_rpn_cls, pred_rpn_reg, tg_rpn_cls, tg_rpn_reg)
    fc, fr = roi_loss(pred_roi_cls, pred_roi_reg, tg_roi_cls, tg_roi_reg)
    return LossBreakdown(
        total=rc + rr + fc + fr, rpn_cls=rc, rpn_reg=rr, roi_cls=fc, roi_reg=fr
    )
