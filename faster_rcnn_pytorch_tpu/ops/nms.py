"""Fixed-shape greedy NMS for TPU.

The reference calls torchvision's C++/CUDA ``nms`` with dynamically sized
inputs (models/model.py:53, models/model.py:394, models/new_model.py:82,457).
On TPU everything must be static, so this module implements **exact greedy
NMS over a fixed box budget** with validity masks:

* boxes are sorted by score once (padded/invalid boxes get ``-inf``),
* tiles of ``tile`` boxes are processed in score order with a
  ``lax.fori_loop``; each tile is first suppressed by every kept box of
  earlier tiles (one shot — earlier tiles are final), then self-suppressed
  to a fixpoint with a Gauss-Jacobi iteration over the strictly-upper
  triangular overlap matrix (this converges to the greedy solution because
  the dependency graph is a DAG ordered by score),
* the result is a fixed-size ``[post_k]`` index buffer (original indices,
  greedy order) padded with ``-1``.

Suppression uses ``iou > threshold`` — identical to torchvision semantics
(suppressed iff strictly greater).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.boxes import box_iou

Array = jax.Array

_NEG_INF = jnp.float32(-jnp.inf)


def _self_suppression_fixpoint(active0: Array, overlap: Array) -> Array:
    """Iterate ``active[j] = ~any_k (active[k] & overlap[k, j])`` to fixpoint.

    ``overlap`` must be strictly upper-triangular (k < j). At most T
    iterations are needed; we stop as soon as the mask stops changing.
    """

    def cond(state):
        active, prev, it = state
        return jnp.logical_and(jnp.any(active != prev), it < active.shape[0])

    def body(state):
        active, _, it = state
        suppressed = jnp.any(overlap & active[:, None], axis=0)
        new_active = active0 & ~suppressed
        return new_active, active, it + 1

    init = (active0, jnp.zeros_like(active0), jnp.int32(0))
    active, _, _ = jax.lax.while_loop(cond, body, init)
    return active


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "post_k", "tile", "return_mask"),
)
def nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    post_k: int,
    valid: Array | None = None,
    tile: int = 256,
    return_mask: bool = False,
):
    """Exact greedy NMS with static shapes.

    Args:
      boxes: ``[n, 4]`` corner-form boxes (any scale; IoU is scale free).
      scores: ``[n]`` scores; invalid entries may be anything.
      iou_threshold: suppress a box iff IoU with a kept higher-scoring box
        is ``> iou_threshold`` (torchvision semantics).
      post_k: number of survivors to return (padded with ``-1``).
      valid: optional ``[n]`` bool; ``False`` entries can neither be kept
        nor suppress others.
      tile: tile size for the blocked sweep.
      return_mask: also return the per-box keep mask in original order.

    Returns:
      ``(keep_idx, keep_valid)`` — ``[post_k]`` int32 original-order indices
      in greedy (descending score) order, ``-1``-padded, plus the validity
      mask of those slots. With ``return_mask`` a third ``[n]`` bool array.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)

    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    order = jnp.argsort(-scores)  # stable: ties keep original index order
    sorted_boxes = jnp.pad(boxes[order], ((0, pad), (0, 0)))
    sorted_valid = jnp.pad(valid[order] & (scores[order] > _NEG_INF), (0, pad))
    order = jnp.pad(order, (0, pad), constant_values=-1)

    num_tiles = n_pad // tile
    positions = jnp.arange(n_pad, dtype=jnp.int32)

    def tile_body(state):
        t, keep, count = state
        start = t * tile
        rows = jax.lax.dynamic_slice(sorted_boxes, (start, 0), (tile, 4))
        row_valid = jax.lax.dynamic_slice(sorted_valid, (start,), (tile,))

        # Cross-tile suppression: only tiles strictly before t can suppress
        # (boxes are score-sorted), so sweep chunks 0..t-1 with a
        # dynamic-bound fori — triangular work instead of all-columns.
        def chunk_body(c, sup):
            c0 = c * tile
            cols = jax.lax.dynamic_slice(sorted_boxes, (c0, 0), (tile, 4))
            kept_c = jax.lax.dynamic_slice(keep, (c0,), (tile,))
            iou, _ = box_iou(rows, cols)  # [tile, tile]
            return sup | jnp.any(
                (iou > iou_threshold) & kept_c[None, :], axis=1
            )

        cross_sup = jax.lax.fori_loop(0, t, chunk_body, jnp.zeros((tile,), bool))
        active0 = row_valid & ~cross_sup

        tile_iou, _ = box_iou(rows, rows)
        local = jnp.arange(tile)
        strict_upper = local[:, None] < local[None, :]
        active = _self_suppression_fixpoint(
            active0, (tile_iou > iou_threshold) & strict_upper
        )

        keep = jax.lax.dynamic_update_slice(keep, active, (start,))
        return t + 1, keep, count + active.sum(dtype=jnp.int32)

    # Early exit: the first post_k kept boxes (produced in score order)
    # fully determine the output; later tiles cannot alter them, only
    # append beyond post_k. return_mask needs the complete sweep.
    stop_count = n_pad + 1 if return_mask else post_k

    def tile_cond(state):
        t, _, count = state
        return jnp.logical_and(t < num_tiles, count < stop_count)

    import os

    from faster_rcnn_pytorch_tpu.ops.roi_pool import use_pallas_ops

    # Measured on v5e: the XLA tiled formulation below outruns the Pallas
    # kernel (5.9ms vs 11.5ms at 12k boxes) — XLA schedules the fused
    # [tile, n] IoU reductions better than the in-kernel chunk loop. The
    # kernel stays available behind FRT_PALLAS_NMS=1.
    if (
        os.environ.get("FRT_PALLAS_NMS")
        and use_pallas_ops()
        and tile % 128 == 0
    ):
        from faster_rcnn_pytorch_tpu.ops.pallas.nms_kernel import (
            nms_keep_mask_pallas,
        )

        keep = nms_keep_mask_pallas(
            sorted_boxes, sorted_valid, float(iou_threshold), tile=tile
        )
    else:
        _, keep, _ = jax.lax.while_loop(
            tile_cond,
            tile_body,
            (jnp.int32(0), jnp.zeros((n_pad,), dtype=bool), jnp.int32(0)),
        )

    # First `post_k` kept boxes in score order -> fixed index buffer.
    rank_key = jnp.where(keep, -positions, jnp.int32(-n_pad - 1))
    k_eff = min(post_k, n_pad)
    _, sel = jax.lax.top_k(rank_key, k_eff)
    sel_valid = keep[sel]
    keep_idx = jnp.where(sel_valid, order[sel], -1)
    if k_eff < post_k:
        keep_idx = jnp.pad(keep_idx, (0, post_k - k_eff), constant_values=-1)
        sel_valid = jnp.pad(sel_valid, (0, post_k - k_eff))

    if return_mask:
        full_mask = jnp.zeros((n,), dtype=bool)
        safe = jnp.where(order[:n_pad] >= 0, order[:n_pad], 0)
        full_mask = full_mask.at[safe].max(keep[:n_pad])
        return keep_idx, sel_valid, full_mask
    return keep_idx, sel_valid


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "post_k", "tile")
)
def batched_nms(
    boxes: Array,
    scores: Array,
    class_ids: Array,
    iou_threshold: float,
    post_k: int,
    valid: Array | None = None,
    tile: int = 256,
):
    """Class-aware NMS via the coordinate-offset trick (one kernel pass).

    Boxes of different classes never suppress each other: each class's
    boxes are shifted into a disjoint unit cell before a single greedy NMS.
    """
    offsets = class_ids.astype(jnp.float32)[:, None] * 2.0
    shifted = boxes + offsets
    return nms(
        shifted, scores, iou_threshold, post_k=post_k, valid=valid, tile=tile
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold",
        "iou_threshold",
        "num_classes",
        "per_class_k",
        "max_det",
        "tile",
    ),
)
def multiclass_nms(
    cls_boxes: Array,
    cls_probs: Array,
    score_threshold: float,
    iou_threshold: float,
    num_classes: int,
    per_class_k: int = 100,
    max_det: int = 100,
    tile: int = 256,
):
    """Per-class suppression of the test-time head, fixed output budget.

    TPU-native counterpart of ``FRCNN._suppress`` (models/model.py:382-402):
    the reference loops classes 1..C-1 in Python, boolean-masks by
    ``prob > thres`` and calls CUDA NMS per class. Here all foreground
    classes run as ONE greedy NMS via the coordinate-offset trick (boxes
    of different classes are shifted into disjoint unit cells, so they can
    never suppress each other — the result is identical to C-1 independent
    NMS passes), and the final detections are the global top ``max_det``
    by score. ``per_class_k`` is kept for API compatibility; capping at
    ``max_det`` globally subsumes it (per-class survivors are kept in
    score order, so a class's (max_det+1)-th survivor can never reach the
    global top max_det).

    Args:
      cls_boxes: ``[n, num_classes, 4]`` per-class decoded boxes in [0, 1].
      cls_probs: ``[n, num_classes]`` softmax probabilities.
      score_threshold: drop detections with ``prob <=`` this (reference uses
        strict ``>``, config ``opts.thres``).
      iou_threshold: per-class NMS threshold (0.3 in the reference).
      num_classes: includes background at index 0 (skipped).

    Returns:
      ``boxes [max_det, 4]``, ``labels [max_det]`` (0-based foreground ids,
      reference shifts by -1), ``scores [max_det]``, ``valid [max_det]``.
    """
    del per_class_k
    n_fg = num_classes - 1
    fg_boxes = jnp.swapaxes(cls_boxes[:, 1:num_classes, :], 0, 1)  # [C-1,n,4]
    fg_probs = jnp.swapaxes(cls_probs[:, 1:num_classes], 0, 1)  # [C-1,n]
    fg_valid = fg_probs > score_threshold

    flat_boxes = fg_boxes.reshape(-1, 4)
    flat_probs = fg_probs.reshape(-1)
    flat_valid = fg_valid.reshape(-1)
    flat_labels = jnp.repeat(
        jnp.arange(n_fg, dtype=jnp.int32), fg_boxes.shape[1]
    )

    keep_idx, keep_valid = batched_nms(
        flat_boxes,
        flat_probs,
        flat_labels,
        iou_threshold,
        post_k=max_det,
        valid=flat_valid,
        tile=tile,
    )
    safe = jnp.where(keep_valid, keep_idx, 0)
    out_boxes = jnp.where(keep_valid[:, None], flat_boxes[safe], 0.0)
    out_scores = jnp.where(keep_valid, flat_probs[safe], 0.0)
    out_labels = jnp.where(keep_valid, flat_labels[safe], -1)
    return out_boxes, out_labels, out_scores, keep_valid
