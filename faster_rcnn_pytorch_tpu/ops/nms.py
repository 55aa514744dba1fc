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
import numpy as np

from faster_rcnn_pytorch_tpu.ops.boxes import box_iou

Array = jax.Array

# numpy, NOT jnp: module-level jnp scalars initialise the jax backend at
# import time, before the CLI platform override (utils/runtime.py).
_NEG_INF = np.float32(-np.inf)


def _self_suppression_fixpoint(active0: Array, overlap: Array) -> Array:
    """Iterate ``active[j] = ~any_k (active[k] & overlap[k, j])`` to fixpoint.

    ``overlap`` must be strictly upper-triangular (k < j). At most T
    iterations are needed; we stop as soon as the mask stops changing
    (converges in greedy-chain-depth steps, typically 3-5).

    The masked-any is evaluated as an f32 ``[1,T] @ [T,T]`` MXU matvec: a
    boolean column-broadcast + cross-sublane reduce lowers ~500x slower on
    the VPU than the equivalent matmul on the MXU (measured on v5e).
    """
    t = active0.shape[0]
    ov = overlap.astype(jnp.float32)
    a0 = active0.astype(jnp.float32)[None, :]  # [1, T]

    def cond(state):
        active, prev, it = state
        return jnp.logical_and(
            jnp.max(jnp.abs(active - prev)) > 0.0, it < t
        )

    def body(state):
        active, _, it = state
        suppressed = jax.lax.dot_general(
            active, ov, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, T]
        return a0 * (suppressed <= 0.0), active, it + 1

    init = (a0, jnp.zeros_like(a0), jnp.int32(0))
    active, _, _ = jax.lax.while_loop(cond, body, init)
    return active[0] > 0.0


@functools.partial(
    jax.jit,
    static_argnames=(
        "iou_threshold",
        "post_k",
        "tile",
        "return_mask",
        "assume_sorted",
        "return_boxes",
    ),
)
def nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    post_k: int,
    valid: Array | None = None,
    tile: int = 256,
    return_mask: bool = False,
    assume_sorted: bool = False,
    return_boxes: bool = False,
):
    """Exact greedy NMS with static shapes.

    TPU cost notes baked into this implementation (all measured on v5e):
    sorts, gathers and scatters are the expensive ops, not the IoU math.
    So: the sort is a single multi-operand ``lax.sort`` carrying the box
    columns along with the keys (no [n,4] gather); ``assume_sorted``
    skips it entirely; every final selection is a one-hot matvec on the
    MXU instead of a gather/scatter/top_k.

    Args:
      boxes: ``[n, 4]`` corner-form boxes (any scale; IoU is scale free).
      scores: ``[n]`` scores; invalid entries may be anything.
      iou_threshold: suppress a box iff IoU with a kept higher-scoring box
        is ``> iou_threshold`` (torchvision semantics).
      post_k: number of survivors to return (padded with ``-1``).
      valid: optional ``[n]`` bool; ``False`` entries can neither be kept
        nor suppress others.
      tile: tile size for the blocked sweep.
      return_mask: also return the per-box keep mask in original order
        (forces a full sweep — disables the post_k early exit).
      assume_sorted: caller guarantees descending scores.
      return_boxes: also return the kept ``[post_k, 4]`` boxes and
        ``[post_k]`` scores (selected on-device via the same one-hot
        matmul — callers avoid their own gather).

    Returns:
      ``(keep_idx, keep_valid[, boxes, scores][, mask])`` — ``[post_k]``
      int32 original-order indices in greedy (descending score) order,
      ``-1``-padded, plus the validity of those slots.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)

    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    if assume_sorted:
        sorted_scores = scores
        sorted_boxes_n = boxes.astype(jnp.float32)
        order = jnp.arange(n, dtype=jnp.int32)
    else:
        neg, bx1, by1, bx2, by2, order = jax.lax.sort(
            (
                -scores,
                boxes[:, 0].astype(jnp.float32),
                boxes[:, 1].astype(jnp.float32),
                boxes[:, 2].astype(jnp.float32),
                boxes[:, 3].astype(jnp.float32),
                jnp.arange(n, dtype=jnp.int32),
            ),
            num_keys=1,
            is_stable=True,
        )
        sorted_scores = -neg
        sorted_boxes_n = jnp.stack([bx1, by1, bx2, by2], axis=-1)
    sorted_boxes = jnp.pad(sorted_boxes_n, ((0, pad), (0, 0)))
    sorted_valid = jnp.pad(sorted_scores > _NEG_INF, (0, pad))
    sorted_scores = jnp.pad(sorted_scores, (0, pad), constant_values=-jnp.inf)
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
            over = (iou > iou_threshold).astype(jnp.float32)
            # [tile, tile] @ [tile, 1] matvec on the MXU (see fixpoint note)
            hits = jax.lax.dot_general(
                over,
                kept_c.astype(jnp.float32)[:, None],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, 0]
            return sup + hits

        cross_sup = jax.lax.fori_loop(
            0, t, chunk_body, jnp.zeros((tile,), jnp.float32)
        )
        active0 = row_valid & (cross_sup <= 0.0)

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
    # append beyond post_k. return_mask needs the complete sweep — but a
    # tile with no valid entries keeps nothing either way, and since
    # valid entries are not necessarily a prefix (assume_sorted callers
    # may invalidate arbitrary slots), the exhaustion test uses a
    # suffix count of remaining valid entries per tile.
    stop_count = n_pad + 1 if return_mask else post_k
    remaining = jnp.cumsum(
        sorted_valid.reshape(num_tiles, tile).sum(axis=1)[::-1]
    )[::-1]

    def tile_cond(state):
        t, _, count = state
        more = jax.lax.dynamic_slice(remaining, (jnp.minimum(t, num_tiles - 1),), (1,))[0]
        return (t < num_tiles) & (count < stop_count) & (more > 0)

    # A Pallas sweep kernel was tried and deleted (round 2): the XLA
    # tiled formulation outran it 5.9 vs 11.5 ms at 12k boxes on v5e —
    # XLA schedules the fused [tile, n] IoU reductions better than an
    # in-kernel chunk loop, and per-step DMA latency dominates kernels
    # at this arithmetic intensity (same finding as the RoIAlign
    # window-DMA kernel, ops/pallas/roi_align_kernel.py).
    _, keep, _ = jax.lax.while_loop(
        tile_cond,
        tile_body,
        (jnp.int32(0), jnp.zeros((n_pad,), dtype=bool), jnp.int32(0)),
    )

    # First `post_k` kept boxes in score order -> fixed buffers. keep
    # lives in sorted coordinates, so the rank of each kept box is its
    # keep-prefix count; every rank->value selection is a one-hot matmul
    # on the MXU.
    ranks = jnp.cumsum(keep.astype(jnp.int32)) - 1
    onehot = (
        (ranks[None, :] == jnp.arange(post_k)[:, None]) & keep[None, :]
    ).astype(jnp.float32)

    def select(values):  # [n_pad, d] f32-representable -> [post_k, d]
        return jax.lax.dot_general(
            onehot,
            values,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sel_valid = jnp.arange(post_k) < keep.sum()
    keep_idx = select(order.astype(jnp.float32)[:, None])[:, 0].astype(
        jnp.int32
    )
    keep_idx = jnp.where(sel_valid, keep_idx, -1)
    extras = []
    if return_boxes:
        extras.append(
            jnp.where(sel_valid[:, None], select(sorted_boxes), 0.0)
        )
        extras.append(
            jnp.where(
                sel_valid,
                select(
                    jnp.where(sorted_valid, sorted_scores, 0.0)[:, None]
                )[:, 0],
                0.0,
            )
        )

    out = [keep_idx, sel_valid, *extras]
    if return_mask:
        full_mask = jnp.zeros((n,), dtype=bool)
        safe = jnp.where(order[:n_pad] >= 0, order[:n_pad], 0)
        full_mask = full_mask.at[safe].max(keep[:n_pad])
        out.append(full_mask)
    return tuple(out) if len(out) > 2 else (keep_idx, sel_valid)


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
    boxes are shifted into a disjoint cell before a single greedy NMS.
    Like torchvision's batched_nms, the cell stride is derived from the
    data (max coordinate + 1), so boxes in any scale are handled.
    """
    if valid is None:
        max_coord = jnp.max(boxes)
    else:
        max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = class_ids.astype(jnp.float32)[:, None] * (max_coord + 1.0)
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
        "candidate_k",
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
    candidate_k: int | None = None,
):
    """Per-class suppression of the test-time head, fixed output budget.

    TPU-native counterpart of ``FRCNN._suppress`` (models/model.py:382-402):
    the reference loops classes 1..C-1 in Python, boolean-masks by
    ``prob > thres`` and calls CUDA NMS per class. Here all foreground
    classes run as ONE vmapped fixed-shape NMS (identical per-class greedy
    results; the class axis becomes a batch axis so the sort is a single
    batched [C-1, n] sort) and the final detections are the global top
    ``max_det`` by score. (A flattened coordinate-offset single pass is
    equivalent but needs one (C-1)*n sort — ~90k elements for the FPN
    generation, hundreds of ms on TPU; the vmapped form stays at n.)

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
    n_fg = num_classes - 1
    per_class_k = min(per_class_k, max_det)
    fg_boxes = jnp.swapaxes(cls_boxes[:, 1:num_classes, :], 0, 1)  # [C-1,n,4]
    fg_probs = jnp.swapaxes(cls_probs[:, 1:num_classes], 0, 1)  # [C-1,n]
    fg_valid = fg_probs > score_threshold

    if n_fg * fg_boxes.shape[1] <= 16384:
        # Small flattened size (legacy: 20 classes x 300 rois): one
        # offset-trick pass beats C-1 vmapped sweeps.
        flat_boxes = fg_boxes.reshape(-1, 4)
        flat_probs = fg_probs.reshape(-1)
        flat_labels = jnp.repeat(
            jnp.arange(n_fg, dtype=jnp.int32), fg_boxes.shape[1]
        )
        keep_idx, keep_valid = batched_nms(
            flat_boxes,
            flat_probs,
            flat_labels,
            iou_threshold,
            post_k=max_det,
            valid=fg_valid.reshape(-1),
            tile=tile,
        )
        safe = jnp.where(keep_valid, keep_idx, 0)
        out_boxes = jnp.where(keep_valid[:, None], flat_boxes[safe], 0.0)
        out_scores = jnp.where(keep_valid, flat_probs[safe], 0.0)
        out_labels = jnp.where(keep_valid, flat_labels[safe], -1)
        return out_boxes, out_labels, out_scores, keep_valid

    n = fg_boxes.shape[1]

    def vmapped_path(_):
        def one_class(b, p, v):
            _, ok, kept_boxes, kept_scores = nms(
                b,
                p,
                iou_threshold,
                post_k=per_class_k,
                valid=v,
                tile=tile,
                return_boxes=True,
            )
            return kept_boxes, kept_scores, ok

        boxes_k, scores_k, valid_k = jax.vmap(one_class)(
            fg_boxes, fg_probs, fg_valid
        )
        labels_k = jnp.broadcast_to(
            jnp.arange(n_fg, dtype=jnp.int32)[:, None], (n_fg, per_class_k)
        )

        flat_scores = jnp.where(
            valid_k.reshape(-1), scores_k.reshape(-1), -1.0
        )
        flat_boxes = boxes_k.reshape(-1, 4)
        flat_labels = labels_k.reshape(-1)
        if flat_scores.shape[0] < max_det:  # pad so max_det is always met
            pad = max_det - flat_scores.shape[0]
            flat_scores = jnp.pad(flat_scores, (0, pad), constant_values=-1.0)
            flat_boxes = jnp.pad(flat_boxes, ((0, pad), (0, 0)))
            flat_labels = jnp.pad(flat_labels, (0, pad))
        top_scores, top_idx = jax.lax.top_k(flat_scores, max_det)
        out_valid = top_scores > 0.0
        out_boxes = jnp.where(out_valid[:, None], flat_boxes[top_idx], 0.0)
        out_labels = jnp.where(out_valid, flat_labels[top_idx], -1)
        out_scores = jnp.where(out_valid, top_scores, 0.0)
        return out_boxes, out_labels, out_scores, out_valid

    # Exact top-K candidate compaction (the common large case, e.g. FPN
    # 90 x 1000): only above-threshold (roi, class) pairs participate in
    # suppression, and per-class greedy NMS over them is unchanged by
    # dropping everything else. Take the global top-K candidates by
    # score (class-major flat order preserves the per-class stable tie
    # order) and run ONE offset-trick NMS over the already-sorted set —
    # survivors come out in global score order, so the first max_det are
    # exactly the final detections. Replaces C-1 vmapped sort+sweep
    # passes (11.1 ms -> ~3 ms at FPN shapes on v5e). If more than K
    # candidates clear the threshold (adversarial: a softmax row can
    # clear 0.05 at most 19 times, so the bound is 19n, not C*n), fall
    # back to the exact vmapped path via lax.cond.
    k_cand = (
        candidate_k
        if candidate_k is not None
        else min(n_fg * n, max(512, 2 * max_det))
    )
    flat_boxes_all = fg_boxes.reshape(-1, 4)
    flat_probs_all = jnp.where(fg_valid, fg_probs, -jnp.inf).reshape(-1)

    def compact_path(_):
        top_s, top_i = jax.lax.top_k(flat_probs_all, k_cand)
        cand_boxes = flat_boxes_all[top_i]
        cand_labels = (top_i // n).astype(jnp.int32)
        cand_valid = jnp.isfinite(top_s)
        max_coord = jnp.max(jnp.where(cand_valid[:, None], cand_boxes, 0.0))
        shifted = cand_boxes + cand_labels.astype(jnp.float32)[:, None] * (
            max_coord + 1.0
        )
        keep_idx, keep_valid = nms(
            shifted,
            top_s,
            iou_threshold,
            post_k=max_det,
            valid=cand_valid,
            tile=tile,
            assume_sorted=True,
        )
        safe = jnp.where(keep_valid, keep_idx, 0)
        out_boxes = jnp.where(keep_valid[:, None], cand_boxes[safe], 0.0)
        out_scores = jnp.where(keep_valid, top_s[safe], 0.0)
        out_labels = jnp.where(keep_valid, cand_labels[safe], -1)
        return out_boxes, out_labels, out_scores, keep_valid

    if k_cand == n_fg * n:
        # top_k degenerates to a full sort: compaction is unconditionally
        # exact, no fallback branch needed.
        return compact_path(None)
    return jax.lax.cond(
        fg_valid.sum() <= k_cand, compact_path, vmapped_path, None
    )
