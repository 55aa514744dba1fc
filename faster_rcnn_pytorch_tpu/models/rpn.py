"""Region Proposal Network head + fixed-shape proposal selection.

Counterparts of the reference RPN (models/model.py:61-84 legacy,
models/new_model.py:89-114 FPN) and its dynamic-shape proposal filter
(``RegionProposal``, models/model.py:12-58). The TPU redesign replaces
every dynamic step with a static one:

* the min-size filter becomes score masking (``-inf``), never a shape
  change (reference boolean-masks at models/model.py:37-41),
* sort + slice becomes ``lax.top_k`` with a fixed ``pre_k``,
* CUDA NMS becomes the fixed-budget greedy NMS of :mod:`..ops.nms`,
* the gradient cut on rois (``.detach()``, models/model.py:55) is
  ``jax.lax.stop_gradient``.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.boxes import cxcy_to_xy, decode, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.nms import nms

Array = jax.Array

normal_init = nn.initializers.normal  # reference inits all RPN convs N(0, .01)


class RPNHead(nn.Module):
    """3x3 conv + ReLU, then 1x1 objectness (A*2) and regression (A*4).

    Input ``[h, w, c]`` or ``[n, h, w, c]``; outputs flattened per-anchor
    predictions ordered (y, x, anchor) to match the anchor layout.
    """

    num_anchors: int = 9
    channels: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=normal_init(0.01),
            name=name,
        )
        self.inter = conv(self.channels, 3, "inter")
        self.cls = conv(self.num_anchors * 2, 1, "cls")
        self.reg = conv(self.num_anchors * 4, 1, "reg")

    def maps(self, feat):
        """Raw conv maps ``[..., h, w, a*2] / [..., h, w, a*4]`` (model
        dtype) — callers that batch several feature maps through one
        conv (FPN level concat) slice these before the anchor reshape."""
        x = nn.relu(self.inter(feat))
        return self.cls(x), self.reg(x)

    def __call__(self, feat):
        cls, reg = self.maps(feat)
        lead = feat.shape[:-3]
        cls = cls.reshape(*lead, -1, 2).astype(jnp.float32)
        reg = reg.reshape(*lead, -1, 4).astype(jnp.float32)
        return cls, reg


class Proposals(NamedTuple):
    rois: Array  # [post_k, 4] xyxy in [0,1] canvas coords
    valid: Array  # [post_k] bool
    scores: Array  # [post_k] objectness (diagnostics)


def propose(
    rpn_cls: Array,
    rpn_reg: Array,
    anchors: Array,
    extent: Array,
    pre_k: int,
    post_k: int,
    nms_iou: float = 0.7,
    min_size: float = 1.0 / 1000.0,
    nms_tile: int = 512,
) -> Proposals:
    """Select ``post_k`` proposals from per-anchor RPN predictions.

    Mirrors ``RegionProposal.forward`` (models/model.py:17-58): softmax
    foreground score; decode deltas against anchors; clamp into the valid
    image extent; drop boxes smaller than ``min_size`` (by score masking);
    keep top ``pre_k`` by score; greedy NMS; keep first ``post_k``.

    Args:
      rpn_cls: ``[A, 2]`` objectness logits.
      rpn_reg: ``[A, 4]`` box deltas.
      anchors: ``[A, 4]`` xyxy anchors in [0,1] canvas coords.
      extent: ``[2]`` (w_frac, h_frac) valid image extent within the
        padded canvas — the un-padded reference behaves as extent (1, 1).
    """
    fg = jax.nn.softmax(rpn_cls, axis=-1)[:, 1]
    boxes = cxcy_to_xy(decode(rpn_reg, xy_to_cxcy(anchors)))
    hi = jnp.concatenate([extent, extent])
    boxes = jnp.clip(boxes, 0.0, hi[None, :])

    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    ok = (ws >= min_size) & (hs >= min_size)
    score = jnp.where(ok, fg, -jnp.inf)

    # Two regimes for the top-pre_k selection (both end with descending
    # scores, so NMS skips its own sort):
    # * small anchor sets (legacy single-scale, ~22k): one multi-operand
    #   stable sort carries the box columns with the scores and a static
    #   pre_k slice is free — no gather anywhere,
    # * large anchor sets (FPN, ~255k): the full 5-operand sort costs
    #   hundreds of ms; lax.top_k + a [pre_k, 4] gather is far cheaper.
    n = score.shape[0]
    k = min(pre_k, n)
    if n <= 65536:
        neg, bx1, by1, bx2, by2 = jax.lax.sort(
            (-score, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]),
            num_keys=1,
            is_stable=True,
        )
        sorted_scores = -neg[:k]
        sorted_boxes = jnp.stack(
            [bx1[:k], by1[:k], bx2[:k], by2[:k]], axis=-1
        )
    else:
        # A per-level top-k + merge decomposition (exact, incl. tie
        # order) was built and A/B'd on-chip: 3.12 ms vs 2.74 ms for
        # the global top_k at the FPN predict shapes — XLA's global
        # top_k wins, so the decomposition was removed (2026-08-18).
        sorted_scores, top_idx = jax.lax.top_k(score, k)
        sorted_boxes = boxes[top_idx]
    in_budget = sorted_scores > -jnp.inf

    _, keep_valid, rois, scores = nms(
        sorted_boxes,
        sorted_scores,
        nms_iou,
        post_k=post_k,
        valid=in_budget,
        tile=nms_tile,
        assume_sorted=True,
        return_boxes=True,
    )
    return Proposals(
        rois=jax.lax.stop_gradient(rois),
        valid=keep_valid,
        scores=jax.lax.stop_gradient(scores),
    )
