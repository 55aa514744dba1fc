"""Full Faster R-CNN detectors, both generations, as pure functions.

* :class:`LegacyFRCNN` — VGG16 single-scale pipeline (reference
  models/model.py:269-402): conv5_3 features at stride 16, 9-anchor RPN,
  RoIPool 7x7 head with the shared 4096-wide FC trunk.
* :class:`FPNFRCNN` — ResNet50-FPN pipeline (models/new_model.py:365-470):
  5-level RPN with shared head, MultiScaleRoIAlign 7x7, 1024-wide FC
  trunk, 512-roi sampling.

TPU-first structure: the flax modules hold only parametric compute
(convs/FCs); proposal selection, target assignment and post-processing are
parameter-free pure functions composed by :func:`forward_train` /
:func:`predict`, so a single ``jax.jit``/``pjit`` traces the whole step
with static shapes end-to-end. Per-image logic is ``vmap``-ed over the
batch. Images live on a padded canvas; all box coordinates are normalised
to [0,1] **of the canvas**, and the true image extent (w_frac, h_frac)
flows through every stage (the un-padded reference is the special case
extent == (1,1)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.models import anchors as anchor_lib
from faster_rcnn_pytorch_tpu.models.losses import LossBreakdown, frcnn_loss
from faster_rcnn_pytorch_tpu.models.resnet import ResNet50FPN
from faster_rcnn_pytorch_tpu.models.rpn import RPNHead, propose
from faster_rcnn_pytorch_tpu.models.targets import (
    REG_STD,
    frcnn_targets,
    rpn_targets,
)
from faster_rcnn_pytorch_tpu.models.vgg import VGG16Features
from faster_rcnn_pytorch_tpu.ops.boxes import cxcy_to_xy, decode, xy_to_cxcy
from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms
from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_batch
from faster_rcnn_pytorch_tpu.ops.roi_pool import roi_pool_batch

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static hyper-parameters of one model generation."""

    num_classes: int = 21
    # Proposal budgets (models/model.py:24-28 / new_model.py:54-58).
    pre_nms_train: int = 12000
    post_nms_train: int = 2000
    pre_nms_test: int = 6000
    post_nms_test: int = 300
    rpn_nms_iou: float = 0.7
    rpn_nms_tile: int = 512
    # Train-regime tile: the legacy 12000->2000 sweep halves with 1024
    # tiles (1.93 -> 0.94 ms/b4 isolated — deeper sweep before the
    # post_k early exit amortises bigger MXU IoU tiles), while every
    # <=6000-candidate regime is fastest at 512 (tools note in
    # DESIGN.md §6 round 3). 0 means "use rpn_nms_tile".
    rpn_nms_tile_train: int = 0
    proposal_min_size: float = 1.0 / 1000.0
    # RoI sampling (models/model.py:144-158 / new_model.py:169-182).
    roi_samples: int = 128
    roi_pos_quota: int = 32
    roi_pos_iou: float = 0.5
    label_offset: int = 1
    # RPN targets (models/model.py:202-236).
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_pos_quota: int = 128
    rpn_total_quota: int = 256
    rpn_allow_ties: bool = False
    rpn_boundary_filter: bool = True
    # Test-time suppression (models/model.py:382-402).
    score_threshold: float = 0.05
    nms_iou: float = 0.3
    max_detections: int = 100


LEGACY_CONFIG = DetectorConfig(rpn_nms_tile_train=1024)

FPN_CONFIG = DetectorConfig(
    num_classes=91,
    pre_nms_train=4000,
    post_nms_train=1000,
    pre_nms_test=2000,
    post_nms_test=1000,
    proposal_min_size=10.0 / 1000.0,
    roi_samples=512,
    roi_pos_quota=128,
    label_offset=0,
    rpn_allow_ties=True,
    rpn_boundary_filter=False,
)


class LegacyFRCNN(nn.Module):
    """VGG16 Faster R-CNN (parameters only; see module docstring)."""

    num_classes: int = 21
    dtype: Any = jnp.bfloat16
    remat: bool = False

    def setup(self):
        # nn.remat drops the backbone activations and recomputes them in
        # the backward pass (param structure unchanged) — trades ~1 extra
        # backbone forward for the largest activation footprint, enabling
        # bigger per-chip batches. Reference has no equivalent (torch
        # checkpointing unused there).
        # static_argnums: arg 0 is the module itself, 2 is the python-bool
        # `train` flag that picks the slab-batched stem (vgg.py).
        vgg = (
            nn.remat(VGG16Features, static_argnums=(2,))
            if self.remat
            else VGG16Features
        )
        self.extractor = vgg(dtype=self.dtype)
        self.rpn = RPNHead(num_anchors=9, channels=512, dtype=self.dtype)
        # Shared 4096-wide FC trunk; the reference aliases the same module
        # from both the model and the head (models/model.py:282-298).
        self.fc6 = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32)
        self.fc7 = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32)
        self.cls_head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.reg_head = nn.Dense(
            self.num_classes * 4,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def features(self, images, train=False):
        # [B, H, W, 3] -> [B, H/16, W/16, 512]; `train` statically selects
        # the slab-batched stem (vgg.py — a train-step-only win).
        return self.extractor(images, train)

    def rpn_out(self, feats):  # -> ([B, A, 2], [B, A, 4]) float32
        return self.rpn(feats)

    def head(self, feats, rois):
        """RoI head. feats ``[B, h, w, 512]``, rois ``[B, S, 4]`` in [0,1].

        Rois are scaled to feature-cell coords before RoIPool, matching
        models/model.py:106-113.
        """
        b, fh, fw, _ = feats.shape
        scale = jnp.array([fw, fh, fw, fh], dtype=jnp.float32)
        pooled = roi_pool_batch(feats, rois * scale, 1.0, output_size=7)
        x = pooled.reshape(b, rois.shape[1], -1)  # [B, S, 7*7*512] (h,w,c)
        x = nn.relu(self.fc6(x))
        x = nn.relu(self.fc7(x))
        cls = self.cls_head(x).astype(jnp.float32)
        reg = self.reg_head(x).astype(jnp.float32)
        return cls, reg

    def init_all(self, images, rois):
        feats = self.features(images)
        cls, reg = self.rpn_out(feats)
        head_cls, head_reg = self.head(feats, rois)
        return cls, reg, head_cls, head_reg

    def canvas_anchors(self, height: int, width: int) -> np.ndarray:
        return anchor_lib.legacy_anchors(height, width)


class FPNFRCNN(nn.Module):
    """ResNet50-FPN Faster R-CNN."""

    num_classes: int = 91
    dtype: Any = jnp.bfloat16
    strides: tuple = (4, 8, 16, 32, 64)
    remat: bool = False

    def setup(self):
        self.backbone = ResNet50FPN(dtype=self.dtype, remat=self.remat)
        self.rpn = RPNHead(num_anchors=3, channels=256, dtype=self.dtype)
        self.fc6 = nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32)
        self.fc7 = nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32)
        self.cls_head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.reg_head = nn.Dense(
            self.num_classes * 4,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def features(self, images, train=False):
        # -> tuple of 5 maps (P2..P6); `train` accepted for interface
        # parity with the legacy extractor (no slab path in ResNet).
        del train
        return self.backbone(images)

    def rpn_out(self, feats):
        """Shared RPN head over all levels, concatenated level-major
        (models/new_model.py:27-41).

        Stays per-level: a row-concat single-conv variant (levels padded
        to P2's width with a zero gap row) was measured 3.5x SLOWER
        (2.74 vs 0.78 ms at 800x800 b2 on v5e, tools/chaintime) — the
        pad/concat/slice relayouts cost more than the five dispatches
        they save.
        """
        cls_all, reg_all = [], []
        for f in feats:
            cls, reg = self.rpn(f)
            cls_all.append(cls)
            reg_all.append(reg)
        return (
            jnp.concatenate(cls_all, axis=-2),
            jnp.concatenate(reg_all, axis=-2),
        )

    def head(self, feats, rois, canvas_hw):
        """RoI head over P2..P5. rois ``[B, S, 4]`` in [0,1] canvas coords
        are scaled to canvas pixels for MultiScaleRoIAlign
        (models/new_model.py:134-143). Uses the batch align entry point
        so the strip/corner dispatch cond stays outside the batch axis
        (a vmapped cond executes both paths)."""
        b, s = rois.shape[:2]
        h, w = canvas_hw
        scale = jnp.array([w, h, w, h], dtype=jnp.float32)
        pooled = multiscale_roi_align_batch(
            (feats[0], feats[1], feats[2], feats[3]),
            rois * scale,
            strides=self.strides[:4],
        )
        x = pooled.reshape(b, s, -1)  # [B, S, 7*7*256] (h,w,c)
        x = nn.relu(self.fc6(x))
        x = nn.relu(self.fc7(x))
        cls = self.cls_head(x).astype(jnp.float32)
        reg = self.reg_head(x).astype(jnp.float32)
        return cls, reg

    def init_all(self, images, rois):
        feats = self.features(images)
        cls, reg = self.rpn_out(feats)
        head_cls, head_reg = self.head(feats, rois, images.shape[1:3])
        return cls, reg, head_cls, head_reg

    def canvas_anchors(self, height: int, width: int) -> np.ndarray:
        return anchor_lib.fpn_anchors(height, width, strides=self.strides)


class TrainStepOutput(NamedTuple):
    losses: LossBreakdown
    num_pos_roi: Array
    num_pos_rpn: Array


def _head_apply(model, feats, rois, canvas_hw):
    if isinstance(model, FPNFRCNN):
        return model.head(feats, rois, canvas_hw)
    return model.head(feats, rois)


def forward_train(
    model: nn.Module,
    cfg: DetectorConfig,
    images: Array,
    extents: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_mask: Array,
    rng: Array,
) -> TrainStepOutput:
    """One training forward pass: losses for a padded batch.

    Must be called inside ``model.apply`` via
    ``apply(params, ..., method=forward_train_method(cfg))`` or through
    :func:`make_train_forward`.

    Args:
      images: ``[B, H, W, 3]`` normalised, canvas-padded.
      extents: ``[B, 2]`` (w_frac, h_frac) valid extent per image.
      gt_boxes: ``[B, G, 4]`` xyxy in [0,1] canvas coords.
      gt_labels: ``[B, G]`` int labels (VOC 0..19 / COCO ids per config).
      gt_mask: ``[B, G]`` gt validity.
    """
    b, canvas_h, canvas_w = images.shape[:3]
    anchors = jnp.asarray(model.canvas_anchors(canvas_h, canvas_w))

    feats = model.features(images, train=True)
    rpn_cls, rpn_reg = model.rpn_out(feats)  # [B, A, 2/4]

    rngs = jax.random.split(rng, (b, 3))

    def per_image(cls_i, reg_i, extent_i, boxes_i, labels_i, mask_i, rng_i):
        props = propose(
            cls_i,
            reg_i,
            anchors,
            extent_i,
            pre_k=cfg.pre_nms_train,
            post_k=cfg.post_nms_train,
            nms_iou=cfg.rpn_nms_iou,
            min_size=cfg.proposal_min_size,
            nms_tile=cfg.rpn_nms_tile_train or cfg.rpn_nms_tile,
        )
        rpn_tg = rpn_targets(
            anchors,
            boxes_i,
            mask_i,
            extent_i,
            rng_i[0],
            pos_iou=cfg.rpn_pos_iou,
            neg_iou=cfg.rpn_neg_iou,
            pos_quota=cfg.rpn_pos_quota,
            total_quota=cfg.rpn_total_quota,
            allow_ties=cfg.rpn_allow_ties,
            boundary_filter=cfg.rpn_boundary_filter,
        )
        roi_tg = frcnn_targets(
            props.rois,
            props.valid,
            boxes_i,
            labels_i,
            mask_i,
            rng_i[1],
            num_samples=cfg.roi_samples,
            pos_quota=cfg.roi_pos_quota,
            pos_iou=cfg.roi_pos_iou,
            label_offset=cfg.label_offset,
        )
        return rpn_tg, roi_tg

    rpn_tg, roi_tg = jax.vmap(per_image)(
        rpn_cls, rpn_reg, extents, gt_boxes, gt_labels, gt_mask, rngs
    )

    head_cls, head_reg = _head_apply(
        model, feats, roi_tg.rois, (canvas_h, canvas_w)
    )
    # Gather the regression row of the target class
    # (models/model.py:340-341).
    s = cfg.roi_samples
    head_reg = head_reg.reshape(b, s, cfg.num_classes, 4)
    safe_cls = jnp.clip(roi_tg.labels, 0, cfg.num_classes - 1)
    head_reg = jnp.take_along_axis(
        head_reg, safe_cls[:, :, None, None], axis=2
    )[:, :, 0, :]

    losses = frcnn_loss(
        (rpn_cls, rpn_reg, head_cls, head_reg),
        (rpn_tg.labels, rpn_tg.reg_targets, roi_tg.labels, roi_tg.reg_targets),
    )
    return TrainStepOutput(
        losses=losses,
        num_pos_roi=roi_tg.is_pos.sum(),
        num_pos_rpn=(rpn_tg.labels == 1).sum(),
    )


class Detections(NamedTuple):
    boxes: Array  # [B, D, 4] xyxy in [0,1] canvas coords
    labels: Array  # [B, D] 0-based foreground class ids (-1 pad)
    scores: Array  # [B, D]
    valid: Array  # [B, D]


def predict(
    model: nn.Module,
    cfg: DetectorConfig,
    images: Array,
    extents: Array,
    score_threshold: float | None = None,
) -> Detections:
    """Test-time forward: decode + per-class NMS, fixed detection budget.

    Counterpart of ``FRCNN.predict`` + ``_suppress``
    (models/model.py:346-402): proposals in test mode, head on all rois,
    softmax, un-normalise deltas by REG_STD, decode vs rois, clamp,
    per-class threshold + NMS(0.3), labels shifted to 0-based.
    """
    b, canvas_h, canvas_w = images.shape[:3]
    anchors = jnp.asarray(model.canvas_anchors(canvas_h, canvas_w))
    thres = cfg.score_threshold if score_threshold is None else score_threshold

    feats = model.features(images)
    rpn_cls, rpn_reg = model.rpn_out(feats)

    # NB: an unrolled-over-batch propose was A/B'd end-to-end and
    # reverted — isolated it wins 3.00 -> 1.84 ms/b2 at FPN shapes, but
    # in the fused predict program the win shrinks to noise (20.0 ->
    # 19.8 ms) and legacy b4 REGRESSES 23.9 -> 25.5 ms (the batched
    # 5-operand sort beats 4 single-image sorts). DESIGN.md §6 round 3.
    props = jax.vmap(
        lambda c, r, e: propose(
            c,
            r,
            anchors,
            e,
            pre_k=cfg.pre_nms_test,
            post_k=cfg.post_nms_test,
            nms_iou=cfg.rpn_nms_iou,
            min_size=cfg.proposal_min_size,
            nms_tile=cfg.rpn_nms_tile,
        )
    )(rpn_cls, rpn_reg, extents)

    head_cls, head_reg = _head_apply(
        model, feats, props.rois, (canvas_h, canvas_w)
    )

    s = cfg.post_nms_test
    probs = jax.nn.softmax(head_cls, axis=-1)  # [B, S, C]
    probs = jnp.where(props.valid[:, :, None], probs, 0.0)
    reg = head_reg.reshape(b, s, cfg.num_classes, 4) * REG_STD

    rois_c = xy_to_cxcy(props.rois)[:, :, None, :]  # [B, S, 1, 4]
    boxes = cxcy_to_xy(decode(reg, rois_c))
    boxes = jnp.clip(boxes, 0.0, 1.0)

    def suppress(cls_boxes, cls_probs):
        return multiclass_nms(
            cls_boxes,
            cls_probs,
            thres,
            cfg.nms_iou,
            num_classes=cfg.num_classes,
            per_class_k=cfg.max_detections,
            max_det=cfg.max_detections,
        )

    out_boxes, out_labels, out_scores, out_valid = jax.vmap(suppress)(
        boxes, probs
    )
    return Detections(out_boxes, out_labels, out_scores, out_valid)


def init_detector_params(
    model: nn.Module, rng: Array, canvas: int = 256, batch: int = 1
):
    """Jitted parameter init (eager init dispatches hundreds of tiny ops —
    pathological on TPU-over-tunnel backends)."""
    rs = np.random.RandomState(0)
    images = jnp.asarray(
        rs.normal(size=(batch, canvas, canvas, 3)).astype(np.float32)
    )
    rois = jnp.asarray(
        rs.uniform(0.2, 0.5, size=(batch, 4, 4)).astype(np.float32)
    )
    init_fn = jax.jit(lambda r, im, ro: model.init(r, im, ro, method="init_all"))
    return init_fn(rng, images, rois)


def label_offset_for(generation: str, data_type: str) -> int:
    """Dataset-label -> head-class-index offset.

    The FPN generation consumes raw COCO category ids (1..90, bg 0 —
    reference new_model.py trains on target['labels'] as-is), so COCO +
    fpn needs no offset; every 0-based labelling (VOC 0..19, COCO
    contiguous remap for the legacy generation) shifts by +1 to clear
    the background slot (reference model.py adds the +1 in its target
    maker). Mixing fpn with VOC previously reused the COCO-raw offset 0
    and silently mislabelled every detection by one class."""
    return 0 if (generation == "fpn" and data_type == "coco") else 1


def build_model(
    generation: str,
    num_classes: int | None = None,
    dtype=jnp.bfloat16,
    label_offset: int | None = None,
    remat: bool = False,
):
    """Model + config factory (counterpart of models/build.py:7-19 minus
    the DDP wrap — parallelism is a sharding concern, see ``parallel``).
    ``label_offset`` overrides the config default — pass
    :func:`label_offset_for` when the dataset's label convention differs
    from the generation's home dataset."""
    if generation == "legacy":
        base = LEGACY_CONFIG
        model_cls = LegacyFRCNN
    elif generation == "fpn":
        base = FPN_CONFIG
        model_cls = FPNFRCNN
    else:
        raise ValueError(f"unknown generation: {generation!r}")
    overrides = {}
    if num_classes is not None:
        overrides["num_classes"] = num_classes
    if label_offset is not None:
        overrides["label_offset"] = label_offset
    cfg = dataclasses.replace(base, **overrides) if overrides else base
    return model_cls(num_classes=cfg.num_classes, dtype=dtype, remat=remat), cfg
