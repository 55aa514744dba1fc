"""Load the ACTUAL reference modules with torchvision stubbed out.

Shared between the parity test suite (tests/test_reference_parity.py)
and the measured-baseline tool (tools/measure_torch_baseline.py): the
reference at /root/reference is pure torch except for the torchvision
entry points (``nms``, ``RoIPool``, ``vgg16``, and the FPN generation's
``resnet_fpn_backbone``/``AnchorGenerator``/``MultiScaleRoIAlign``,
models/model.py:6-9 and models/new_model.py:8-13). torch (CPU) is
installed; the torchvision names get runnable stand-ins so the
reference code imports and runs verbatim as an oracle / baseline.
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np
import torch

REFERENCE = "/root/reference"

# tests/ is not a package; torchvision_stubs lives next to this file.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tv_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: descending score order, suppress
    iff IoU with a kept box is strictly greater than the threshold."""
    b = boxes.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy().astype(np.float64)
    order = np.argsort(-s, kind="stable")
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    suppressed = np.zeros(len(b), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(b[i, 0], b[:, 0])
        yy1 = np.maximum(b[i, 1], b[:, 1])
        xx2 = np.minimum(b[i, 2], b[:, 2])
        yy2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


@contextlib.contextmanager
def reference_modules():
    """Import the reference modules with torchvision stubbed out.

    Yields a namespace with ``anchor``, ``util``, ``loss``, ``model``
    (legacy VGG16 generation) and ``new_model`` (ResNet50-FPN
    generation) — the reference's own modules, runnable on torch-CPU.
    Restores ``sys.modules``/``sys.path``/torch patches on exit.
    """
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_ops = types.ModuleType("torchvision.ops")

    def _vgg16(*a, **k):
        """Seeded random-weight VGG16 with torchvision's exact `features`
        layout (13 convs / 5 maxpools, cfg D) — enough for
        FRCNN.__init__'s ``backbone.features[:-1]`` slice
        (models/model.py:275-281). kaiming_normal keeps activation
        magnitudes O(1) through the 13-layer stack so downstream scores
        are spread, not near-tied."""
        import torch.nn as nn

        torch.manual_seed(11)
        cfg_d = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512, "M"]
        layers: list = []
        in_ch = 3
        for v in cfg_d:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                conv = nn.Conv2d(in_ch, v, 3, padding=1)
                nn.init.kaiming_normal_(conv.weight, nonlinearity="relu")
                nn.init.normal_(conv.bias, 0.0, 0.01)
                layers.append(conv)
                layers.append(nn.ReLU(inplace=True))
                in_ch = v
        return types.SimpleNamespace(features=nn.Sequential(*layers))

    tv_models.vgg16 = _vgg16
    tv_ops.nms = _tv_nms

    class _RoIPool:
        """torchvision.ops.RoIPool semantics via the numpy oracle shared
        with test_roi_ops (rounded start/end, +1 extent, floor/ceil bin
        edges, empty bins -> 0)."""

        def __init__(self, output_size=(7, 7), spatial_scale=1.0):
            self.out = output_size[0]
            self.scale = spatial_scale

        def __call__(self, features, rois_list):
            from test_roi_ops import np_roi_pool

            feat = features[0].permute(1, 2, 0).detach().numpy()  # HWC
            rois = rois_list[0].detach().numpy()
            pooled = np_roi_pool(feat, rois, self.scale, out=self.out)
            return torch.from_numpy(
                np.ascontiguousarray(
                    pooled.transpose(0, 3, 1, 2).astype(np.float32)
                )
            )

    tv_ops.RoIPool = _RoIPool
    tv.models = tv_models
    tv.ops = tv_ops

    # Names needed by models/new_model.py (FPN): runnable
    # torchvision-semantics stand-ins (tests/torchvision_stubs.py) so the
    # FPN generation can run END-TO-END as an oracle, not just its
    # target makers.
    import torchvision_stubs as tvs

    class _Opaque:
        def __init__(self, *a, **k):
            pass

    tv_ops.MultiScaleRoIAlign = tvs.MultiScaleRoIAlign
    tv_det = types.ModuleType("torchvision.models.detection")
    tv_il = types.ModuleType("torchvision.models.detection.image_list")
    tv_il.ImageList = tvs.ImageList
    tv_bu = types.ModuleType("torchvision.models.detection.backbone_utils")
    tv_bu.resnet_fpn_backbone = tvs.resnet_fpn_backbone
    tv_rpn = types.ModuleType("torchvision.models.detection.rpn")
    tv_rpn.AnchorGenerator = tvs.AnchorGenerator
    tv_det.image_list = tv_il
    tv_det.backbone_utils = tv_bu
    tv_det.rpn = tv_rpn
    tv_models.detection = tv_det
    tv_models.ResNet50_Weights = types.SimpleNamespace(
        IMAGENET1K_V1="IMAGENET1K_V1"
    )
    tv_mu = types.ModuleType("torchvision.models._utils")
    tv_mu.IntermediateLayerGetter = _Opaque
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_models._utils = tv_mu
    tv_models.resnet = tv_resnet
    tv_fpn = types.ModuleType("torchvision.ops.feature_pyramid_network")
    tv_fpn.ExtraFPNBlock = _Opaque
    tv_fpn.FeaturePyramidNetwork = _Opaque
    tv_fpn.LastLevelMaxPool = _Opaque
    tv_ops.feature_pyramid_network = tv_fpn
    tv_boxes = types.ModuleType("torchvision.ops.boxes")

    def _box_area(boxes):  # torchvision.ops.boxes.box_area semantics
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = _box_area
    tv_ops.boxes = tv_boxes

    _stub_names = (
        "torchvision",
        "torchvision.models",
        "torchvision.ops",
        "torchvision.models.detection",
        "torchvision.models.detection.image_list",
        "torchvision.models.detection.backbone_utils",
        "torchvision.models.detection.rpn",
        "torchvision.models._utils",
        "torchvision.models.resnet",
        "torchvision.ops.feature_pyramid_network",
        "torchvision.ops.boxes",
    )
    _stub_mods = (
        tv, tv_models, tv_ops, tv_det, tv_il, tv_bu, tv_rpn, tv_mu,
        tv_resnet, tv_fpn, tv_boxes,
    )
    saved_modules = {k: sys.modules.get(k) for k in _stub_names}
    for k, m in zip(_stub_names, _stub_mods):
        sys.modules[k] = m

    # CPU tensors: .get_device() returns -1 and .to(-1) fails; the
    # reference uses both as "the device of x".
    orig_get_device = torch.Tensor.get_device
    orig_torch_get_device = torch.get_device
    torch.Tensor.get_device = lambda self: torch.device("cpu")
    torch.get_device = lambda t: torch.device("cpu")

    sys.path.insert(0, REFERENCE)
    try:
        import anchor as ref_anchor
        import utils.util as ref_util
        import losses.loss as ref_loss
        import models.model as ref_model
        import models.new_model as ref_new_model

        yield types.SimpleNamespace(
            anchor=ref_anchor,
            util=ref_util,
            loss=ref_loss,
            model=ref_model,
            new_model=ref_new_model,
        )
    finally:
        sys.path.remove(REFERENCE)
        torch.Tensor.get_device = orig_get_device
        torch.get_device = orig_torch_get_device
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in ("anchor", "utils", "utils.util", "losses", "losses.loss",
                  "models", "models.model", "models.new_model",
                  "util", "util.box_ops"):
            sys.modules.pop(k, None)
