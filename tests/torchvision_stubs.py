"""Runnable torchvision stand-ins for the reference-oracle tests.

The reference's FPN generation (``/root/reference/models/new_model.py``)
composes four torchvision components at runtime: ``resnet_fpn_backbone``,
``AnchorGenerator``, ``MultiScaleRoIAlign`` and ``ImageList``.
torchvision itself is not installed, so these classes reimplement the
exact semantics on plain torch/numpy — state-dict key layout included
(``body.conv1``, ``fpn.inner_blocks.{i}.0`` …), so a state dict taken
from the stubbed reference model feeds ``import_fpn_torch_params``
unchanged.

Scope note: these stubs exist so the reference's OWN glue code
(per-level RPN concat, proposal budgets, roi rescale, ``_suppress``) can
run end-to-end as an oracle. The stub internals (anchor formula, level
mapping, roi_align) mirror torchvision's published semantics and are
independently pinned by the golden/oracle tests in test_anchors.py and
test_roi_ops.py.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class ImageList:
    def __init__(self, tensors, image_sizes):
        self.tensors = tensors
        self.image_sizes = image_sizes


# ----------------------------------------------------------- backbone


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet50Body(nn.Module):
    """torchvision resnet50 trunk with IntermediateLayerGetter naming:
    returns the C2..C5 feature dict {"0","1","2","3"}."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return OrderedDict([("0", c2), ("1", c3), ("2", c4), ("3", c5)])


class _FPN(nn.Module):
    """torchvision FeaturePyramidNetwork + LastLevelMaxPool with the
    Conv2dNormActivation key layout (``inner_blocks.{i}.0.weight``)."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(c, out_channels, 1)) for c in in_channels]
        )
        self.layer_blocks = nn.ModuleList(
            [
                nn.Sequential(nn.Conv2d(out_channels, out_channels, 3, padding=1))
                for _ in in_channels
            ]
        )

    def forward(self, feats: OrderedDict):
        xs = list(feats.values())
        last_inner = self.inner_blocks[-1](xs[-1])
        results = [self.layer_blocks[-1](last_inner)]
        for idx in range(len(xs) - 2, -1, -1):
            lateral = self.inner_blocks[idx](xs[idx])
            top_down = F.interpolate(
                last_inner, size=lateral.shape[-2:], mode="nearest"
            )
            last_inner = lateral + top_down
            results.insert(0, self.layer_blocks[idx](last_inner))
        pool = F.max_pool2d(results[-1], 1, 2, 0)
        names = list(feats.keys()) + ["pool"]
        return OrderedDict(zip(names, results + [pool]))


class BackboneWithFPN(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = _ResNet50Body()
        self.fpn = _FPN()

    def forward(self, x):
        return self.fpn(self.body(x))


def resnet_fpn_backbone(name, weights=None, trainable_layers=3, **kw):
    assert name == "resnet50", name
    return BackboneWithFPN()


# ----------------------------------------------------- anchor generator


class AnchorGenerator(nn.Module):
    """torchvision.models.detection.rpn.AnchorGenerator semantics:
    rounded base anchors, grid strides = image_size // grid_size,
    y-major/x-fastest shift order, per-position anchor blocks."""

    def __init__(self, sizes, aspect_ratios):
        super().__init__()
        self.sizes = sizes
        self.aspect_ratios = aspect_ratios

    @staticmethod
    def _cell(size, ratios):
        r = torch.as_tensor(ratios, dtype=torch.float32)
        scales = torch.as_tensor(size, dtype=torch.float32)
        h_ratios = torch.sqrt(r)
        w_ratios = 1.0 / h_ratios
        ws = (w_ratios[:, None] * scales[None, :]).view(-1)
        hs = (h_ratios[:, None] * scales[None, :]).view(-1)
        return (torch.stack([-ws, -hs, ws, hs], dim=1) / 2).round()

    def forward(self, image_list, feature_maps):
        ih, iw = image_list.tensors.shape[-2:]
        out = []
        for feat, size, ratios in zip(
            feature_maps, self.sizes, self.aspect_ratios
        ):
            gh, gw = feat.shape[-2:]
            stride_h, stride_w = ih // gh, iw // gw
            cell = self._cell(size, ratios)
            sx = torch.arange(gw, dtype=torch.float32) * stride_w
            sy = torch.arange(gh, dtype=torch.float32) * stride_h
            shift_y, shift_x = torch.meshgrid(sy, sx, indexing="ij")
            shifts = torch.stack(
                [
                    shift_x.reshape(-1),
                    shift_y.reshape(-1),
                    shift_x.reshape(-1),
                    shift_y.reshape(-1),
                ],
                dim=1,
            )
            out.append(
                (shifts.view(-1, 1, 4) + cell.view(1, -1, 4)).reshape(-1, 4)
            )
        return [torch.cat(out)]

    __call__ = forward


# -------------------------------------------------- multiscale roialign


def _np_roi_align(feat_hwc, rois, scale, out, ratio):
    """torchvision roi_align (aligned=False) — the same oracle as
    tests/test_roi_ops.np_roi_align, duplicated here to avoid a test->
    test import cycle at fixture time."""

    def bilinear(feat, y, x):
        h, w, _ = feat.shape
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(feat.shape[-1])
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    n = len(rois)
    c = feat_hwc.shape[-1]
    res = np.zeros((n, out, out, c), dtype=np.float64)
    for i, (x1, y1, x2, y2) in enumerate(rois):
        sx, sy = x1 * scale, y1 * scale
        rw = max(x2 * scale - sx, 1.0)
        rh = max(y2 * scale - sy, 1.0)
        bw, bh = rw / out, rh / out
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(c)
                for iy in range(ratio):
                    y = sy + ph * bh + (iy + 0.5) * bh / ratio
                    for ix in range(ratio):
                        x = sx + pw * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear(feat_hwc, y, x)
                res[i, ph, pw] = acc / (ratio * ratio)
    return res


class MultiScaleRoIAlign(nn.Module):
    """torchvision.ops.MultiScaleRoIAlign semantics: power-of-2 scale
    inference, canonical-224/level-4 LevelMapper, per-level roi_align
    (aligned=False), results in original roi order."""

    def __init__(self, featmap_names, output_size, sampling_ratio):
        super().__init__()
        self.featmap_names = featmap_names
        self.out = output_size if isinstance(output_size, int) else output_size[0]
        self.ratio = sampling_ratio

    def forward(self, features, boxes_list, image_shapes):
        feats = [features[k] for k in self.featmap_names]
        rois = boxes_list[0].detach().numpy().astype(np.float64)
        orig = image_shapes[0]
        scales = []
        for f in feats:
            approx = float(f.shape[-2]) / float(orig[0])
            scales.append(2.0 ** float(np.round(np.log2(approx))))
        k_min = int(-np.log2(scales[0]))
        k_max = int(-np.log2(scales[-1]))
        # LevelMapper(canonical_scale=224, canonical_level=4, eps=1e-6)
        areas = np.maximum(
            (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0
        )
        s = np.sqrt(areas)
        lvls = np.floor(4 + np.log2(s / 224.0 + 1e-36) + 1e-6)
        lvls = np.clip(lvls, k_min, k_max).astype(np.int64) - k_min
        c = feats[0].shape[1]
        pooled = np.zeros((len(rois), self.out, self.out, c), np.float64)
        for li, (f, sc) in enumerate(zip(feats, scales)):
            idx = np.where(lvls == li)[0]
            if not len(idx):
                continue
            feat_hwc = f[0].permute(1, 2, 0).detach().numpy()
            pooled[idx] = _np_roi_align(
                feat_hwc, rois[idx], sc, self.out, self.ratio
            )
        return torch.from_numpy(
            np.ascontiguousarray(
                pooled.transpose(0, 3, 1, 2).astype(np.float32)
            )
        )

    __call__ = forward
