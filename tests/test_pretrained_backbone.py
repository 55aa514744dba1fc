"""ImageNet-pretrained backbone import: numerical parity vs torch.

The reference bootstraps training from torchvision ImageNet weights
(``vgg16(pretrained=True)`` models/model.py:275-281;
``resnet_fpn_backbone('resnet50', IMAGENET1K_V1)`` new_model.py:372).
These tests build the same forward passes from plain ``torch.nn`` (no
torchvision in this image), emit state dicts in torchvision naming, and
check the converted flax backbones produce identical feature maps.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch
import torch.nn as tnn

from faster_rcnn_pytorch_tpu.models.resnet import ResNet50
from faster_rcnn_pytorch_tpu.models.vgg import (
    TORCH_VGG16_CONV_INDICES,
    VGG16_STAGES,
    VGG16Features,
)
from faster_rcnn_pytorch_tpu.utils import checkpoint as ck


def build_torch_vgg16_features() -> tnn.Module:
    """torchvision vgg16().features layout from plain torch.nn: conv/ReLU
    stacks with a MaxPool after each stage — layer indices match
    TORCH_VGG16_CONV_INDICES."""
    layers: list[tnn.Module] = []
    in_ch = 3
    for ch, n in VGG16_STAGES:
        for _ in range(n):
            layers.append(tnn.Conv2d(in_ch, ch, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = ch
        layers.append(tnn.MaxPool2d(2, 2))
    model = tnn.Module()
    model.features = tnn.Sequential(*layers)
    conv_idx = [
        i for i, m in enumerate(model.features) if isinstance(m, tnn.Conv2d)
    ]
    assert tuple(conv_idx) == TORCH_VGG16_CONV_INDICES
    return model


def test_vgg16_imagenet_import_feature_parity():
    torch.manual_seed(0)
    model = build_torch_vgg16_features().eval()
    for p in model.parameters():  # non-degenerate random weights
        p.data.normal_(0, 0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    extractor = ck.import_torchvision_vgg16(sd)

    rs = np.random.RandomState(1)
    x = rs.normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        # features[:-1]: the reference drops the final max-pool (stride 16)
        want = model.features[:-1](torch.from_numpy(x)).numpy()

    flax_model = VGG16Features(dtype=jnp.float32)
    got = flax_model.apply(
        {"params": extractor}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # scale-relative: float32 accumulation order differs between backends
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5, rel


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, width, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or in_ch != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, width * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class TorchResNet50Body(tnn.Module):
    """torchvision resnet50 body in torchvision state-dict naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for stage, blocks in enumerate((3, 4, 6, 3)):
            width = 64 * 2**stage
            mods = []
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                mods.append(TorchBottleneck(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = []
        for s in (1, 2, 3, 4):
            x = getattr(self, f"layer{s}")(x)
            feats.append(x)
        return feats


def test_resnet50_imagenet_import_feature_parity():
    torch.manual_seed(2)
    model = TorchResNet50Body().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05)
            if isinstance(m, tnn.BatchNorm2d):
                # randomise affine + running stats to catch any mapping slip
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    body = ck.import_torchvision_resnet50(sd)

    rs = np.random.RandomState(3)
    x = rs.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in model(torch.from_numpy(x))]

    flax_model = ResNet50(dtype=jnp.float32)
    got = flax_model.apply(
        {"params": body}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert len(got) == 4
    for c, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        rel = np.abs(g - w).max() / np.abs(w).max()
        assert rel < 1e-5, f"C{c + 2}: {rel}"


def test_load_pretrained_backbone_wiring(tmp_path):
    """End-to-end flag path: a saved vgg16 .pth replaces exactly the
    extractor subtree of freshly initialised detector params."""
    torch.manual_seed(4)
    model = build_torch_vgg16_features()
    path = str(tmp_path / "vgg16_imagenet.pth")
    torch.save(model.state_dict(), path)

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model

    det, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    rs = np.random.RandomState(5)
    images = jnp.asarray(rs.normal(size=(1, 64, 64, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = det.init(jax.random.key(0), images, rois, method="init_all")

    before_rpn = np.asarray(
        jax.tree.leaves(params["params"]["rpn"])[0]
    ).copy()
    merged = ck.load_pretrained_backbone(params, path, "legacy")

    want = ck.import_torchvision_vgg16(
        {k: v.numpy() for k, v in model.state_dict().items()}
    )
    got_leaf = np.asarray(merged["params"]["extractor"]["conv0"]["kernel"])
    np.testing.assert_allclose(got_leaf, want["conv0"]["kernel"])
    # non-backbone params untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(merged["params"]["rpn"])[0]), before_rpn
    )


def test_load_pretrained_backbone_shape_mismatch_raises(tmp_path):
    torch.manual_seed(6)
    model = build_torch_vgg16_features()
    # corrupt one conv shape
    sd = model.state_dict()
    sd["features.0.weight"] = torch.zeros(64, 3, 5, 5)
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model

    det, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    rs = np.random.RandomState(7)
    images = jnp.asarray(rs.normal(size=(1, 64, 64, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = det.init(jax.random.key(0), images, rois, method="init_all")
    with pytest.raises(ValueError, match="shape mismatch"):
        ck.load_pretrained_backbone(params, path, "legacy")
