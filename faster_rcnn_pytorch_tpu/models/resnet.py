"""ResNet50 + FPN backbone (new-generation model).

TPU-native counterpart of torchvision's ``resnet_fpn_backbone('resnet50',
trainable_layers=3)`` used by the reference FPN model
(models/new_model.py:372). Matching design decisions:

* **FrozenBatchNorm** everywhere — torchvision's detection backbones never
  update BN statistics; scale/offset/mean/var are plain (non-learned)
  constants folded at load time. This also removes the reference's need
  for SyncBatchNorm across data-parallel replicas (models/build.py:9-14):
  there is simply no cross-device stat to sync.
* ``trainable_layers=3`` — conv1 + layer1 are wrapped in
  ``stop_gradient`` (torchvision sets requires_grad=False on them).
* FPN: 1x1 lateral + 3x3 output convs at 256 channels, top-down nearest
  upsampling, plus a stride-2 max-pool extra level (``LastLevelMaxPool``)
  that feeds the RPN only.

Layout is NHWC and activations bfloat16 by default (MXU-friendly).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant statistics and affine params.

    Parameters are stored as flax params so checkpoint import can fill
    them, but the trainer must exclude ``frozen_bn`` collections from the
    optimizer (they carry no gradient signal anyway under stop_gradient
    at the stage level for frozen stages; for trainable stages torchvision
    also keeps BN frozen — we mark these params via name filtering).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + (
            bias.astype(x.dtype)
        )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block with expansion 4."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            strides=s,
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        residual = x
        y = conv(self.features, 1, 1, "conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, self.strides, "conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, 1, 1, "conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = conv(self.features * 4, 1, self.strides, "down_conv")(x)
            residual = FrozenBatchNorm(self.features * 4, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Returns the C2..C5 feature pyramid ([/4, /8, /16, /32])."""

    dtype: jnp.dtype = jnp.bfloat16
    frozen_stages: int = 2  # conv1 + layer1 (torchvision trainable_layers=3)
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=2,
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        feats = []
        # Per-bottleneck remat: each block's internal activations are
        # recomputed in the backward pass; only block boundaries are
        # saved. Param structure is unchanged (importer-compatible).
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage, blocks in enumerate(self.stage_sizes):
            width = 64 * 2**stage
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = block_cls(
                    width,
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage + 2 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            feats.append(x)
        return tuple(feats)


class FPN(nn.Module):
    """Feature Pyramid Network: C2..C5 -> P2..P5 (+ P6 via max-pool).

    torchvision FeaturePyramidNetwork parity: 1x1 lateral convs, nearest
    top-down upsample, 3x3 output convs, ``LastLevelMaxPool`` extra map.
    """

    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        laterals = [
            conv(self.out_channels, 1, f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        out = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = out[0]
            n, h, w, c = laterals[i].shape
            up = jax.image.resize(up, (n, h, w, c), method="nearest")
            out.insert(0, laterals[i] + up)
        pyramids = [
            conv(self.out_channels, 3, f"output{i}")(f)
            for i, f in enumerate(out)
        ]
        p6 = nn.max_pool(pyramids[-1], (1, 1), strides=(2, 2))
        return tuple(pyramids) + (p6,)


class ResNet50FPN(nn.Module):
    """Full backbone: image -> (P2, P3, P4, P5, P6)."""

    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        feats = ResNet50(dtype=self.dtype, remat=self.remat, name="body")(x)
        return FPN(dtype=self.dtype, name="fpn")(feats)
