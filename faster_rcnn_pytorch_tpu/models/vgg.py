"""VGG16 feature extractor (legacy-generation backbone).

TPU-native re-design of the backbone the reference takes from torchvision
(``vgg16(pretrained=True).features[:-1]``, models/model.py:275-281): the
13 conv layers of VGG16 with the final max-pool dropped, so the output
stride is 16 and channels are 512.

Differences from a naive port:

* NHWC layout (TPU conv layout; torch is NCHW),
* bfloat16 activations by default with float32 params (MXU-friendly),
* runs under ``jax.checkpoint`` policy control from the trainer, not here.

The 4096-wide two-layer FC "classifier" shared between the RoI head and
the torchvision checkpoint (models/model.py:282-285) lives in
:mod:`.heads`, not here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# (channels, layers-in-stage); a max-pool follows each stage except the
# last (stride-16 output).
VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """VGG16 conv1_1..conv5_3 with ReLU, pools between stages only.

    Input ``[n, h, w, 3]`` (ImageNet-normalised), output
    ``[n, h/16, w/16, 512]``.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        conv_idx = 0
        for stage, (ch, layers) in enumerate(VGG16_STAGES):
            for _ in range(layers):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding=1,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            if stage < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


# torchvision vgg16().features indices of the 13 convs, in order — used by
# the checkpoint importer to map ``features.{i}.weight`` -> ``conv{k}``.
TORCH_VGG16_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
