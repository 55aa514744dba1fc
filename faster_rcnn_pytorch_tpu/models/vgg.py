"""VGG16 feature extractor (legacy-generation backbone).

TPU-native re-design of the backbone the reference takes from torchvision
(``vgg16(pretrained=True).features[:-1]``, models/model.py:275-281): the
13 conv layers of VGG16 with the final max-pool dropped, so the output
stride is 16 and channels are 512.

Differences from a naive port:

* NHWC layout (TPU conv layout; torch is NCHW),
* bfloat16 activations by default with float32 params (MXU-friendly),
* runs under ``jax.checkpoint`` policy control from the trainer, not here,
* the 64-channel stem is *slab-batched* at small batch (see below).

The 4096-wide two-layer FC "classifier" shared between the RoI head and
the torchvision checkpoint (models/model.py:282-285) lives in
:mod:`.heads`, not here.

Slab-batched stem
-----------------

XLA's fast TPU conv strategy for the 64-channel stem needs batch >= 8:
at equal total work, ``[b,h,w,64]x64`` 3x3 convs run ~21-27 TF/s for
b<=4 but ~68-76 TF/s for b>=8 (``tools/microbench_conv_shapes.py``).
Detection batches are small (1-4 images of 800x800), so stage 1 —
conv1_1/conv1_2 at full resolution, the single largest term in both
predict (8.3 of 24.9 ms) and the train step (conv1_2 fwd+bwd alone
~27 ms) — runs at a quarter of its potential.

Fix: split each image's rows into S contiguous slabs with k halo rows
(k = convs in the segment = 2), conv the ``[b*S, slab+2k, w, c]`` stack
with VALID height padding, and reshape back. Exactness requires one
subtlety: halo rows that lie *outside the image* must be re-zeroed after
every intermediate conv — the plain network's next conv pads with
literal zeros there, while a computed halo row is
``relu(conv(zero_pad)+bias) != 0``. With that mask the slab output
matches the plain stage to 1 bf16 ulp, and stage-1 fwd+bwd drops
40.6 -> 26.4 ms at b4 on v5e (``tools/microbench_slab_stem.py``).

Slabbing engages on the TRAIN forward only (end-to-end train b4
31.7 -> 41.0 img/s); the forward-only predict path measured marginally
slower slabbed (154.0 vs 157.5 img/s), so it stays plain there — see
``_slab_factor`` for the knobs.

Stage 2 (128 ch at h/2) is batch-bound the same way
(``tools/microbench_conv_shapes2.py``: conv2_2 b4 76 -> 199 TF/s at
effective batch 8; fwd+bwd 8.1 -> 2.9 ms, conv2_1 5.8 -> 1.9 ms), so
the first TWO stages are slabbed in the train forward. Stage 3+
(256-512 ch) already runs at 173-262 TF/s — no slab there.
End-to-end train b4: 41.1 -> 46.6 img/s measured on-chip (bench.py
legacy_train_b4 A/B at this commit).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

# (channels, layers-in-stage); a max-pool follows each stage except the
# last (stride-16 output).
VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

def _slab_factor(n: int, h: int, train: bool) -> int:
    """Largest useful slab count for batch ``n`` and image height ``h``.

    Returns 1 when slabbing is off, not needed (batch already >= target)
    or impossible (height not divisible into equal even slabs — slab
    height must be even so the following 2x2 max-pool stays aligned).

    Slabbing engages in the TRAIN forward only: the backward's gradient
    convs gain 35% from batch >= 8, but on the forward-only predict path
    the pad/stack/reshape layout ops cost slightly more than the conv
    win inside the fused program (on-chip A/B: predict b4 154.0 slabbed
    vs 157.5 plain img/s; train b4 31.7 -> 41.0 img/s).

    The target effective batch (images x slabs) defaults to 8 — below
    that XLA picks its slow small-batch conv schedule for 64-channel
    convs. ``n`` is the *traced* (global) batch, so multi-chip DP users
    whose per-device batch is smaller can raise ``FRT_SLAB_TARGET`` to
    ``8 * n_data_shards``. ``FRT_SLAB_STEM=0`` disables slabbing
    entirely; ``FRT_SLAB_STEM=always`` applies it to predict too.
    """
    mode = os.environ.get("FRT_SLAB_STEM", "1")
    if mode == "0" or (not train and mode != "always"):
        return 1
    target = int(os.environ.get("FRT_SLAB_TARGET", "8"))
    s = 1
    while n * s < target:
        s *= 2
    if s > 1 and (h % s == 0) and ((h // s) % 2 == 0):
        return s
    return 1


def _slab_stage(x, convs, s):
    """Apply a stack of 3x3/s1 SAME convs+ReLU as S row-slabs per image.

    ``convs`` are flax modules constructed with VALID height padding.
    Exact vs the plain stack (up to bf16 accumulation order): interior
    slab halos carry true computed activations; out-of-image halo rows
    are re-zeroed between convs to reproduce SAME zero-padding.
    """
    k = len(convs)
    n, h, w, c = x.shape
    slab = h // s
    xp = jnp.pad(x, ((0, 0), (k, k), (0, 0), (0, 0)))
    y = jnp.stack(
        [xp[:, i * slab : i * slab + slab + 2 * k] for i in range(s)], 1
    ).reshape(n * s, slab + 2 * k, w, c)
    for t, conv in enumerate(convs, start=1):
        y = nn.relu(conv(y))
        if t < k:
            halo = k - t
            g = (
                jnp.arange(s)[:, None] * slab
                + jnp.arange(slab + 2 * halo)[None, :]
                - halo
            )
            mask = ((g >= 0) & (g < h)).astype(y.dtype)
            y = y * jnp.tile(mask, (n, 1))[:, :, None, None]
    return y.reshape(n, h, w, y.shape[-1])


class VGG16Features(nn.Module):
    """VGG16 conv1_1..conv5_3 with ReLU, pools between stages only.

    Input ``[n, h, w, 3]`` (ImageNet-normalised), output
    ``[n, h/16, w/16, 512]``.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        n = x.shape[0]
        conv_idx = 0
        # Stages 0 and 1 (64/128 ch) are batch-bound below effective
        # batch 8; wider stages already run near the conv roofline.
        for stage, (ch, layers) in enumerate(VGG16_STAGES):
            s = _slab_factor(n, x.shape[1], train) if stage <= 1 else 1
            pad = ((0, 0), (1, 1)) if s > 1 else 1
            convs = []
            for _ in range(layers):
                convs.append(
                    nn.Conv(
                        ch,
                        (3, 3),
                        padding=pad,
                        dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"conv{conv_idx}",
                    )
                )
                conv_idx += 1
            if s > 1:
                x = _slab_stage(x, convs, s)
            else:
                for conv in convs:
                    x = nn.relu(conv(x))
            if stage < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


# torchvision vgg16().features indices of the 13 convs, in order — used by
# the checkpoint importer to map ``features.{i}.weight`` -> ``conv{k}``.
TORCH_VGG16_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
