"""Parameter-tree utilities for the inference paths.

``cast_inference_params`` hoists the per-step fp32->bf16 weight cast out
of the jitted predict program. Flax modules built with ``dtype=bfloat16``
cast their fp32 kernels/biases to bf16 on EVERY apply (``promote_dtype``
inside ``nn.Dense``/``nn.Conv``) — for the legacy VGG16 detector that is
~550 MB of fp32 reads plus ~275 MB of bf16 writes of pure HBM traffic
per predict step (fc6 alone is 102.8M params). Casting the tree once up
front is numerically IDENTICAL for those modules (the in-apply cast
becomes a no-op on an already-bf16 leaf — same single round-to-nearest),
so eval/demo/serving throughput improves with bit-equal outputs
(pinned by tests/test_param_cast.py).

The one exception is ``FrozenBatchNorm`` (models/resnet.py): it computes
``rsqrt(var + eps) * scale`` in the *param* dtype before casting the
folded affine to the activation dtype, so pre-casting its leaves WOULD
change numerics. BN subtrees are identified structurally (a dict holding
both ``mean`` and ``var``) and left untouched.

Training never pre-casts: the optimizer state and update math stay fp32
(the train step casts activations per-layer exactly like the reference's
AMP-less fp32 training, models/model.py — there is no torch counterpart
of this inference-only optimisation to cite; it exists because on TPU
the cast is visible HBM bandwidth).
"""

from __future__ import annotations

import jax.numpy as jnp


def cast_inference_params(tree, dtype=jnp.bfloat16):
    """Cast fp32 weight leaves to ``dtype`` for inference.

    Skips FrozenBatchNorm parameter groups (dicts containing both
    ``mean`` and ``var``) whose affine fold is computed in param
    precision. Returns a new tree; float32 leaves elsewhere become
    ``dtype``, everything else is passed through unchanged.
    """
    if dtype == jnp.float32:
        return tree

    from collections.abc import Mapping

    _BN_KEYS = frozenset(("scale", "bias", "mean", "var"))

    def _is_frozen_bn(node):
        # Exactly the FrozenBatchNorm leaf group (models/resnet.py:45-48),
        # all four entries array leaves — a module that merely *contains*
        # children named mean/var still gets recursed into.
        return frozenset(node) == _BN_KEYS and not any(
            isinstance(v, Mapping) for v in node.values()
        )

    def rec(node):
        if isinstance(node, Mapping):  # dict or flax FrozenDict alike
            if _is_frozen_bn(node):
                return dict(node)
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "dtype") and node.dtype == jnp.float32:
            return node.astype(dtype)
        return node

    return rec(tree)


def model_compute_dtype(model):
    """The activation dtype a detector module was built with."""
    return getattr(model, "dtype", jnp.float32)
