"""cast_inference_params: the hoisted bf16 weight cast is bit-exact.

Flax modules built with ``dtype=bfloat16`` cast fp32 kernels/biases to
bf16 inside every apply; pre-casting the tree once must therefore leave
every prediction bit-identical (utils/params.py). FrozenBatchNorm folds
its affine in param precision, so its leaves must NOT be cast.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    FPN_CONFIG,
    LEGACY_CONFIG,
    build_model,
    init_detector_params,
    predict,
)
from faster_rcnn_pytorch_tpu.utils.params import (
    cast_inference_params,
    model_compute_dtype,
)

CANVAS = 64

TINY_LEGACY = dataclasses.replace(
    LEGACY_CONFIG,
    num_classes=6,
    pre_nms_train=64,
    post_nms_train=16,
    pre_nms_test=32,
    post_nms_test=8,
    roi_samples=8,
    roi_pos_quota=2,
    max_detections=8,
)

TINY_FPN = dataclasses.replace(
    FPN_CONFIG,
    num_classes=7,
    pre_nms_train=64,
    post_nms_train=16,
    pre_nms_test=32,
    post_nms_test=8,
    roi_samples=8,
    roi_pos_quota=2,
    max_detections=8,
)


def _predict_dets(model, cfg, params, images, extents):
    det = jax.jit(
        lambda p, im, ex: model.apply(p, cfg, im, ex, method=predict)
    )(params, images, extents)
    return jax.tree_util.tree_map(np.asarray, det)


def _assert_dets_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def test_legacy_precast_bitexact():
    """bf16 legacy predict: pre-cast params == fp32 params, bitwise."""
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.bfloat16)
    params = init_detector_params(model, jax.random.key(0), canvas=CANVAS)
    rs = np.random.RandomState(3)
    images = jnp.asarray(
        rs.normal(size=(2, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.asarray([[1.0, 1.0], [0.8, 0.9]], jnp.float32)

    want = _predict_dets(model, TINY_LEGACY, params, images, extents)
    cast = cast_inference_params(params, model_compute_dtype(model))
    got = _predict_dets(model, TINY_LEGACY, cast, images, extents)
    _assert_dets_equal(want, got)


def test_fpn_precast_bitexact_and_bn_skipped():
    """bf16 FPN predict: bit-equal with BN subtrees left in fp32."""
    model, _ = build_model("fpn", num_classes=7, dtype=jnp.bfloat16)
    params = init_detector_params(model, jax.random.key(1), canvas=CANVAS)
    rs = np.random.RandomState(5)
    images = jnp.asarray(
        rs.normal(size=(1, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.asarray([[0.9, 1.0]], jnp.float32)

    cast = cast_inference_params(params, model_compute_dtype(model))

    # Structural check: every FrozenBN group (mean+var siblings) stays
    # fp32; every other fp32 float leaf became bf16.
    n_bn = n_cast = 0

    def walk(node, in_bn):
        nonlocal n_bn, n_cast
        if isinstance(node, dict):
            bn = "mean" in node and "var" in node
            for v in node.values():
                walk(v, in_bn or bn)
            return
        if not hasattr(node, "dtype"):
            return
        if in_bn:
            assert node.dtype == jnp.float32
            n_bn += 1
        elif node.dtype == jnp.bfloat16:
            n_cast += 1

    walk(cast, False)
    assert n_bn > 0 and n_cast > 0

    want = _predict_dets(model, TINY_FPN, params, images, extents)
    got = _predict_dets(model, TINY_FPN, cast, images, extents)
    _assert_dets_equal(want, got)


def test_frozendict_tree_is_cast():
    """FrozenDict-rooted trees (older flax paths) must not silently
    no-op — Mapping nodes are recursed like plain dicts."""
    from flax.core import freeze

    tree = freeze(
        {
            "params": {
                "dense": {"kernel": jnp.ones((4, 4), jnp.float32)},
                "bn": {
                    "scale": jnp.ones((4,), jnp.float32),
                    "bias": jnp.zeros((4,), jnp.float32),
                    "mean": jnp.zeros((4,), jnp.float32),
                    "var": jnp.ones((4,), jnp.float32),
                },
            }
        }
    )
    cast = cast_inference_params(tree, jnp.bfloat16)
    assert cast["params"]["dense"]["kernel"].dtype == jnp.bfloat16
    for k in ("scale", "bias", "mean", "var"):
        assert cast["params"]["bn"][k].dtype == jnp.float32


def test_bn_skip_requires_exact_leaf_group():
    """A module that merely CONTAINS children named mean/var is not a
    FrozenBN group: its nested subtree must still be cast."""
    tree = {
        "odd_module": {
            "mean": {"kernel": jnp.ones((2, 2), jnp.float32)},
            "var": {"kernel": jnp.ones((2, 2), jnp.float32)},
            "head": {"kernel": jnp.ones((2, 2), jnp.float32)},
        }
    }
    cast = cast_inference_params(tree, jnp.bfloat16)
    assert cast["odd_module"]["mean"]["kernel"].dtype == jnp.bfloat16
    assert cast["odd_module"]["var"]["kernel"].dtype == jnp.bfloat16
    assert cast["odd_module"]["head"]["kernel"].dtype == jnp.bfloat16


def test_fp32_model_cast_is_noop():
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=CANVAS)
    cast = cast_inference_params(params, model_compute_dtype(model))
    for x, y in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(cast)
    ):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
