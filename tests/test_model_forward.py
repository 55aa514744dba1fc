"""End-to-end shape/finiteness smoke tests for both model generations —
the counterpart of the reference's __main__ smoke blocks
(models/model.py:410-427, models/new_model.py:490-518), but automated."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    LEGACY_CONFIG,
    FPN_CONFIG,
    build_model,
    forward_train,
    predict,
)

# Small static canvas keeps CPU compiles quick.
CANVAS = 160
SMALL_LEGACY = dataclasses.replace(
    LEGACY_CONFIG,
    num_classes=6,
    pre_nms_train=256,
    post_nms_train=64,
    pre_nms_test=128,
    post_nms_test=32,
    roi_samples=16,
    roi_pos_quota=4,
    max_detections=10,
)
SMALL_FPN = dataclasses.replace(
    FPN_CONFIG,
    num_classes=7,
    pre_nms_train=256,
    post_nms_train=64,
    pre_nms_test=128,
    post_nms_test=32,
    roi_samples=16,
    roi_pos_quota=4,
    max_detections=10,
)


def make_batch(rs, b=2, g=5):
    images = rs.normal(size=(b, CANVAS, CANVAS, 3)).astype(np.float32)
    extents = np.tile(
        np.array([[1.0, 1.0], [0.8, 0.9]], dtype=np.float32), (-(-b // 2), 1)
    )[:b]
    xy1 = rs.uniform(0, 0.5, size=(b, g, 2))
    wh = rs.uniform(0.1, 0.4, size=(b, g, 2))
    boxes = np.concatenate([xy1, np.minimum(xy1 + wh, 0.99)], -1).astype(
        np.float32
    )
    labels = rs.randint(0, 5, size=(b, g)).astype(np.int32)
    mask = np.ones((b, g), bool)
    mask[:, -1] = False
    return tuple(jnp.asarray(x) for x in (images, extents, boxes, labels, mask))


@pytest.fixture(scope="module")
def legacy():
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.normal(size=(1, CANVAS, CANVAS, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = model.init(jax.random.key(0), images, rois, method="init_all")
    return model, params


@pytest.fixture(scope="module")
def fpn():
    model, _ = build_model("fpn", num_classes=7, dtype=jnp.float32)
    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.normal(size=(1, CANVAS, CANVAS, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = model.init(jax.random.key(0), images, rois, method="init_all")
    return model, params


def test_legacy_train_forward(legacy):
    model, params = legacy
    rs = np.random.RandomState(2)
    batch = make_batch(rs)
    out = model.apply(
        params,
        SMALL_LEGACY,
        *batch,
        jax.random.key(3),
        method=forward_train,
    )
    for name, v in out.losses._asdict().items():
        assert np.isfinite(np.asarray(v)), name
    assert np.asarray(out.losses.total) > 0
    assert np.asarray(out.num_pos_roi) > 0  # gt appended => positives exist


@pytest.mark.slow
def test_legacy_train_grads_flow(legacy):
    model, params = legacy
    rs = np.random.RandomState(3)
    batch = make_batch(rs, b=1)

    def loss_fn(p):
        out = model.apply(
            p, SMALL_LEGACY, *batch, jax.random.key(0), method=forward_train
        )
        return out.losses.total

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: np.abs(np.asarray(g)).sum(), grads))
    assert np.isfinite(flat).all()
    assert sum(flat) > 0


def test_legacy_predict(legacy):
    model, params = legacy
    rs = np.random.RandomState(4)
    images, extents, *_ = make_batch(rs)
    det = model.apply(params, SMALL_LEGACY, images, extents, method=predict)
    b = images.shape[0]
    assert det.boxes.shape == (b, 10, 4)
    assert det.labels.shape == (b, 10)
    assert np.isfinite(np.asarray(det.boxes)).all()
    valid = np.asarray(det.valid)
    labels = np.asarray(det.labels)
    assert ((labels >= 0) | ~valid).all()
    assert (labels[~valid] == -1).all()


def test_fpn_train_forward(fpn):
    model, params = fpn
    rs = np.random.RandomState(5)
    batch = make_batch(rs)
    out = model.apply(
        params, SMALL_FPN, *batch, jax.random.key(1), method=forward_train
    )
    for name, v in out.losses._asdict().items():
        assert np.isfinite(np.asarray(v)), name


def test_fpn_predict(fpn):
    model, params = fpn
    rs = np.random.RandomState(6)
    images, extents, *_ = make_batch(rs)
    det = model.apply(params, SMALL_FPN, images, extents, method=predict)
    assert det.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_predict_score_threshold_is_respected(legacy):
    """A raised threshold must reduce (or zero) the surviving detections —
    guards the eval/demo plumbing (reference: opts.thres used as-is)."""
    model, params = legacy
    rs = np.random.RandomState(7)
    images, extents, *_ = make_batch(rs, b=1)
    det_lo = model.apply(
        params, SMALL_LEGACY, images, extents, 0.0, method=predict
    )
    det_hi = model.apply(
        params, SMALL_LEGACY, images, extents, 0.999999, method=predict
    )
    n_lo = int(np.asarray(det_lo.valid).sum())
    n_hi = int(np.asarray(det_hi.valid).sum())
    assert n_hi < n_lo
    assert n_lo > 0



def test_label_offset_for():
    """FPN consumes raw COCO ids (offset 0) ONLY with coco data; every
    0-based labelling (VOC, coco-contiguous legacy) shifts by +1 — the
    regression here mislabelled every FPN+VOC detection by one class."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        label_offset_for,
    )

    assert label_offset_for("fpn", "coco") == 0
    assert label_offset_for("fpn", "voc") == 1
    assert label_offset_for("legacy", "coco") == 1
    assert label_offset_for("legacy", "voc") == 1
    _, cfg = build_model("fpn", 21, label_offset=label_offset_for("fpn", "voc"))
    assert cfg.label_offset == 1
    _, cfg = build_model("fpn", 91)
    assert cfg.label_offset == 0
