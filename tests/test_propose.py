"""Proposal selection vs a numpy oracle of RegionProposal.forward
(models/model.py:17-58): softmax fg -> decode -> clamp -> min-size ->
sort -> top-k -> greedy NMS -> post-k, with the stop-gradient cut."""

import numpy as np
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.models.rpn import propose
from tests.conftest import boxes_fixture
from tests.test_nms import np_greedy_nms


def np_propose(cls, reg, anchors, pre_k, post_k, nms_iou, min_size=1e-3):
    fg = np.exp(cls - cls.max(-1, keepdims=True))
    fg = (fg / fg.sum(-1, keepdims=True))[:, 1]
    a_c = np.stack(
        [(anchors[:, 0] + anchors[:, 2]) / 2, (anchors[:, 1] + anchors[:, 3]) / 2,
         anchors[:, 2] - anchors[:, 0], anchors[:, 3] - anchors[:, 1]], 1)
    cxy = reg[:, :2] * a_c[:, 2:] + a_c[:, :2]
    wh = np.exp(reg[:, 2:]) * a_c[:, 2:]
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).clip(0, 1)
    keep = ((boxes[:, 2] - boxes[:, 0]) >= min_size) & (
        (boxes[:, 3] - boxes[:, 1]) >= min_size
    )
    boxes, fg = boxes[keep], fg[keep]
    order = np.argsort(-fg, kind="stable")[:pre_k]
    boxes, fg = boxes[order], fg[order]
    sel = np_greedy_nms(boxes, fg, nms_iou)[:post_k]
    return boxes[sel]


def test_propose_matches_oracle():
    rs = np.random.RandomState(0)
    a = 500
    anchors = boxes_fixture(rs, a)
    cls = rs.normal(size=(a, 2)).astype(np.float32)
    reg = (rs.normal(size=(a, 4)) * 0.1).astype(np.float32)
    want = np_propose(cls, reg, anchors, pre_k=256, post_k=64, nms_iou=0.7)

    out = propose(
        jnp.asarray(cls),
        jnp.asarray(reg),
        jnp.asarray(anchors),
        jnp.ones(2, jnp.float32),
        pre_k=256,
        post_k=64,
        nms_iou=0.7,
        nms_tile=128,
    )
    got = np.asarray(out.rois)[np.asarray(out.valid)]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_propose_extent_clamps():
    rs = np.random.RandomState(1)
    a = 100
    anchors = boxes_fixture(rs, a)
    cls = rs.normal(size=(a, 2)).astype(np.float32)
    reg = np.zeros((a, 4), np.float32)
    extent = jnp.asarray([0.5, 0.6], jnp.float32)
    out = propose(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors), extent,
        pre_k=64, post_k=32, nms_iou=0.7, nms_tile=128,
    )
    rois = np.asarray(out.rois)[np.asarray(out.valid)]
    assert (rois[:, 2] <= 0.5 + 1e-6).all()
    assert (rois[:, 3] <= 0.6 + 1e-6).all()


def test_propose_no_gradients_leak():
    rs = np.random.RandomState(2)
    a = 64
    anchors = jnp.asarray(boxes_fixture(rs, a))

    def f(cls, reg):
        out = propose(
            cls, reg, anchors, jnp.ones(2), pre_k=32, post_k=8,
            nms_iou=0.7, nms_tile=128,
        )
        return out.rois.sum()

    g_cls, g_reg = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(rs.normal(size=(a, 2)).astype(np.float32)),
        jnp.asarray((rs.normal(size=(a, 4)) * 0.1).astype(np.float32)),
    )
    assert float(jnp.abs(g_cls).sum()) == 0.0  # stop_gradient cut
    assert float(jnp.abs(g_reg).sum()) == 0.0
