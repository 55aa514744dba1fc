"""Golden-value + numpy-oracle tests for the box geometry library."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops import boxes as B
from tests.conftest import boxes_fixture


def np_iou(a, b, eps=0.0):
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(hi - lo, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter + eps
    return inter / union


def test_xy_cxcy_roundtrip(rng):
    b = boxes_fixture(rng, 50)
    out = np.asarray(B.cxcy_to_xy(B.xy_to_cxcy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_cxcy_golden():
    xy = jnp.array([[0.0, 0.0, 2.0, 4.0]])
    cxcy = np.asarray(B.xy_to_cxcy(xy))
    np.testing.assert_allclose(cxcy, [[1.0, 2.0, 2.0, 4.0]])


def test_encode_decode_inverse(rng):
    gt = B.xy_to_cxcy(jnp.asarray(boxes_fixture(rng, 40)))
    anc = B.xy_to_cxcy(jnp.asarray(boxes_fixture(rng, 40)))
    deltas = B.encode(gt, anc)
    back = B.decode(deltas, anc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-4)


def test_encode_golden():
    # gt == anchor -> zero deltas; doubled size -> log(2) wh deltas.
    anc = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    np.testing.assert_allclose(np.asarray(B.encode(anc, anc)), [[0, 0, 0, 0]], atol=1e-7)
    gt = jnp.array([[0.5, 0.5, 0.4, 0.8]])
    d = np.asarray(B.encode(gt, anc))
    np.testing.assert_allclose(d, [[0, 0, np.log(2), np.log(2)]], atol=1e-6)


def test_jaccard_iou_vs_numpy(rng):
    a = boxes_fixture(rng, 30)
    b = boxes_fixture(rng, 20)
    got = np.asarray(B.jaccard_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b, eps=1e-5), atol=1e-6)


def test_box_iou_vs_numpy(rng):
    a = boxes_fixture(rng, 16)
    b = boxes_fixture(rng, 8)
    iou, union = B.box_iou(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(iou), np_iou(a, b), atol=1e-6)


def test_iou_golden():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.5, 0.0, 1.5, 1.0], [2.0, 2.0, 3.0, 3.0]])
    iou, _ = B.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0 / 3.0, 0.0]], atol=1e-6)


def test_masked_iou_excludes_padding(rng):
    boxes = jnp.asarray(boxes_fixture(rng, 10))
    gt = jnp.asarray(boxes_fixture(rng, 4))
    mask = jnp.array([True, True, False, False])
    iou = np.asarray(B.masked_iou(boxes, gt, mask))
    assert (iou[:, 2:] == -1.0).all()
    assert (iou[:, :2] >= 0.0).all()


def test_masked_iou_gt_major_matches_transpose(rng):
    """The gt-major (layout-optimised) IoU must equal masked_iou.T
    bit-for-bit — identical per-element arithmetic, different broadcast
    orientation."""
    boxes = jnp.asarray(boxes_fixture(rng, 33))
    gt = jnp.asarray(boxes_fixture(rng, 5))
    mask = jnp.array([True, True, True, False, False])
    ref = np.asarray(B.masked_iou(boxes, gt, mask)).T
    got = np.asarray(B.masked_iou_gt_major(gt, mask, boxes))
    assert got.shape == (5, 33)
    np.testing.assert_array_equal(got, ref)


def test_batched_leading_dims(rng):
    a = jnp.asarray(boxes_fixture(rng, 12)).reshape(3, 4, 4)
    out = B.xy_to_cxcy(a)
    assert out.shape == (3, 4, 4)


def test_masks_to_boxes():
    m = np.zeros((2, 8, 8), dtype=np.float32)
    m[0, 2:5, 1:4] = 1
    got = np.asarray(B.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(got[0], [1, 2, 3, 4])
    np.testing.assert_allclose(got[1], [0, 0, 0, 0])


def test_clip_boxes():
    b = jnp.array([[-0.1, 0.2, 1.4, 0.9]])
    np.testing.assert_allclose(np.asarray(B.clip_boxes(b)), [[0.0, 0.2, 1.0, 0.9]])
