"""Pallas kernels vs their lax twins (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.boxes import jaccard_iou, box_iou
from faster_rcnn_pytorch_tpu.ops.pallas.iou_kernel import pairwise_iou_pallas
from faster_rcnn_pytorch_tpu.ops.pallas.roi_pool_kernel import roi_pool_pallas
from faster_rcnn_pytorch_tpu.ops.roi_pool import roi_pool
from tests.conftest import boxes_fixture
from tests.test_roi_ops import rand_rois


def test_iou_kernel_matches_jaccard():
    rs = np.random.RandomState(0)
    a = jnp.asarray(boxes_fixture(rs, 300))
    b = jnp.asarray(boxes_fixture(rs, 70))
    got = np.asarray(pairwise_iou_pallas(a, b, block_n=64, block_m=128, interpret=True))
    want = np.asarray(jaccard_iou(a, b))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_iou_kernel_eps0_matches_box_iou():
    rs = np.random.RandomState(1)
    a = jnp.asarray(boxes_fixture(rs, 100))
    b = jnp.asarray(boxes_fixture(rs, 100))
    got = np.asarray(
        pairwise_iou_pallas(a, b, eps=0.0, block_n=64, block_m=128, interpret=True)
    )
    want = np.asarray(box_iou(a, b)[0])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_kernel_matches_lax():
    rs = np.random.RandomState(2)
    feat = jnp.asarray(rs.normal(size=(25, 19, 128)).astype(np.float32))
    rois = jnp.asarray(rand_rois(rs, 9, 25, 19))
    got = np.asarray(roi_pool_pallas(feat, rois, 1.0, 7, True))
    want = np.asarray(roi_pool(feat, rois, 1.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_kernel_gradients_match_lax():
    import jax

    rs = np.random.RandomState(5)
    feat = jnp.asarray(rs.normal(size=(17, 13, 128)).astype(np.float32))
    rois = jnp.asarray(rand_rois(rs, 5, 17, 13))
    g_out = jnp.asarray(rs.normal(size=(5, 7, 7, 128)).astype(np.float32))

    def loss_pallas(f):
        return (roi_pool_pallas(f, rois, 1.0, 7, True) * g_out).sum()

    def loss_lax(f):
        return (roi_pool(f, rois, 1.0) * g_out).sum()

    gp = np.asarray(jax.grad(loss_pallas)(feat))
    gl = np.asarray(jax.grad(loss_lax)(feat))
    np.testing.assert_allclose(gp, gl, atol=1e-4)


def test_roi_pool_kernel_degenerate_rois():
    rs = np.random.RandomState(3)
    feat = jnp.asarray(rs.normal(size=(16, 16, 128)).astype(np.float32))
    rois = jnp.asarray(
        np.array([[0, 0, 0.3, 0.3], [15.7, 15.7, 16, 16], [0, 0, 16, 16]], np.float32)
    )
    got = np.asarray(roi_pool_pallas(feat, rois, 1.0, 7, True))
    want = np.asarray(roi_pool(feat, rois, 1.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_batch_kernel_matches_per_image():
    """Whole-batch launch (grid b*n, i//n feature indexing) must match
    the per-image kernel exactly, fwd and grad — guards the batched
    dispatch in ops/roi_pool._roi_pool_batch_primal."""
    import jax

    from faster_rcnn_pytorch_tpu.ops.pallas.roi_pool_kernel import (
        roi_pool_pallas_batch,
    )

    rs = np.random.RandomState(7)
    b, n = 3, 6
    feat = jnp.asarray(rs.normal(size=(b, 21, 15, 128)).astype(np.float32))
    rois = jnp.stack(
        [jnp.asarray(rand_rois(rs, n, 21, 15)) for _ in range(b)]
    )

    got = np.asarray(roi_pool_pallas_batch(feat, rois, 1.0, 7, True))
    want = np.stack(
        [
            np.asarray(roi_pool_pallas(feat[i], rois[i], 1.0, 7, True))
            for i in range(b)
        ]
    )
    np.testing.assert_array_equal(got, want)

    g_out = jnp.asarray(
        rs.normal(size=(b, n, 7, 7, 128)).astype(np.float32)
    )

    def loss_batch(f):
        return (roi_pool_pallas_batch(f, rois, 1.0, 7, True) * g_out).sum()

    def loss_per_image(f):
        out = jnp.stack(
            [
                roi_pool_pallas(f[i], rois[i], 1.0, 7, True)
                for i in range(b)
            ]
        )
        return (out * g_out).sum()

    gb = np.asarray(jax.grad(loss_batch)(feat))
    gi = np.asarray(jax.grad(loss_per_image)(feat))
    np.testing.assert_allclose(gb, gi, atol=1e-5)
