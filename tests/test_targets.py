"""Target assignment semantics vs numpy oracles of the reference logic
(models/model.py:123-266). Random subsampling is disabled (quotas set
above pool sizes) so assignments are deterministic and comparable."""

import numpy as np
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.models.targets import (
    REG_STD,
    frcnn_targets,
    rpn_targets,
)
from tests.conftest import boxes_fixture
from tests.test_boxes import np_iou


def np_encode(gt, anc):
    gt_c = np.stack(
        [(gt[:, 0] + gt[:, 2]) / 2, (gt[:, 1] + gt[:, 3]) / 2,
         gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1]], 1)
    an_c = np.stack(
        [(anc[:, 0] + anc[:, 2]) / 2, (anc[:, 1] + anc[:, 3]) / 2,
         anc[:, 2] - anc[:, 0], anc[:, 3] - anc[:, 1]], 1)
    txy = (gt_c[:, :2] - an_c[:, :2]) / an_c[:, 2:]
    twh = np.log(gt_c[:, 2:] / an_c[:, 2:])
    return np.concatenate([txy, twh], 1)


def np_rpn_labels(anchors, gt, pos_iou=0.7, neg_iou=0.3):
    """Reference RPNTargetMaker label logic (no subsampling)."""
    inside = (
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= 1) & (anchors[:, 3] <= 1)
    )
    iou = np_iou(anchors, gt, eps=1e-5)
    iou[~inside] = -1
    label = -np.ones(len(anchors), np.int32)
    iou_max = iou.max(1)
    label[inside & (iou_max < neg_iou) & (iou_max >= 0)] = 0
    per_gt_arg = iou.argmax(0)
    label[per_gt_arg] = 1
    label[inside & (iou_max >= pos_iou)] = 1
    return label, iou.argmax(1)


def test_rpn_labels_match_oracle():
    rs = np.random.RandomState(0)
    anchors = boxes_fixture(rs, 400)
    anchors[:40] -= 0.5  # some boundary-crossing anchors
    gt = boxes_fixture(rs, 5)
    want, want_arg = np_rpn_labels(anchors, gt)

    out = rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.ones(5, bool),
        jnp.ones(2),
        jax.random.key(0),
        pos_quota=400,  # disable subsampling
        total_quota=4000,
    )
    got = np.asarray(out.labels)
    np.testing.assert_array_equal(got, want)
    # reg targets on positives match encode(gt[argmax], anchor)
    pos = want == 1
    expect = np_encode(gt[want_arg[pos]], anchors[pos])
    np.testing.assert_allclose(
        np.asarray(out.reg_targets)[pos], expect, atol=1e-5
    )


def test_rpn_subsampling_quotas():
    rs = np.random.RandomState(1)
    gt = np.array([[0.3, 0.3, 0.7, 0.7]], np.float32)
    # many anchors exactly on the gt -> many positives
    anchors = np.tile(gt, (300, 1)) + rs.normal(0, 0.002, (300, 4)).astype(np.float32)
    anchors = np.clip(anchors, 0, 1)
    far = boxes_fixture(rs, 700) * 0.2  # low-iou negatives
    all_anchors = np.concatenate([anchors, far])
    out = rpn_targets(
        jnp.asarray(all_anchors),
        jnp.asarray(gt),
        jnp.ones(1, bool),
        jnp.ones(2),
        jax.random.key(0),
        pos_quota=128,
        total_quota=256,
    )
    labels = np.asarray(out.labels)
    assert (labels == 1).sum() == 128
    assert (labels == 0).sum() == 128


def test_frcnn_targets_semantics():
    rs = np.random.RandomState(2)
    gt = boxes_fixture(rs, 3)
    gt_labels = np.array([4, 7, 11], np.int32)
    rois = boxes_fixture(rs, 60)
    out = frcnn_targets(
        jnp.asarray(rois),
        jnp.ones(60, bool),
        jnp.asarray(gt),
        jnp.asarray(gt_labels),
        jnp.ones(3, bool),
        jax.random.key(1),
        num_samples=32,
        pos_quota=8,
        label_offset=1,
    )
    assert np.asarray(out.valid).all()
    cand = np.concatenate([rois, gt])
    iou = np_iou(cand, gt, eps=1e-5)
    sample_rois = np.asarray(out.rois)
    labels = np.asarray(out.labels)
    is_pos = np.asarray(out.is_pos)
    # gt slots guarantee positives exist (gt appended, models/model.py:135)
    assert is_pos.sum() >= 3 or is_pos.sum() == 8
    for i in range(32):
        # locate the sampled roi among candidates
        j = np.argmin(np.abs(cand - sample_rois[i]).sum(1))
        m = iou[j].max()
        if is_pos[i]:
            assert m >= 0.5
            # label = gt label + 1 of argmax gt
            assert labels[i] == gt_labels[iou[j].argmax()] + 1
            # reg target normalised by std
            expect = np_encode(
                gt[iou[j].argmax()][None], sample_rois[i][None]
            )[0] / np.asarray(REG_STD)
            np.testing.assert_allclose(
                np.asarray(out.reg_targets)[i], expect, atol=1e-4
            )
        else:
            assert m < 0.5
            assert labels[i] == 0


def test_frcnn_targets_exclude_invalid_rois():
    rs = np.random.RandomState(3)
    gt = boxes_fixture(rs, 2)
    rois = boxes_fixture(rs, 20)
    valid = np.zeros(20, bool)
    valid[:5] = True
    out = frcnn_targets(
        jnp.asarray(rois),
        jnp.asarray(valid),
        jnp.asarray(gt),
        jnp.asarray(np.array([1, 2], np.int32)),
        jnp.ones(2, bool),
        jax.random.key(0),
        num_samples=16,
        pos_quota=4,
    )
    # all sampled rois come from {valid rois} U {gt}
    pool = np.concatenate([rois[valid], gt])
    for r in np.asarray(out.rois)[np.asarray(out.valid)]:
        assert np.abs(pool - r).sum(1).min() < 1e-6


def test_boundary_filter_off_labels_outside_anchors():
    """FPN variant (models/new_model.py:303-307): no inside-image filter —
    anchors extending past the canvas still get 0/1 labels."""
    rs = np.random.RandomState(7)
    anchors = boxes_fixture(rs, 200)
    anchors[:50] -= 0.5  # boundary-crossing
    gt = np.array([[-0.3, -0.3, 0.1, 0.1]], np.float32)  # matches an outside anchor
    anchors[0] = [-0.29, -0.31, 0.11, 0.09]
    out = rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.ones(1, bool),
        jnp.ones(2),
        jax.random.key(0),
        pos_quota=400,
        total_quota=4000,
        allow_ties=True,
        boundary_filter=False,
    )
    labels = np.asarray(out.labels)
    assert labels[0] == 1  # per-gt best anchor, despite being outside
    # outside anchors far from gt become negatives, not ignore
    assert (labels[1:50] == 0).any()


def test_padded_gt_argmax_does_not_clobber_anchor0():
    """A padded gt's argmax over an all(-1) IoU column is 0; the scatter
    must not overwrite anchor 0's guaranteed-positive status when a real
    gt's best anchor is also anchor 0."""
    gt = np.array(
        [[0.1, 0.1, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]], np.float32
    )
    mask = np.array([True, False])
    # anchor 0 is the (only moderately overlapping) best match for gt 0
    anchors = np.array(
        [[0.1, 0.1, 0.25, 0.25], [0.6, 0.6, 0.9, 0.9]], np.float32
    )
    out = rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.asarray(mask),
        jnp.ones(2),
        jax.random.key(0),
        pos_quota=10,
        total_quota=100,
    )
    assert np.asarray(out.labels)[0] == 1
