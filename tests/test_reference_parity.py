"""Parity tests that run the ACTUAL reference code as the oracle.

The reference at /root/reference is pure torch except for three
torchvision entry points (``nms``, ``RoIPool``, ``vgg16``). torch (CPU)
is installed; the torchvision names are stubbed (numpy greedy NMS with
torchvision semantics) so ``utils/util.py``, ``anchor.py``,
``losses/loss.py`` and ``models/model.py`` import and run directly.

These replace hand-derived re-readings of the reference semantics with
the reference itself for: anchors, encode/decode/IoU, RegionProposal,
RPNTargetMaker, FastRcnnTargetMaker, _suppress and the 4-part loss
(models/model.py:12-266,346-402; losses/loss.py:5-85; anchor.py:7-55),
plus both generations' FULL predict paths (the FPN generation runs over
the torchvision-semantics stand-ins in tests/torchvision_stubs.py; the
stub wiring lives in tests/reference_loader.py, shared with
tools/measure_torch_baseline.py).
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch

from reference_loader import (  # noqa: F401 (_tv_nms re-exported)
    REFERENCE,
    _tv_nms,
    reference_modules,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with torchvision stubbed out
    (machinery shared with tools/measure_torch_baseline.py in
    tests/reference_loader.py)."""
    with reference_modules() as mods:
        yield mods


def _boxes(rs, n, lo=0.0, hi=1.0):
    xy1 = rs.uniform(lo, hi * 0.6, size=(n, 2))
    wh = rs.uniform(0.05, 0.35, size=(n, 2)) * hi
    return np.concatenate([xy1, np.minimum(xy1 + wh, hi)], 1).astype(np.float32)


# ------------------------------------------------------------- anchors


def test_anchor_parity(ref):
    from faster_rcnn_pytorch_tpu.models.anchors import legacy_anchors

    for h, w in ((600, 800), (800, 1216), (480, 640)):
        want = ref.anchor.FRCNNAnchorMaker()._enumerate_shifted_anchor((h, w))
        got = legacy_anchors(h, w)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------- box ops


def test_box_ops_parity(ref):
    from faster_rcnn_pytorch_tpu.ops import boxes as ours

    rs = np.random.RandomState(0)
    a = _boxes(rs, 60)
    b = _boxes(rs, 17)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    np.testing.assert_allclose(
        np.asarray(ours.xy_to_cxcy(jnp.asarray(a))),
        ref.util.xy_to_cxcy(ta).numpy(),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(ours.cxcy_to_xy(jnp.asarray(a))),
        ref.util.cxcy_to_xy(ta).numpy(),
        atol=1e-7,
    )
    ca = ref.util.xy_to_cxcy(ta)
    cb = ref.util.xy_to_cxcy(torch.from_numpy(_boxes(rs, 60)))
    np.testing.assert_allclose(
        np.asarray(ours.encode(jnp.asarray(ca.numpy()), jnp.asarray(cb.numpy()))),
        ref.util.encode(ca, cb).numpy(),
        atol=1e-6,
    )
    t = rs.normal(0, 0.2, size=(60, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.decode(jnp.asarray(t), jnp.asarray(ca.numpy()))),
        ref.util.decode(torch.from_numpy(t), ca).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.jaccard_iou(jnp.asarray(a), jnp.asarray(b))),
        ref.util.find_jaccard_overlap(ta, tb).numpy(),
        atol=1e-6,
    )


# ------------------------------------------------------- RegionProposal


def test_region_proposal_parity(ref):
    """propose() vs the reference RegionProposal on identical inputs
    (models/model.py:12-58), train and test budgets."""
    from faster_rcnn_pytorch_tpu.models.anchors import legacy_anchors
    from faster_rcnn_pytorch_tpu.models.rpn import propose

    rs = np.random.RandomState(1)
    anchors = legacy_anchors(160, 160)  # 900 anchors
    a = anchors.shape[0]
    cls = rs.normal(size=(a, 2)).astype(np.float32)
    reg = rs.normal(0, 0.2, size=(a, 4)).astype(np.float32)

    rp = ref.model.RegionProposal()
    for mode, pre_k, post_k in (("train", 12000, 2000), ("test", 6000, 300)):
        with contextlib.redirect_stdout(io.StringIO()):
            want = rp(
                torch.from_numpy(cls), torch.from_numpy(reg),
                torch.from_numpy(anchors), mode,
            ).numpy()
        got = propose(
            jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
            jnp.ones(2, jnp.float32),
            pre_k=pre_k, post_k=post_k, nms_iou=0.7, min_size=1.0 / 1000.0,
            nms_tile=256,
        )
        got_rois = np.asarray(got.rois)[np.asarray(got.valid)]
        assert got_rois.shape == want.shape, (got_rois.shape, want.shape)
        # both are in greedy (descending score) order
        np.testing.assert_allclose(got_rois, want, atol=1e-5)


# ------------------------------------------------------- RPNTargetMaker


def test_rpn_target_maker_parity(ref):
    """rpn_targets vs the reference RPNTargetMaker (models/model.py:182-266)
    in the no-subsampling regime (pools below quotas on both sides)."""
    from faster_rcnn_pytorch_tpu.models.targets import rpn_targets

    rs = np.random.RandomState(2)
    anchors = _boxes(rs, 240)
    out_anchors = _boxes(rs, 60) - 0.5  # boundary-crossing -> filtered
    anchors = np.concatenate([anchors, out_anchors]).astype(np.float32)
    gt = _boxes(rs, 4)
    # sprinkle anchors right on top of gts so positives >= 0.7 exist
    anchors[:4] = gt + rs.normal(0, 0.01, (4, 4)).astype(np.float32)
    anchors = np.clip(anchors, -1, 1)

    with contextlib.redirect_stdout(io.StringIO()):
        want_cls, want_reg = ref.model.RPNTargetMaker()(
            torch.from_numpy(gt), torch.from_numpy(anchors)
        )
    want_cls = want_cls.numpy()
    want_reg = want_reg.numpy()
    assert (want_cls == 1).sum() <= 128 and (want_cls >= 0).sum() <= 256

    out = rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.ones(4, bool),
        jnp.ones(2, jnp.float32),
        jax.random.key(0),
        pos_quota=128,
        total_quota=256,
    )
    got_cls = np.asarray(out.labels)
    np.testing.assert_array_equal(got_cls, want_cls)
    pos = want_cls == 1
    np.testing.assert_allclose(
        np.asarray(out.reg_targets)[pos], want_reg[pos], atol=1e-5
    )


# -------------------------------------------------- FastRcnnTargetMaker


def test_fast_rcnn_target_maker_parity(ref):
    """Assignment semantics of FastRcnnTargetMaker (models/model.py:123-179):
    the reference's random subsample is validated triple-by-triple against
    our full per-candidate assignment (sampling sets differ by RNG)."""
    from faster_rcnn_pytorch_tpu.models.targets import REG_STD, frcnn_targets

    rs = np.random.RandomState(3)
    gt = _boxes(rs, 4)
    gt_labels = np.array([2, 7, 11, 19], np.int64)
    rois = _boxes(rs, 200)
    # plant some positives (IoU >= 0.5 with a gt)
    rois[:8] = gt[rs.randint(0, 4, 8)] + rs.normal(0, 0.01, (8, 4)).astype(
        np.float32
    )
    rois = np.clip(rois, 0, 1).astype(np.float32)

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        want_cls, want_reg, want_rois = ref.model.FastRcnnTargetMaker()(
            [torch.from_numpy(gt)],
            [torch.from_numpy(gt_labels)],
            torch.from_numpy(rois),
        )
    want_cls = want_cls.numpy()
    want_reg = want_reg.numpy()
    want_rois = want_rois.numpy()
    n_pos_ref = int((want_cls > 0).sum())
    assert 0 < n_pos_ref <= 32

    # our assignment over ALL candidates (quotas >= pool sizes)
    cand = np.concatenate([rois, gt])
    out = frcnn_targets(
        jnp.asarray(rois),
        jnp.ones(len(rois), bool),
        jnp.asarray(gt),
        jnp.asarray(gt_labels.astype(np.int32)),
        jnp.ones(4, bool),
        jax.random.key(0),
        num_samples=len(cand),
        pos_quota=len(cand),
        label_offset=1,
    )
    ours = {}
    got_rois = np.asarray(out.rois)
    got_labels = np.asarray(out.labels)
    got_reg = np.asarray(out.reg_targets)
    got_valid = np.asarray(out.valid)
    for i in range(len(cand)):
        if got_valid[i]:
            ours[tuple(np.round(got_rois[i], 6))] = (got_labels[i], got_reg[i])

    for j in range(len(want_rois)):
        key = tuple(np.round(want_rois[j], 6))
        assert key in ours, f"reference sampled a roi we never assigned: {j}"
        our_label, our_reg = ours[key]
        assert our_label == want_cls[j], (j, our_label, want_cls[j])
        if want_cls[j] > 0:  # reg only meaningful (and ours only set) on pos
            np.testing.assert_allclose(our_reg, want_reg[j], atol=1e-4)

    # reference reg normalisation uses the same std
    np.testing.assert_allclose(np.asarray(REG_STD), [0.1, 0.1, 0.2, 0.2])


# ------------------------------------------------------------ _suppress


def test_suppress_parity(ref):
    """multiclass_nms vs the reference per-class loop
    (models/model.py:382-402), uncapped output."""
    from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms

    rs = np.random.RandomState(4)
    n, num_classes = 80, 21
    cls_boxes = np.stack(
        [_boxes(rs, n) for _ in range(num_classes)], axis=1
    ).astype(np.float32)  # [n, C, 4]
    logits = rs.normal(size=(n, num_classes)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    dummy = types.SimpleNamespace(num_classes=num_classes)
    opts = types.SimpleNamespace(thres=0.05)
    want_bbox, want_label, want_score = ref.model.FRCNN._suppress(
        dummy,
        torch.from_numpy(cls_boxes.reshape(n, -1)),
        torch.from_numpy(probs),
        opts,
    )

    max_det = n * (num_classes - 1)
    got_boxes, got_labels, got_scores, got_valid = multiclass_nms(
        jnp.asarray(cls_boxes),
        jnp.asarray(probs),
        0.05,
        0.3,
        num_classes=num_classes,
        per_class_k=n,
        max_det=max_det,
        tile=128,
    )
    v = np.asarray(got_valid)
    got = sorted(
        zip(
            np.asarray(got_labels)[v].tolist(),
            np.asarray(got_scores)[v].tolist(),
            np.asarray(got_boxes)[v].tolist(),
        )
    )
    want = sorted(
        zip(
            want_label.astype(np.int64).tolist(),
            want_score.tolist(),
            want_bbox.tolist(),
        )
    )
    assert len(got) == len(want)
    for (gl, gs, gb), (wl, ws, wb) in zip(got, want):
        assert gl == wl
        np.testing.assert_allclose(gs, ws, atol=1e-6)
        np.testing.assert_allclose(gb, wb, atol=1e-6)


# ----------------------------------------------------------------- loss


def test_loss_parity(ref):
    """frcnn_loss vs the reference FRCNNLoss (losses/loss.py:64-85)."""
    from faster_rcnn_pytorch_tpu.models.losses import frcnn_loss

    rs = np.random.RandomState(5)
    a, s, c = 600, 128, 21
    pred_rpn_cls = rs.normal(size=(1, a, 2)).astype(np.float32)
    pred_rpn_reg = rs.normal(size=(1, a, 4)).astype(np.float32)
    pred_roi_cls = rs.normal(size=(1, s, c)).astype(np.float32)
    pred_roi_reg = rs.normal(size=(1, s, 4)).astype(np.float32)
    tg_rpn_cls = rs.choice([-1, 0, 1], size=(a,), p=[0.6, 0.3, 0.1]).astype(
        np.int64
    )
    tg_rpn_reg = rs.normal(size=(a, 4)).astype(np.float32)
    tg_roi_cls = rs.randint(0, c, size=(s,)).astype(np.int64)
    tg_roi_reg = rs.normal(size=(s, 4)).astype(np.float32)

    criterion = ref.loss.FRCNNLoss(opts=None)
    want = criterion(
        tuple(
            torch.from_numpy(x)
            for x in (pred_rpn_cls, pred_rpn_reg, pred_roi_cls, pred_roi_reg)
        ),
        tuple(
            torch.from_numpy(x)
            for x in (tg_rpn_cls, tg_rpn_reg, tg_roi_cls, tg_roi_reg)
        ),
    )
    want = [float(x) for x in want]  # total, rpn_cls, rpn_reg, roi_cls, roi_reg

    got = frcnn_loss(
        tuple(
            jnp.asarray(x[0])
            for x in (pred_rpn_cls, pred_rpn_reg, pred_roi_cls, pred_roi_reg)
        ),
        (
            jnp.asarray(tg_rpn_cls.astype(np.int32)),
            jnp.asarray(tg_rpn_reg),
            jnp.asarray(tg_roi_cls.astype(np.int32)),
            jnp.asarray(tg_roi_reg),
        ),
    )
    np.testing.assert_allclose(float(got.total), want[0], rtol=1e-5)
    np.testing.assert_allclose(float(got.rpn_cls), want[1], rtol=1e-5)
    np.testing.assert_allclose(float(got.rpn_reg), want[2], rtol=1e-5)
    np.testing.assert_allclose(float(got.roi_cls), want[3], rtol=1e-5)
    np.testing.assert_allclose(float(got.roi_reg), want[4], rtol=1e-5)


@pytest.mark.parametrize(
    "first,mult,gamma,warm",
    [(10, 1.0, 1.0, 3), (8, 2.0, 0.5, 2), (5, 1.5, 0.8, 0), (6, 1.0, 0.7, 1)],
)
def test_scheduler_restart_parity(first, mult, gamma, warm):
    """schedule(t) must equal the reference CosineAnnealingWarmupRestarts
    (scheduler.py:6-92) lr after t step() calls post-init, including
    cycle_mult cycle growth and gamma per-cycle peak decay."""
    from faster_rcnn_pytorch_tpu.parallel.train_step import make_lr_schedule

    sys.path.insert(0, REFERENCE)
    try:
        import scheduler as ref_sched
    finally:
        sys.path.remove(REFERENCE)

    max_lr, min_lr, total = 1e-2, 1e-4, 40
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=max_lr)
    ref = ref_sched.CosineAnnealingWarmupRestarts(
        opt,
        first_cycle_steps=first,
        cycle_mult=mult,
        max_lr=max_lr,
        min_lr=min_lr,
        warmup_steps=warm,
        gamma=gamma,
    )
    want = []
    for _ in range(total):
        want.append(opt.param_groups[0]["lr"])
        ref.step()

    sched = make_lr_schedule(
        "cosine_warmup_restarts",
        base_lr=max_lr,
        epochs=total,
        steps_per_epoch=1,
        eta_min=min_lr,
        warmup_epochs=warm,
        cycle_mult=mult,
        restart_gamma=gamma,
        first_cycle_epochs=first,
    )
    got = [float(sched(t)) for t in range(total)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


# ----------------------------------------------- FPN RPNTargetMaker


def test_fpn_rpn_target_maker_parity(ref):
    """rpn_targets(allow_ties=True, boundary_filter=False) vs the FPN
    RPNTargetMaker (models/new_model.py:299-349): no inside-image
    filter, ALL anchors tied at a gt's max IoU go positive, quotas
    128/256 — exercised in the no-subsampling regime."""
    from faster_rcnn_pytorch_tpu.models.targets import rpn_targets

    rs = np.random.RandomState(12)
    anchors = _boxes(rs, 170)
    out_anchors = _boxes(rs, 40) - 0.5  # FPN: NOT filtered, still labeled
    anchors = np.concatenate([anchors, out_anchors]).astype(np.float32)
    gt = _boxes(rs, 4)
    # exact-duplicate anchors on one gt: the tie path must mark BOTH
    anchors[:2] = gt[0]
    # near-misses for the others so >= 0.7 positives exist
    anchors[2:5] = gt[1:] + rs.normal(0, 0.005, (3, 4)).astype(np.float32)

    with contextlib.redirect_stdout(io.StringIO()):
        want_cls, want_reg = ref.new_model.RPNTargetMaker()(
            torch.from_numpy(gt), torch.from_numpy(anchors)
        )
    want_cls = want_cls.numpy()
    want_reg = want_reg.numpy()
    assert want_cls[0] == 1 and want_cls[1] == 1  # ties both positive
    # no-subsampling regime on both sides
    assert (want_cls == 1).sum() <= 128 and (want_cls >= 0).sum() <= 256

    out = rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.ones(4, bool),
        jnp.ones(2, jnp.float32),
        jax.random.key(0),
        pos_quota=128,
        total_quota=256,
        allow_ties=True,
        boundary_filter=False,
    )
    np.testing.assert_array_equal(np.asarray(out.labels), want_cls)
    pos = want_cls == 1
    np.testing.assert_allclose(
        np.asarray(out.reg_targets)[pos], want_reg[pos], atol=1e-5
    )


# ---------------------------------------------- FPN FRCNNTargetMaker


def test_fpn_frcnn_target_maker_parity(ref):
    """Assignment semantics of the FPN FRCNNTargetMaker
    (models/new_model.py:153-206): 512 samples / 128 pos quota, RAW
    labels (no background shift), same 0.1/0.2 reg std — the reference's
    random subsample validated triple-by-triple against our full
    per-candidate assignment."""
    from faster_rcnn_pytorch_tpu.models.targets import frcnn_targets

    rs = np.random.RandomState(13)
    gt = _boxes(rs, 4)
    gt_labels = np.array([5, 23, 47, 88], np.int64)  # raw COCO-style ids
    rois = _boxes(rs, 600)  # negatives must cover 512 - n_pos
    rois[:10] = gt[rs.randint(0, 4, 10)] + rs.normal(0, 0.01, (10, 4)).astype(
        np.float32
    )
    rois = np.clip(rois, 0, 1).astype(np.float32)

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        want_cls, want_reg, want_rois = ref.new_model.FRCNNTargetMaker()(
            torch.from_numpy(gt),
            torch.from_numpy(gt_labels),
            torch.from_numpy(rois),
        )
    want_cls = want_cls.numpy()
    want_reg = want_reg.numpy()
    want_rois = want_rois.numpy()
    assert len(want_rois) == 512
    n_pos_ref = int((want_cls > 0).sum())
    assert 0 < n_pos_ref <= 128

    cand = np.concatenate([rois, gt])
    out = frcnn_targets(
        jnp.asarray(rois),
        jnp.ones(len(rois), bool),
        jnp.asarray(gt),
        jnp.asarray(gt_labels.astype(np.int32)),
        jnp.ones(4, bool),
        jax.random.key(0),
        num_samples=len(cand),
        pos_quota=len(cand),
        label_offset=0,  # FPN: raw ids, no background shift
    )
    ours = {}
    got_rois = np.asarray(out.rois)
    got_labels = np.asarray(out.labels)
    got_reg = np.asarray(out.reg_targets)
    got_valid = np.asarray(out.valid)
    for i in range(len(cand)):
        if got_valid[i]:
            ours[tuple(np.round(got_rois[i], 6))] = (got_labels[i], got_reg[i])

    for j in range(len(want_rois)):
        key = tuple(np.round(want_rois[j], 6))
        assert key in ours, f"reference sampled a roi we never assigned: {j}"
        our_label, our_reg = ours[key]
        assert our_label == want_cls[j], (j, our_label, want_cls[j])
        if want_cls[j] > 0:
            np.testing.assert_allclose(our_reg, want_reg[j], atol=1e-4)


# -------------------------------------------- full-model predict parity


def _det_subset(d, thres, margin):
    keep = d["scores"] > thres + margin
    return {k: v[keep] for k, v in d.items()}


def _greedy_match(a, b, iou_min=0.9, score_atol=5e-3):
    """Score-descending greedy matching of two detection sets: same
    label, IoU>iou_min, close score."""
    used = np.zeros(len(b["scores"]), bool)
    matched = 0
    for i in np.argsort(-a["scores"], kind="stable"):
        cand = np.where(
            (b["labels"] == a["labels"][i])
            & ~used
            & (np.abs(b["scores"] - a["scores"][i]) < score_atol)
        )[0]
        if not len(cand):
            continue
        bx = a["boxes"][i]
        cb = b["boxes"][cand]
        x1 = np.maximum(bx[0], cb[:, 0])
        y1 = np.maximum(bx[1], cb[:, 1])
        x2 = np.minimum(bx[2], cb[:, 2])
        y2 = np.minimum(bx[3], cb[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_a = (bx[2] - bx[0]) * (bx[3] - bx[1])
        area_b = (cb[:, 2] - cb[:, 0]) * (cb[:, 3] - cb[:, 1])
        iou = inter / np.maximum(area_a + area_b - inter, 1e-12)
        ok = cand[iou > iou_min]
        if len(ok):
            used[ok[0]] = True
            matched += 1
    return matched


def _assert_detection_sets_match(theirs, ours, thres, min_ref_dets=20):
    """Set-based comparison tolerant to fp32 near-tie flips: away from
    the score threshold the sets must agree >=90% both ways, and the top
    of the ranking must agree exactly."""
    assert len(theirs["scores"]) >= min_ref_dets, len(theirs["scores"])

    a = _det_subset(theirs, thres, margin=0.01)
    b = _det_subset(ours, thres, margin=0.01)
    n_match = _greedy_match(a, b)
    assert n_match >= 0.9 * len(a["scores"]), (n_match, len(a["scores"]))
    assert n_match >= 0.9 * len(b["scores"]), (n_match, len(b["scores"]))

    top = min(10, len(a["scores"]), len(b["scores"]))
    oa = np.argsort(-a["scores"], kind="stable")[:top]
    ob = np.argsort(-b["scores"], kind="stable")[:top]
    np.testing.assert_array_equal(a["labels"][oa], b["labels"][ob])
    np.testing.assert_allclose(a["scores"][oa], b["scores"][ob], atol=2e-3)
    np.testing.assert_allclose(a["boxes"][oa], b["boxes"][ob], atol=2e-3)


@pytest.mark.slow
def test_full_model_predict_parity(ref):
    """END-TO-END oracle: the ACTUAL reference ``FRCNN.predict``
    (models/model.py:346-402; seeded random weights, exact-semantics
    RoIPool/NMS stubs) vs our ``predict`` after converting the
    reference's state dict through the torch importer. Proves the
    converter + backbone + RPN + propose + head + suppress COMPOSE into
    the same detector — module-level parity can't catch wiring mistakes
    (wrong coordinate space between stages, mis-threaded budgets).

    fp32 drift through 13 conv layers shifts scores by ~1e-4, which can
    flip near-tied NMS/threshold decisions; the comparison is therefore
    set-based with small tolerances rather than elementwise.
    """
    import dataclasses
    from types import SimpleNamespace

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        predict,
    )
    from faster_rcnn_pytorch_tpu.utils.checkpoint import (
        import_legacy_torch_params,
    )

    size = 320
    torch.manual_seed(5)
    with contextlib.redirect_stdout(io.StringIO()):
        m = ref.model.FRCNN(num_classes=21).eval()
    # Spread the head scores: the reference's sigma=0.01 cls_head on
    # O(1) activations yields near-uniform softmax (every score ~1/21 ~
    # the 0.05 threshold) and the comparison would ride on ties.
    ref.model.normal_init(m.fast_rcnn_head.cls_head, 0, 0.05)
    ref.model.normal_init(m.fast_rcnn_head.reg_head, 0, 0.02)

    rs = np.random.RandomState(7)
    img = rs.normal(size=(1, 3, size, size)).astype(np.float32)
    opts = SimpleNamespace(thres=0.05)
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        ref_boxes, ref_labels, ref_scores = m.predict(
            torch.from_numpy(img), opts
        )

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = import_legacy_torch_params(sd, num_classes=21)
    model, cfg = build_model("legacy", 21, dtype=jnp.float32)
    # Uncapped VOC-style budget (the reference _suppress has no cap).
    cfg = dataclasses.replace(
        cfg, max_detections=cfg.post_nms_test * (cfg.num_classes - 1)
    )

    images = jnp.asarray(img.transpose(0, 2, 3, 1))
    extents = jnp.ones((1, 2), jnp.float32)

    # 1) conv stack + converter: extractor features match tightly.
    feats = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, method="features"))(
            params, images
        )
    )
    want = (
        m.extractor(torch.from_numpy(img)).detach().numpy()
        .transpose(0, 2, 3, 1)
    )
    assert feats.shape == want.shape
    drift = np.abs(feats - want).max()
    assert drift < 1e-3 * max(1.0, np.abs(want).max()), drift

    # 2) full predict: set-match detections.
    det = jax.jit(
        lambda p, x, e: model.apply(
            p, cfg, x, e, opts.thres, method=predict
        )
    )(params, images, extents)
    our_valid = np.asarray(det.valid[0])
    ours = {
        "boxes": np.asarray(det.boxes[0])[our_valid],
        "labels": np.asarray(det.labels[0])[our_valid],
        "scores": np.asarray(det.scores[0])[our_valid],
    }
    theirs = {
        "boxes": np.asarray(ref_boxes, np.float64),
        "labels": np.asarray(ref_labels, np.int64),
        "scores": np.asarray(ref_scores, np.float64),
    }

    _assert_detection_sets_match(theirs, ours, opts.thres)


@pytest.mark.slow
def test_fpn_full_model_predict_parity(ref):
    """END-TO-END oracle for the FPN generation: the ACTUAL reference
    new_model.FRCNN.predict (models/new_model.py:420-470) over runnable
    torchvision-semantics stand-ins (tests/torchvision_stubs.py), vs our
    FPNFRCNN predict after converting the reference's state dict through
    import_fpn_torch_params. Exercises the composition the module
    oracles can't: per-level RPN concat order, anchor normalisation,
    2000/1000 proposal budgets, roi canvas rescale, MultiScaleRoIAlign
    level routing, _suppress."""
    import dataclasses
    from types import SimpleNamespace

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        predict,
    )
    from faster_rcnn_pytorch_tpu.utils.checkpoint import (
        import_fpn_torch_params,
    )

    size = 320
    torch.manual_seed(9)
    with contextlib.redirect_stdout(io.StringIO()):
        m = ref.new_model.FRCNN(num_classes=21).eval()
    # Non-trivial frozen-BN stats so the BN import path is meaningfully
    # exercised (swapped mean/var or scale/bias would show); modest
    # ranges keep activations O(1).
    g = torch.Generator().manual_seed(13)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0.0, 0.05, generator=g)
            mod.running_var.uniform_(0.8, 1.2, generator=g)
            mod.weight.data.uniform_(0.8, 1.2, generator=g)
            mod.bias.data.normal_(0.0, 0.05, generator=g)
    # Spread the head scores away from the uniform-softmax tie regime.
    ref.model.normal_init(m.frcnn_head.cls_head, 0, 0.05)
    ref.model.normal_init(m.frcnn_head.reg_head, 0, 0.02)

    rs = np.random.RandomState(17)
    img = rs.normal(size=(1, 3, size, size)).astype(np.float32)
    opts = SimpleNamespace(thres=0.05)
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        ref_boxes, ref_labels, ref_scores = m.predict(
            torch.from_numpy(img), opts
        )

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = import_fpn_torch_params(sd, num_classes=21)
    model, cfg = build_model("fpn", 21, dtype=jnp.float32)
    # Uncapped-equivalent budget: per-class candidates are post_nms_test
    # (1000) and the per-class NMS budget is min(per_class_k, max_det),
    # so 2000 leaves every per-class survivor in, like the reference.
    cfg = dataclasses.replace(cfg, max_detections=2000)

    images = jnp.asarray(img.transpose(0, 2, 3, 1))
    extents = jnp.ones((1, 2), jnp.float32)

    # 1) backbone + converter: all five pyramid levels match tightly.
    feats = jax.jit(lambda p, x: model.apply(p, x, method="features"))(
        params, images
    )
    want = m.backbone(torch.from_numpy(img))
    for ours_l, theirs_l in zip(feats, want.values()):
        a = np.asarray(ours_l)
        b = theirs_l.detach().numpy().transpose(0, 2, 3, 1)
        assert a.shape == b.shape, (a.shape, b.shape)
        drift = np.abs(a - b).max()
        assert drift < 2e-3 * max(1.0, np.abs(b).max()), (a.shape, drift)

    # 2) full predict: set-match detections.
    det = jax.jit(
        lambda p, x, e: model.apply(
            p, cfg, x, e, opts.thres, method=predict
        )
    )(params, images, extents)
    our_valid = np.asarray(det.valid[0])
    # The fixed budget must not have truncated (else not comparable to
    # the reference's uncapped output).
    assert our_valid.sum() < cfg.max_detections, our_valid.sum()
    ours = {
        "boxes": np.asarray(det.boxes[0])[our_valid],
        "labels": np.asarray(det.labels[0])[our_valid],
        "scores": np.asarray(det.scores[0])[our_valid],
    }
    theirs = {
        "boxes": np.asarray(ref_boxes, np.float64),
        "labels": np.asarray(ref_labels, np.int64),
        "scores": np.asarray(ref_scores, np.float64),
    }
    _assert_detection_sets_match(theirs, ours, opts.thres)


# ------------------------------------------------- reverse export parity


def _check_reference_strict_load(m, sd0, exported):
    """Exported state dict must strict-load into the actual reference
    model and reproduce every original tensor exactly."""
    assert set(exported.keys()) == set(sd0.keys()), (
        set(sd0) - set(exported), set(exported) - set(sd0))
    m.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=True,
    )
    for k, want in sd0.items():
        got = m.state_dict()[k].numpy()
        np.testing.assert_array_equal(got, want, err_msg=k)


@pytest.mark.slow
def test_legacy_reverse_export_strict_load(ref):
    """export_legacy_torch_state_dict is the exact inverse of the import
    against the ACTUAL reference model: FRCNN.state_dict -> import ->
    export -> strict load_state_dict round-trips every tensor bit-exact
    (models/model.py:275-298 layout, shared-classifier aliases included).
    A TPU-trained checkpoint exported this way is directly usable by the
    reference's resume/demo paths (utils/util.py:142-155)."""
    from faster_rcnn_pytorch_tpu.utils.checkpoint import (
        export_legacy_torch_state_dict,
        import_legacy_torch_params,
    )

    torch.manual_seed(21)
    with contextlib.redirect_stdout(io.StringIO()):
        m = ref.model.FRCNN(num_classes=21).eval()
    sd0 = {k: v.numpy().copy() for k, v in m.state_dict().items()}

    params = import_legacy_torch_params(sd0, num_classes=21)
    exported = export_legacy_torch_state_dict(params)
    _check_reference_strict_load(m, sd0, exported)


def test_fpn_reverse_export_strict_load(ref):
    """FPN twin: new_model.FRCNN.state_dict -> import -> export ->
    strict load round-trip, frozen-BN stats included
    (models/new_model.py:365-385 / torchvision resnet_fpn_backbone
    naming)."""
    from faster_rcnn_pytorch_tpu.utils.checkpoint import (
        export_fpn_torch_state_dict,
        import_fpn_torch_params,
    )

    torch.manual_seed(23)
    with contextlib.redirect_stdout(io.StringIO()):
        m = ref.new_model.FRCNN(num_classes=21).eval()
    # Non-default BN stats so a dropped/ swapped buffer cannot hide.
    g = torch.Generator().manual_seed(29)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0.0, 0.05, generator=g)
            mod.running_var.uniform_(0.8, 1.2, generator=g)
    sd0 = {k: v.numpy().copy() for k, v in m.state_dict().items()}

    params = import_fpn_torch_params(sd0, num_classes=21)
    exported = export_fpn_torch_state_dict(params)
    _check_reference_strict_load(m, sd0, exported)
