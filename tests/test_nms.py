"""Exact-greedy NMS parity vs a sequential numpy oracle (torchvision
semantics: suppress iff IoU strictly greater than threshold)."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.nms import nms, batched_nms, multiclass_nms
from tests.conftest import boxes_fixture
from tests.test_boxes import np_iou


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou = np_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= iou > thr
        suppressed[i] = True  # processed
    return np.array(keep, dtype=np.int32)


def run_case(n, thr, seed, tile=64, post_k=None, valid=None):
    rs = np.random.RandomState(seed)
    boxes = boxes_fixture(rs, n)
    scores = rs.uniform(size=n).astype(np.float32)
    oracle = np_greedy_nms(
        boxes if valid is None else boxes[valid],
        scores if valid is None else scores[valid],
        thr,
    )
    if valid is not None:
        oracle = np.where(valid)[0][oracle]
    post_k = post_k or n
    idx, ok = nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        thr,
        post_k=post_k,
        valid=None if valid is None else jnp.asarray(valid),
        tile=tile,
    )
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    got = idx[ok]
    want = oracle[:post_k]
    np.testing.assert_array_equal(got, want)


def test_small_exact():
    run_case(10, 0.5, 0)


def test_medium_exact_many_seeds():
    for seed in range(5):
        run_case(200, 0.5, seed)


def test_dense_overlaps():
    # Tight cluster: many chained suppressions exercise the fixpoint loop.
    rs = np.random.RandomState(3)
    base = boxes_fixture(rs, 8)
    boxes = np.concatenate(
        [base + rs.normal(0, 0.01, size=base.shape) for _ in range(40)]
    ).astype(np.float32)
    scores = rs.uniform(size=len(boxes)).astype(np.float32)
    oracle = np_greedy_nms(boxes, scores, 0.5)
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, post_k=320, tile=64)
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(ok)], oracle)


def test_threshold_variants():
    for thr in (0.3, 0.7, 0.9):
        run_case(150, thr, 7)


def test_validity_mask():
    rs = np.random.RandomState(11)
    valid = rs.uniform(size=120) > 0.3
    run_case(120, 0.5, 11, valid=valid)


def test_post_k_truncation():
    run_case(300, 0.5, 2, post_k=10)


def test_padding_slots_are_minus_one():
    rs = np.random.RandomState(5)
    boxes = boxes_fixture(rs, 4)
    # All boxes identical -> only one survives.
    boxes = np.tile(boxes[:1], (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], dtype=np.float32)
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, post_k=4, tile=64)
    assert np.asarray(idx).tolist() == [0, -1, -1, -1]
    assert np.asarray(ok).tolist() == [True, False, False, False]


def test_batched_nms_classes_dont_interact():
    rs = np.random.RandomState(9)
    boxes = np.tile(boxes_fixture(rs, 1), (2, 1))
    scores = np.array([0.9, 0.8], dtype=np.float32)
    cls = jnp.array([0, 1])
    idx, ok = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), cls, 0.5, post_k=2)
    assert np.asarray(ok).sum() == 2  # same box, different class: both kept


def test_multiclass_nms_vmapped_branch_matches_oracle():
    """Same oracle, sized above the flatten threshold so the vmapped
    per-class branch runs."""
    rs = np.random.RandomState(33)
    n, num_classes = 300, 60
    cls_boxes = np.stack(
        [boxes_fixture(rs, n) for _ in range(num_classes)], axis=1
    )
    logits = rs.normal(size=(n, num_classes)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    thres = 0.2
    want = []
    for l in range(1, num_classes):
        m = probs[:, l] > thres
        keep = np_greedy_nms(cls_boxes[m, l], probs[m, l], 0.3)
        for k in keep:
            want.append((l - 1, float(probs[m, l][k])))
    want = sorted(want, key=lambda t: -t[1])[:100]

    b, lab, s, ok = multiclass_nms(
        jnp.asarray(cls_boxes), jnp.asarray(probs), thres, 0.3,
        num_classes=num_classes, per_class_k=100, max_det=100, tile=128,
    )
    got = sorted(
        [(int(lab[i]), float(s[i])) for i in range(100) if np.asarray(ok)[i]],
        key=lambda t: -t[1],
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)


def test_multiclass_nms_matches_reference_suppress():
    """Oracle: the reference _suppress loop (models/model.py:382-402)."""
    rs = np.random.RandomState(21)
    n, num_classes = 40, 6
    cls_boxes = np.stack(
        [boxes_fixture(rs, n) for _ in range(num_classes)], axis=1
    )  # [n, C, 4]
    logits = rs.normal(size=(n, num_classes)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    thres = 0.15

    want = []
    for l in range(1, num_classes):
        m = probs[:, l] > thres
        keep = np_greedy_nms(cls_boxes[m, l], probs[m, l], 0.3)
        for k in keep:
            want.append((l - 1, probs[m, l][k], tuple(cls_boxes[m, l][k])))

    b, lab, s, ok = multiclass_nms(
        jnp.asarray(cls_boxes),
        jnp.asarray(probs),
        thres,
        0.3,
        num_classes=num_classes,
        per_class_k=40,
        max_det=240,
        tile=64,
    )
    got = [
        (int(lab[i]), float(s[i]), tuple(np.asarray(b[i])))
        for i in range(len(np.asarray(ok)))
        if np.asarray(ok)[i]
    ]
    want_sorted = sorted(want, key=lambda t: -t[1])
    got_sorted = sorted(got, key=lambda t: -t[1])
    assert len(got_sorted) == len(want_sorted)
    for g, w in zip(got_sorted, want_sorted):
        assert g[0] == w[0]
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)
        np.testing.assert_allclose(g[2], w[2], atol=1e-6)


def test_batched_nms_pixel_scale_coords():
    """Offset derived from data (torchvision-style): pixel-coordinate
    boxes must not cross-suppress between classes."""
    box = np.array([[100.0, 120.0, 400.0, 380.0]], np.float32)
    boxes = np.tile(box, (3, 1))
    boxes[2] += 2.0  # near-duplicate of box 0, same class
    scores = np.array([0.9, 0.85, 0.8], np.float32)
    cls = jnp.array([0, 1, 0])
    idx, ok = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), cls, 0.5, post_k=3
    )
    ok = np.asarray(ok)
    idx = np.asarray(idx)
    assert ok.tolist() == [True, True, False]  # classes 0 and 1 kept once each
    assert set(idx[ok].tolist()) == {0, 1}


def test_multiclass_nms_compact_and_fallback_agree():
    """The top-K compaction branch and the vmapped fallback must produce
    identical detections; candidate_k forces each side of the lax.cond."""
    rs = np.random.RandomState(57)
    n, num_classes = 300, 60
    cls_boxes = np.stack(
        [boxes_fixture(rs, n) for _ in range(num_classes)], axis=1
    )
    logits = rs.normal(size=(n, num_classes)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    kwargs = dict(
        num_classes=num_classes, per_class_k=100, max_det=100, tile=128
    )
    # candidate_k=4096 -> count <= K -> compact path taken
    compact = multiclass_nms(
        jnp.asarray(cls_boxes), jnp.asarray(probs), 0.2, 0.3,
        candidate_k=4096, **kwargs,
    )
    # candidate_k=1 -> count > K -> vmapped fallback taken
    fallback = multiclass_nms(
        jnp.asarray(cls_boxes), jnp.asarray(probs), 0.2, 0.3,
        candidate_k=1, **kwargs,
    )
    for a, b in zip(compact, fallback):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tile_size_invariance():
    """NMS results are exact for ANY tile size (the tiled sweep is an
    exact greedy decomposition) — guards rpn_nms_tile_train=1024
    (models/faster_rcnn.py LEGACY_CONFIG, DESIGN.md §6 round 3)."""
    for tile in (32, 64, 256, 512, 1024):
        run_case(900, 0.7, 11, tile=tile, post_k=200)
