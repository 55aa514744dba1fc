"""COCO RLE codec + evaluator prepare-path tests (reference
evaluation/coco_eval.py:63-153 capability parity)."""

import numpy as np

from faster_rcnn_pytorch_tpu.evaluation import mask_rle
from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator


def test_counts_col_major_and_leading_zero_run():
    mask = np.array([[1, 0], [0, 1]], bool)
    # column-major flat = [1, 0, 0, 1]; counts start with a zero-run
    assert mask_rle.mask_to_counts(mask) == [0, 1, 2, 1]
    np.testing.assert_array_equal(
        mask_rle.counts_to_mask([0, 1, 2, 1], (2, 2)), mask
    )


def test_varint_singletons():
    # spec-determined strings: counts [1] -> '1'; [0, 1] -> '01'
    assert mask_rle.counts_to_string([1]) == "1"
    assert mask_rle.string_to_counts("1") == [1]
    assert mask_rle.counts_to_string([0, 1]) == "01"
    assert mask_rle.string_to_counts("01") == [0, 1]


def test_varint_delta_quirk():
    # the 4th count onward is delta-encoded against counts[i-2]
    # (maskApi.c `if (i > 2)`), including negative deltas
    for counts in ([3, 5, 2, 9, 4, 1], [0, 40, 7, 3, 1000, 2], [5, 5, 5, 5]):
        s = mask_rle.counts_to_string(counts)
        assert all(48 <= ord(c) < 48 + 64 for c in s)
        assert mask_rle.string_to_counts(s) == counts


def test_rle_roundtrip_fuzz():
    rs = np.random.RandomState(7)
    for _ in range(20):
        h, w = rs.randint(1, 40, size=2)
        mask = rs.rand(h, w) > rs.uniform(0.2, 0.8)
        rle = mask_rle.encode(mask)
        assert rle["size"] == [h, w]
        np.testing.assert_array_equal(mask_rle.decode(rle), mask)


def test_uncompressed_counts_accepted():
    mask = np.eye(5, dtype=bool)
    rle = {"size": [5, 5], "counts": mask_rle.mask_to_counts(mask)}
    np.testing.assert_array_equal(mask_rle.decode(rle), mask)


def test_mask_iou_crowd_semantics():
    a = np.zeros((4, 4), bool)
    a[:2] = True  # 8 px
    b = np.zeros((4, 4), bool)
    b[1:3] = True  # 8 px, overlap 4
    ra, rb = mask_rle.encode(a), mask_rle.encode(b)
    np.testing.assert_allclose(mask_rle.iou(ra, rb), 4 / 12)
    # crowd: intersection over first-mask area
    np.testing.assert_allclose(mask_rle.iou(ra, rb, iscrowd=True), 4 / 8)


def test_prepare_paths_emit_coco_records():
    preds = {
        3: {
            "boxes": np.array([[10.0, 20.0, 30.0, 60.0]]),
            "scores": np.array([0.9]),
            "labels": np.array([17]),
            "masks": np.ones((1, 1, 6, 6)) * 0.7,
            "keypoints": np.array([[[1.0, 2.0, 2.0], [3.0, 4.0, 1.0]]]),
        }
    }
    det = CocoEvaluator.prepare_for_coco_detection(preds)
    assert det == [
        {
            "image_id": 3,
            "category_id": 17,
            "bbox": [10.0, 20.0, 20.0, 40.0],
            "score": 0.9,
        }
    ]
    seg = CocoEvaluator.prepare_for_coco_segmentation(preds)
    assert seg[0]["segmentation"]["size"] == [6, 6]
    np.testing.assert_array_equal(
        mask_rle.decode(seg[0]["segmentation"]), np.ones((6, 6), bool)
    )
    kp = CocoEvaluator.prepare_for_coco_keypoint(preds)
    assert kp[0]["keypoints"] == [1.0, 2.0, 2.0, 3.0, 4.0, 1.0]
