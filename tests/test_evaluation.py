"""Hand-computable golden cases for the COCO-protocol and VOC evaluators."""

import numpy as np

from faster_rcnn_pytorch_tpu.data.coco import CocoIndex
from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator
from faster_rcnn_pytorch_tpu.evaluation.voc_eval import voc_ap, voc_eval


def make_index(anns, images=None, cats=(1, 2)):
    images = images or [{"id": 1, "width": 640, "height": 480}]
    return CocoIndex(
        {
            "images": images,
            "annotations": anns,
            "categories": [{"id": c, "name": str(c)} for c in cats],
        }
    )


def ann(aid, img, cat, x, y, w, h, crowd=0):
    return {
        "id": aid,
        "image_id": img,
        "category_id": cat,
        "bbox": [x, y, w, h],
        "area": w * h,
        "iscrowd": crowd,
    }


def run_eval(index, preds):
    ev = CocoEvaluator(index)
    ev.update(preds)
    ev.accumulate()
    return ev.summarize()


def test_perfect_predictions():
    index = make_index(
        [ann(1, 1, 1, 10, 10, 100, 100), ann(2, 1, 2, 200, 200, 50, 80)]
    )
    preds = {
        1: {
            "boxes": np.array([[10, 10, 110, 110], [200, 200, 250, 280]]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([1, 2]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[0], 1.0)
    assert np.isclose(stats[1], 1.0)
    assert np.isclose(stats[8], 1.0)  # AR@100


def test_extra_fp_after_tp_keeps_ap_one():
    index = make_index([ann(1, 1, 1, 10, 10, 100, 100)], cats=(1,))
    preds = {
        1: {
            "boxes": np.array([[10, 10, 110, 110], [400, 300, 460, 380]]),
            "scores": np.array([0.9, 0.5]),
            "labels": np.array([1, 1]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[1], 1.0)  # FP ranked below the TP


def test_fp_before_tp_halves_precision_envelope():
    index = make_index([ann(1, 1, 1, 10, 10, 100, 100)], cats=(1,))
    preds = {
        1: {
            "boxes": np.array([[400, 300, 460, 380], [10, 10, 110, 110]]),
            "scores": np.array([0.9, 0.5]),
            "labels": np.array([1, 1]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[1], 0.5)  # precision at recall 1 is 1/2


def test_localization_quality_affects_high_thresholds():
    # IoU ~ 0.58 -> counts at 0.5/0.55 only.
    index = make_index([ann(1, 1, 1, 0, 0, 100, 100)], cats=(1,))
    preds = {
        1: {
            "boxes": np.array([[0, 0, 100, 58]]),
            "scores": np.array([0.9]),
            "labels": np.array([1]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[1], 1.0)  # AP50
    assert np.isclose(stats[2], 0.0)  # AP75
    assert np.isclose(stats[0], 0.2)  # 2 of 10 thresholds


def test_crowd_match_is_not_fp():
    index = make_index(
        [ann(1, 1, 1, 10, 10, 100, 100), ann(2, 1, 1, 300, 300, 200, 100, crowd=1)],
        cats=(1,),
    )
    preds = {
        1: {
            "boxes": np.array([[10, 10, 110, 110], [310, 310, 400, 390]]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([1, 1]),
        }
    }
    stats = run_eval(index, preds)
    # det 2 matches the crowd region -> ignored, AP stays 1.
    assert np.isclose(stats[1], 1.0)


def test_area_range_split():
    # one small (16x16=256 < 1024) and one large gt
    index = make_index(
        [ann(1, 1, 1, 10, 10, 16, 16), ann(2, 1, 1, 100, 100, 200, 200)],
        cats=(1,),
    )
    preds = {
        1: {
            "boxes": np.array([[10, 10, 26, 26], [100, 100, 300, 300]]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([1, 1]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[3], 1.0)  # AP small
    assert np.isclose(stats[5], 1.0)  # AP large
    assert stats[4] == -1.0  # no medium gt


def test_missing_detection_bounds_recall():
    index = make_index(
        [ann(1, 1, 1, 10, 10, 100, 100), ann(2, 1, 1, 300, 300, 100, 100)],
        cats=(1,),
    )
    preds = {
        1: {
            "boxes": np.array([[10, 10, 110, 110]]),
            "scores": np.array([0.9]),
            "labels": np.array([1]),
        }
    }
    stats = run_eval(index, preds)
    assert np.isclose(stats[8], 0.5)  # AR@100
    # AP: precision 1 up to recall .5, then 0 -> 101-pt mean ~ 51/101
    assert abs(stats[1] - 51 / 101) < 1e-6


# ----------------------------------------------------------------- VOC


def test_voc_ap_envelope():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    assert np.isclose(voc_ap(rec, prec), 0.75)


def voc_gt(boxes, labels, difficult=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {
        "boxes": boxes,
        "labels": np.asarray(labels),
        "difficult": np.asarray(
            difficult if difficult is not None else np.zeros(len(boxes), bool)
        ),
    }


def test_voc_eval_perfect():
    gts = {1: voc_gt([[0, 0, 10, 10]], [0])}
    preds = {
        1: {"boxes": np.array([[0, 0, 10, 10]]), "scores": np.array([0.9]), "labels": np.array([0])}
    }
    out = voc_eval(preds, gts, num_classes=1, verbose=False)
    assert np.isclose(out["map"], 1.0)


def test_voc_eval_duplicate_is_fp():
    gts = {1: voc_gt([[0, 0, 10, 10]], [0])}
    preds = {
        1: {
            "boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0]),
        }
    }
    out = voc_eval(preds, gts, num_classes=1, verbose=False)
    assert np.isclose(out["map"], 1.0)  # dup ranks below -> AP still 1


def test_voc_eval_difficult_excluded():
    gts = {1: voc_gt([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 0], [False, True])}
    preds = {
        1: {
            "boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0]),
        }
    }
    out = voc_eval(preds, gts, num_classes=1, verbose=False)
    # difficult gt: not in denominator, its match not an FP.
    assert np.isclose(out["map"], 1.0)
