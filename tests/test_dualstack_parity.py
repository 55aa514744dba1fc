"""Dual-stack VOC evaluator parity (tools/dualstack_parity.py machinery).

The full drill (train -> repo test CLI -> --export_torch -> reference
predict + Evaluator('voc') on torch-CPU) runs on the chip and records
DUALSTACK_PARITY.json. These tests pin the CPU-checkable halves:

* the reference's complete VOC evaluator (evaluation/evaluator.py
  Evaluator + evaluation/voc_eval.py, run verbatim) and this repo's
  in-memory voc_eval must score the SAME synthetic detections within a
  tight tolerance — isolating evaluator-convention drift (the
  reference's +1-extent IoU over raw-XML coords vs our exact-extent
  IoU over the minus-1 contract) from model numerics;
* the 20-class shapes generator must cover all 20 VOC class names in
  any >= 20-image split (the reference voc_eval builds its class
  universe from test-set GT, voc_eval.py:252-257).
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_shapes_voc import CLASSES20, write_split  # noqa: E402


@pytest.fixture(scope="module")
def shapes20_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes20")
    write_split(
        os.path.join(root, "VOCtest_2007", "VOCdevkit", "VOC2007"),
        n=24,
        seed=3,
        classes20=True,
    )
    return str(root)


def _parse_gt(ann_dir):
    """Raw (1-based, as-written) XML boxes per image."""
    out = {}
    for f in sorted(os.listdir(ann_dir)):
        if not f.endswith(".xml"):
            continue
        tree = ET.parse(os.path.join(ann_dir, f))
        size = tree.find("size")
        w = int(size.find("width").text)
        h = int(size.find("height").text)
        boxes, labels = [], []
        for obj in tree.findall("object"):
            bb = obj.find("bndbox")
            boxes.append(
                [
                    int(bb.find("xmin").text),
                    int(bb.find("ymin").text),
                    int(bb.find("xmax").text),
                    int(bb.find("ymax").text),
                ]
            )
            labels.append(CLASSES20.index(obj.find("name").text))
        out[f[:-4]] = {
            "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "wh": (w, h),
        }
    return out


def _synthetic_detections(gt, rs):
    """Jittered-GT true positives + noise false positives, per image.

    Returns {name: (boxes_px, labels, scores)} in 0-based pixel coords
    (the repo contract); the reference feed divides by (w, h).
    """
    dets = {}
    for name, rec in gt.items():
        w, h = rec["wh"]
        boxes, labels, scores = [], [], []
        for b, l in zip(rec["boxes"], rec["labels"]):
            # XML is 1-based; detections live in 0-based pixel space.
            bb = b - 1.0 + rs.uniform(-3, 3, size=4)
            bb = np.clip(bb, 0, [w, h, w, h])
            if rs.rand() < 0.9:  # drop some -> recall < 1
                boxes.append(bb)
                labels.append(l)
                scores.append(rs.uniform(0.6, 0.99))
        for _ in range(rs.randint(0, 4)):  # false positives
            x1, y1 = rs.uniform(0, w - 40), rs.uniform(0, h - 40)
            boxes.append(
                [x1, y1, x1 + rs.uniform(20, 120), y1 + rs.uniform(20, 120)]
            )
            labels.append(rs.randint(20))
            scores.append(rs.uniform(0.05, 0.5))
        dets[name] = (
            np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(labels, np.int64),
            np.asarray(scores, np.float64),
        )
    return dets


def test_shapes20_split_covers_all_classes(shapes20_root):
    ann = os.path.join(
        shapes20_root, "VOCtest_2007", "VOCdevkit", "VOC2007", "Annotations"
    )
    gt = _parse_gt(ann)
    assert len(gt) == 24
    present = {int(l) for rec in gt.values() for l in rec["labels"]}
    assert present == set(range(20))


def test_reference_and_repo_voc_evaluators_agree(shapes20_root):
    from dualstack_parity import reference_voc_map

    from faster_rcnn_pytorch_tpu.evaluation.voc_eval import voc_eval

    ann = os.path.join(
        shapes20_root, "VOCtest_2007", "VOCdevkit", "VOC2007", "Annotations"
    )
    gt = _parse_gt(ann)
    rs = np.random.RandomState(7)
    dets = _synthetic_detections(gt, rs)

    # Reference stack: normalized [0,1] boxes + original (w, h), exactly
    # what test.py's legacy path hands Evaluator.get_info.
    infos = []
    for name, (boxes, labels, scores) in dets.items():
        w, h = gt[name]["wh"]
        infos.append(
            (
                boxes / np.array([w, h, w, h], np.float64),
                labels.astype(np.int32),
                scores.astype(np.float32),
                name,
                (w, h),
            )
        )
    ref_map, printed = reference_voc_map(shapes20_root, infos)
    assert "mAP" in printed

    # Repo stack: original-pixel predictions vs the minus-1 parsed gt
    # contract (data/voc.py parse; engine/evaluate.py conventions).
    predictions = {
        name: {"boxes": b, "labels": l, "scores": s}
        for name, (b, l, s) in dets.items()
    }
    ground_truths = {
        name: {
            "boxes": rec["boxes"] - 1.0,
            "labels": rec["labels"],
            "difficult": np.zeros(len(rec["labels"]), bool),
        }
        for name, rec in gt.items()
    }
    out = voc_eval(
        predictions, ground_truths, num_classes=20, verbose=False
    )
    repo_map = out["map"]

    # Non-vacuous: jittered-GT detections must score well on both.
    assert repo_map > 0.5 and ref_map > 0.5
    # The stacks differ only in the documented sub-pixel IoU/coord
    # conventions; on +-3 px jitter that bounds the gap tightly.
    assert abs(repo_map - ref_map) < 0.02, (repo_map, ref_map)


def test_decompose_gap_greedy_match(tmp_path):
    """decompose_gap separates identical stacks (full match, zero deltas)
    from a structural divergence (unmatched extra boxes)."""
    import pickle

    from dualstack_parity import _greedy_match, decompose_gap

    boxes = np.array(
        [[10, 10, 50, 60], [80, 20, 140, 90]], np.float32
    )
    labels = np.array([2, 5], np.int64)
    scores = np.array([0.9, 0.4], np.float32)
    da = {"boxes": boxes, "labels": labels, "scores": scores}

    # Identical sets: every pair matches with zero deltas.
    m, sdel, bdel = _greedy_match(da, da)
    assert m == 2 and max(sdel) == 0.0 and max(bdel) == 0.0

    # Sub-pixel jitter still matches; a label flip does not.
    db = {
        "boxes": boxes + 0.5,
        "labels": labels.copy(),
        "scores": scores + 0.01,
    }
    db["labels"][1] = 7
    m, sdel, bdel = _greedy_match(da, db)
    assert m == 1 and abs(sdel[0] - 0.01) < 1e-6 and bdel[0] == 0.5

    # End-to-end on the dump layout: repo img_id = sorted-stem index.
    dump = tmp_path / "repo_dets.pkl"
    with open(dump, "wb") as f:
        pickle.dump(
            {"predictions": {0: da, 1: da}, "gts": {}}, f
        )
    out = decompose_gap(str(dump), [da, db])
    assert out["matched_pairs"] == 3
    assert out["repo_n_detections"] == 4
    assert out["reference_n_detections"] == 4
    assert out["matched_frac_of_ref"] == 0.75
