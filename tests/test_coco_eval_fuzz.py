"""Fuzz CocoEvaluator's 12 stats against the pycocotools-port oracle.

Scenes deliberately hit the protocol's corner cases: crowd gts, area
ranges straddling the 32^2/96^2 splits, score ties (quantised scores +
stable sorts), >100 detections per image (maxDets truncation), empty
classes, images with gts but no detections and vice versa.
"""

import numpy as np
import pytest

from faster_rcnn_pytorch_tpu.data.coco import CocoIndex
from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator
from tests.cocoeval_oracle import cocoeval_oracle


def random_scene(rs: np.random.RandomState):
    n_imgs = rs.randint(1, 5)
    n_cats = rs.randint(1, 4)
    cat_ids = sorted(rs.choice(np.arange(1, 12), size=n_cats, replace=False).tolist())
    img_ids = sorted(rs.choice(np.arange(1, 50), size=n_imgs, replace=False).tolist())

    def rand_boxes(n, big=False):
        # sizes 4..160 px in a 300x300 image: spans small/medium/large
        xy1 = rs.uniform(0, 200, size=(n, 2))
        hi = 160.0 if big else rs.choice([12.0, 40.0, 160.0])
        wh = rs.uniform(4, hi, size=(n, 2))
        return np.concatenate([xy1, xy1 + wh], axis=1)

    annotations = []
    ann_id = 1
    gt_by_img = {}
    for img in img_ids:
        n_gt = rs.randint(0, 9)
        boxes = rand_boxes(n_gt)
        cats = rs.choice(cat_ids, size=n_gt) if n_gt else np.array([], int)
        crowd = rs.uniform(size=n_gt) < 0.2
        gt_by_img[img] = boxes
        for b, c, cr in zip(boxes, cats, crowd):
            x1, y1, x2, y2 = [float(v) for v in b]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": int(img),
                    "category_id": int(c),
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": int(cr),
                }
            )
            ann_id += 1

    dataset = {
        "images": [{"id": int(i), "width": 300, "height": 300} for i in img_ids],
        "annotations": annotations,
        "categories": [{"id": int(c), "name": str(c)} for c in cat_ids],
    }

    predictions = {}
    for img in img_ids:
        # mixture: perturbed copies of gts (real matches) + random noise;
        # occasionally >100 dets to exercise the maxDets prefix
        n_noise = int(rs.choice([0, 3, 8, 120], p=[0.1, 0.4, 0.4, 0.1]))
        gt = gt_by_img[img]
        n_copy = rs.randint(0, len(gt) * 2 + 1) if len(gt) else 0
        copies = (
            gt[rs.randint(0, len(gt), n_copy)]
            + rs.normal(0, rs.choice([1.0, 8.0]), size=(n_copy, 4))
            if n_copy
            else np.zeros((0, 4))
        )
        noise = rand_boxes(n_noise) if n_noise else np.zeros((0, 4))
        boxes = np.concatenate([copies, noise]).astype(np.float64)
        boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 0.5)
        n = len(boxes)
        # quantised scores force ties through every stable sort
        scores = rs.choice(np.linspace(0.05, 0.95, 10), size=n)
        labels = rs.choice(cat_ids, size=n) if n else np.array([], int)
        predictions[int(img)] = {
            "boxes": boxes,
            "scores": scores.astype(np.float64),
            "labels": labels.astype(np.int64),
        }
    return dataset, predictions


@pytest.mark.parametrize("chunk", range(8))
def test_coco_eval_matches_pycocotools_port(chunk):
    """200+ fuzz scenes, exact stat agreement (25 scenes per chunk)."""
    for i in range(25):
        seed = chunk * 25 + i
        rs = np.random.RandomState(seed)
        dataset, predictions = random_scene(rs)

        want = cocoeval_oracle(dataset, predictions)

        evaluator = CocoEvaluator(CocoIndex(dataset))
        evaluator.update(predictions)
        evaluator.accumulate()
        got = evaluator.summarize()

        np.testing.assert_allclose(
            got, want, atol=1e-10, err_msg=f"seed={seed}"
        )
