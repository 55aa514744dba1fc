"""engine.evaluate end-to-end on a synthetic COCO fixture (CPU backend):
loader -> jitted predict -> coordinate rescale -> COCO-protocol stats."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from faster_rcnn_pytorch_tpu.data.coco import CocoIndex, load_coco_records
from faster_rcnn_pytorch_tpu.data.loader import DetectionLoader
from faster_rcnn_pytorch_tpu.data.transforms import EvalTransform
from faster_rcnn_pytorch_tpu.engine.evaluate import (
    detections_to_original_coords,
    evaluate,
)
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    LEGACY_CONFIG,
    Detections,
    build_model,
    init_detector_params,
)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocoeval")
    (root / "val2017").mkdir()
    rs = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        fname = f"{i:012d}.jpg"
        Image.fromarray(rs.randint(0, 255, (60, 80, 3), dtype=np.uint8)).save(
            root / "val2017" / fname
        )
        images.append({"id": i, "file_name": fname, "width": 80, "height": 60})
        annotations.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [10, 10, 30, 25], "area": 750, "iscrowd": 0}
        )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }
    path = root / "ann.json"
    path.write_text(json.dumps(ann))
    return str(root), str(path)


@pytest.mark.slow
def test_evaluate_runs_end_to_end(coco_dir):
    root, ann_path = coco_dir
    records, index = load_coco_records(
        os.path.join(root, "val2017"), ann_path, contiguous=True
    )
    loader = DetectionLoader(
        records,
        EvalTransform(size=64, max_size=112),
        batch_size=1,
        size=64,
        max_size=112,
        shuffle=False,
        num_workers=0,
        drop_last=False,
    )
    cfg = dataclasses.replace(
        LEGACY_CONFIG,
        num_classes=2,
        pre_nms_test=64,
        post_nms_test=16,
        max_detections=8,
        score_threshold=0.0,
    )
    model, _ = build_model("legacy", num_classes=2, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    result = evaluate(
        model,
        cfg,
        params,
        loader,
        data_type="coco",
        coco_index=index,
        label_map=lambda l: index.contiguous_to_cat[l],
        score_threshold=0.0,
    )
    assert "map" in result
    assert len(result["stats"]) == 12
    assert np.isfinite(result["map"]) or result["map"] == -1.0


def test_detections_to_original_coords_roundtrip():
    # canvas 64x112, resized image 60x100 inside it, original 120x200.
    # packed rows: xyxy, label, score, valid (the one-fetch layout).
    packed = np.asarray(
        [[[0.1, 0.2, 0.5, 0.6, 3.0, 0.9, 1.0],
          [0.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0]]],
        np.float32,
    )
    batch = {
        "image": np.zeros((1, 64, 112, 3), np.float32),
        "resized_hw": np.array([[60, 100]]),
        "orig_hw": np.array([[120, 200]]),
    }
    boxes, labels, scores = detections_to_original_coords(packed, batch, 0)
    assert boxes.shape == (1, 4)  # invalid row dropped
    # canvas x: 0.1*112=11.2 -> original x: 11.2 * 200/100 = 22.4
    np.testing.assert_allclose(boxes[0], [22.4, 25.6, 112.0, 76.8], atol=1e-3)
    assert labels[0] == 3
