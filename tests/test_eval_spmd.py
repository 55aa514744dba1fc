"""SPMD evaluation over the virtual 8-device mesh.

The per-epoch eval shards batch rows over the mesh's ``data`` axis
(engine/evaluate.py): with a replicated-params plain jit every device
would run identical work at single-device throughput. These tests pin
exactness — sharded predict must produce byte-identical packed
detections and the same mAP as the single-device path.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from faster_rcnn_pytorch_tpu.data.coco import load_coco_records
from faster_rcnn_pytorch_tpu.data.loader import DetectionLoader
from faster_rcnn_pytorch_tpu.data.transforms import EvalTransform
from faster_rcnn_pytorch_tpu.engine.evaluate import _jitted_predict, evaluate
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    LEGACY_CONFIG,
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def _tiny_model(num_classes=3):
    cfg = dataclasses.replace(
        LEGACY_CONFIG,
        num_classes=num_classes,
        pre_nms_test=64,
        post_nms_test=16,
        max_detections=8,
        score_threshold=0.0,
    )
    model, _ = build_model("legacy", num_classes=num_classes, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    return model, cfg, params


def test_spmd_predict_matches_single_device():
    model, cfg, params = _tiny_model()
    rs = np.random.RandomState(1)
    mesh = make_mesh(4)
    images = rs.rand(4, 64, 64, 3).astype(np.float32)
    extents = np.tile(np.array([1.0, 0.9], np.float32), (4, 1))

    ref = np.asarray(_jitted_predict(model, cfg, 0.0)(params, images, extents))
    spmd = np.asarray(
        _jitted_predict(model, cfg, 0.0, mesh, params)(params, images, extents)
    )
    np.testing.assert_array_equal(ref, spmd)


def test_spmd_predict_matches_under_tensor_parallelism():
    """(data, model) mesh: batch rows shard over `data` while the
    Megatron-sharded roi-head FCs shard over `model` — eval must stay
    byte-identical to the single-device program (the TP all-reduce is
    exact for these shapes)."""
    from faster_rcnn_pytorch_tpu.parallel.mesh import shard_tree

    model, cfg, params = _tiny_model()
    rs = np.random.RandomState(2)
    mesh = make_mesh(4, model_parallel=2)  # data 2 x model 2
    images = rs.rand(4, 64, 64, 3).astype(np.float32)
    extents = np.tile(np.array([1.0, 0.9], np.float32), (4, 1))

    ref = np.asarray(_jitted_predict(model, cfg, 0.0)(params, images, extents))
    tp_params = shard_tree(params, mesh)
    spmd = np.asarray(
        _jitted_predict(model, cfg, 0.0, mesh, tp_params)(
            tp_params, images, extents
        )
    )
    np.testing.assert_array_equal(ref, spmd)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("spmdeval")
    (root / "val2017").mkdir()
    rs = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(6):
        fname = f"{i:012d}.jpg"
        img = rs.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        img[10:35, 10:40] = [200, 30, 30]
        Image.fromarray(img).save(root / "val2017" / fname)
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


def _loader(root, ann_path, batch_size):
    records, index = load_coco_records(
        os.path.join(root, "val2017"), ann_path, contiguous=True
    )
    return (
        DetectionLoader(
            records,
            EvalTransform(size=64, max_size=112),
            batch_size=batch_size,
            size=64,
            max_size=112,
            shuffle=False,
            num_workers=0,
            drop_last=False,
        ),
        index,
    )


@pytest.mark.slow
def test_spmd_evaluate_matches_single_device(coco_dir):
    root, ann_path = coco_dir
    model, cfg, params = _tiny_model(num_classes=2)
    mesh = make_mesh(2)  # batch 2 over a 2-device data axis

    loader1, index = _loader(root, ann_path, batch_size=1)
    ref = evaluate(
        model, cfg, params, loader1, data_type="coco", coco_index=index,
        label_map=lambda l: index.contiguous_to_cat[l], score_threshold=0.0,
    )
    loader2, index2 = _loader(root, ann_path, batch_size=2)
    spmd = evaluate(
        model, cfg, params, loader2, data_type="coco", coco_index=index2,
        label_map=lambda l: index2.contiguous_to_cat[l], score_threshold=0.0,
        mesh=mesh,
    )
    np.testing.assert_allclose(spmd["map"], ref["map"], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(spmd["stats"]), np.asarray(ref["stats"]), atol=1e-7
    )


def test_spmd_evaluate_rejects_indivisible_batch(coco_dir):
    root, ann_path = coco_dir
    model, cfg, params = _tiny_model(num_classes=2)
    mesh = make_mesh(4)
    loader3, index = _loader(root, ann_path, batch_size=3)
    with pytest.raises(ValueError, match="divisible"):
        evaluate(
            model, cfg, params, loader3, data_type="coco", coco_index=index,
            label_map=lambda l: index.contiguous_to_cat[l],
            mesh=mesh,
        )
