"""tools/preflight_real_data.py — the real-data readiness drill, proven
against the same synthetic trees the data tests use, so the one command
standing between "data appears" and the BASELINE.md numbers is itself
known-good (VERDICT r2 next-item 6; reference README.md:104-137)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tests.test_data import VOC_XML
from tools.preflight_real_data import (
    check_checkpoint,
    check_coco_layout,
    check_voc_layout,
)


def _make_voc_tree(root, splits=("VOCtrainval_2007", "VOCtest_2007"), n=3):
    rs = np.random.RandomState(0)
    for split in splits:
        d = root / split / "VOCdevkit" / "VOC2007"
        (d / "Annotations").mkdir(parents=True)
        (d / "JPEGImages").mkdir(parents=True)
        for i in range(n):
            (d / "Annotations" / f"im{i:03d}.xml").write_text(VOC_XML)
            img = rs.randint(0, 255, (90, 120, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / "JPEGImages" / f"im{i:03d}.jpg")


def _make_coco_tree(root, splits=("train2017", "val2017"), n=3):
    rs = np.random.RandomState(1)
    (root / "annotations").mkdir(parents=True)
    for split in splits:
        (root / split).mkdir()
        images, annotations = [], []
        for i in range(n):
            fname = f"{i:012d}.jpg"
            Image.fromarray(
                rs.randint(0, 255, (80, 100, 3), dtype=np.uint8)
            ).save(root / split / fname)
            images.append(
                {"id": i, "file_name": fname, "width": 100, "height": 80}
            )
            annotations.append(
                {
                    "id": 100 + i,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [10, 10, 40, 30],
                    "area": 1200,
                    "iscrowd": 0,
                }
            )
        (root / "annotations" / f"instances_{split}.json").write_text(
            json.dumps(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": [{"id": 1, "name": "thing"}],
                }
            )
        )


def test_voc_layout_pass(tmp_path):
    _make_voc_tree(tmp_path)
    report = check_voc_layout(str(tmp_path))
    assert report["trainval"]["images"] == 3
    assert report["test"]["images"] == 3


def test_voc_layout_missing_test_split(tmp_path):
    _make_voc_tree(tmp_path, splits=("VOCtrainval_2007",))
    with pytest.raises(SystemExit, match="test"):
        check_voc_layout(str(tmp_path))


def test_voc_layout_size_mismatch_detected(tmp_path):
    _make_voc_tree(tmp_path)
    # Corrupt one image's size vs its XML.
    bad = (
        tmp_path / "VOCtrainval_2007" / "VOCdevkit" / "VOC2007"
        / "JPEGImages" / "im000.jpg"
    )
    Image.fromarray(np.zeros((50, 50, 3), np.uint8)).save(bad)
    with pytest.raises(SystemExit, match="size"):
        check_voc_layout(str(tmp_path))


def test_coco_layout_pass(tmp_path):
    _make_coco_tree(tmp_path)
    report = check_coco_layout(str(tmp_path))
    assert report["train2017"]["images"] == 3
    assert report["val2017"]["images"] == 3


def test_coco_layout_missing_annotations(tmp_path):
    _make_coco_tree(tmp_path)
    os.remove(tmp_path / "annotations" / "instances_val2017.json")
    with pytest.raises(SystemExit, match="instances"):
        check_coco_layout(str(tmp_path))


def test_coco_layout_missing_image_file(tmp_path):
    _make_coco_tree(tmp_path)
    os.remove(tmp_path / "val2017" / f"{0:012d}.jpg")
    with pytest.raises(SystemExit):
        check_coco_layout(str(tmp_path))


def test_checkpoint_census_roundtrip(tmp_path):
    """A converted-and-exported legacy checkpoint passes the census."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils.checkpoint import save_torch_checkpoint

    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    path = str(tmp_path / "frcnn.best.pth.tar")
    save_torch_checkpoint(path, params, "legacy")
    census = check_checkpoint(path, "legacy", 21)
    assert census["params"] > 1_000_000


def test_checkpoint_rejects_html(tmp_path):
    p = tmp_path / "fake.pth.tar"
    p.write_bytes(b"<html>not a checkpoint</html>")
    with pytest.raises(SystemExit, match="HTML"):
        check_checkpoint(str(p), "legacy", 21)


@pytest.mark.slow
def test_preflight_main_end_to_end(tmp_path, monkeypatch):
    """The full tool — layout, checkpoint census, bounded eval, recipe
    printout — passes against a synthetic VOC tree and an exported
    checkpoint, through the real CLI surface."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils.checkpoint import save_torch_checkpoint
    from tools.preflight_real_data import main

    _make_voc_tree(tmp_path)
    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    ckpt = str(tmp_path / "frcnn.best.pth.tar")
    save_torch_checkpoint(ckpt, params, "legacy")

    monkeypatch.setenv("FRT_PREFLIGHT_LIMIT", "2")
    rc = main(
        [
            "--data_type", "voc",
            "--data_root", str(tmp_path),
            "--checkpoint", ckpt,
            "--resize", "64",
            "--max_size", "96",
            "--dtype", "float32",
            "--num_workers", "0",
        ]
    )
    assert rc == 0
