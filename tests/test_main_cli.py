"""Full CLI integration: main.main() trains one epoch on a synthetic VOC
tree, evaluates, writes checkpoints + metric logs (the reference's
main_worker behaviour, main.py:30-104)."""

import dataclasses
import glob
import os

import numpy as np
import pytest
from PIL import Image

from tests.test_data import VOC_XML


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vocmain")
    d = root / "VOCtrainval_2007" / "VOCdevkit" / "VOC2007"
    t = root / "VOCtest_2007" / "VOCdevkit" / "VOC2007"
    rs = np.random.RandomState(0)
    for base, n in ((d, 6), (t, 3)):
        (base / "Annotations").mkdir(parents=True)
        (base / "JPEGImages").mkdir(parents=True)
        for i in range(n):
            name = f"im{i:03d}"
            (base / "Annotations" / f"{name}.xml").write_text(VOC_XML)
            img = rs.randint(0, 255, (90, 120, 3), dtype=np.uint8)
            img[20:70, 10:60] = [220, 40, 40]
            Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
    return str(root)


@pytest.mark.slow
def test_main_trains_evaluates_and_checkpoints(voc_tree, tmp_path, monkeypatch):
    # Shrink the detector budgets so the CPU compile stays fast.
    import faster_rcnn_pytorch_tpu.models.faster_rcnn as fr

    small = dataclasses.replace(
        fr.LEGACY_CONFIG,
        pre_nms_train=128,
        post_nms_train=32,
        pre_nms_test=64,
        post_nms_test=16,
        roi_samples=16,
        roi_pos_quota=4,
        max_detections=8,
    )
    monkeypatch.setattr(fr, "LEGACY_CONFIG", small)

    from faster_rcnn_pytorch_tpu.main import main

    log_dir = str(tmp_path / "logs")
    rc = main(
        [
            "--data_type", "voc",
            "--data_root", voc_tree,
            "--name", "smoke",
            "--log_dir", log_dir,
            "--epoch", "1",
            "--batch_size", "2",
            "--resize", "64",
            "--max_size", "96",
            "--num_workers", "0",
            "--vis_step", "1",
            "--dtype", "float32",
            "--log_backend", "csv",
        ]
    )
    assert rc == 0
    saves = glob.glob(os.path.join(log_dir, "smoke", "saves", "*.ckpt"))
    assert any("smoke.0.ckpt" in s for s in saves)
    assert any("smoke.best.ckpt" in s for s in saves)
    assert os.path.exists(os.path.join(log_dir, "smoke", "smoke_log.csv"))
