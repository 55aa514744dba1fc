"""Data pipeline tests over synthetic VOC/COCO fixtures on disk."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from faster_rcnn_pytorch_tpu.data.coco import CocoIndex, load_coco_records
from faster_rcnn_pytorch_tpu.data.loader import DetectionLoader
from faster_rcnn_pytorch_tpu.data.mosaic import load_mosaic
from faster_rcnn_pytorch_tpu.data.transforms import (
    EvalTransform,
    TrainAugment,
    hflip,
    normalize,
    resize_min_side,
)
from faster_rcnn_pytorch_tpu.data.voc import load_voc_records, parse_voc_xml

VOC_XML = """<annotation>
  <size><width>120</width><height>90</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>61</xmax><ymax>71</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>40</xmax><ymax>40</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    d = root / "VOCtrainval_2007" / "VOCdevkit" / "VOC2007"
    (d / "Annotations").mkdir(parents=True)
    (d / "JPEGImages").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(6):
        name = f"im{i:03d}"
        (d / "Annotations" / f"{name}.xml").write_text(VOC_XML)
        w, h = (120, 90) if i % 2 == 0 else (90, 120)
        img = Image.fromarray(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))
        img.save(d / "JPEGImages" / f"{name}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rs = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(4):
        fname = f"{i:012d}.jpg"
        Image.fromarray(rs.randint(0, 255, (80, 100, 3), dtype=np.uint8)).save(
            root / "val2017" / fname
        )
        images.append({"id": i, "file_name": fname, "width": 100, "height": 80})
        annotations.append(
            {
                "id": 100 + i,
                "image_id": i,
                "category_id": [1, 3, 18, 90][i],
                "bbox": [10, 10, 40, 30],
                "area": 1200,
                "iscrowd": 0,
            }
        )
    # one degenerate + one crowd box
    annotations.append(
        {"id": 990, "image_id": 0, "category_id": 1, "bbox": [5, 5, 0.5, 9],
         "area": 4.5, "iscrowd": 0}
    )
    annotations.append(
        {"id": 991, "image_id": 0, "category_id": 1, "bbox": [5, 5, 20, 20],
         "area": 400, "iscrowd": 1}
    )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in [1, 3, 18, 90]],
    }
    (root / "annotations" / "instances_val2017.json").write_text(json.dumps(ann))
    return str(root)


def test_parse_voc_xml(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(VOC_XML)
    out = parse_voc_xml(str(p))
    assert out["boxes"].shape == (2, 4)
    np.testing.assert_allclose(out["boxes"][0], [10, 20, 60, 70])  # minus 1
    assert out["labels"][0] == 11  # dog
    assert out["difficult"].tolist() == [False, True]


def test_load_voc_records(voc_root):
    recs = load_voc_records(voc_root, "trainval")
    assert len(recs) == 6
    assert recs[0].boxes.shape == (2, 4)


def test_coco_records_remap_and_filters(coco_root):
    recs, index = load_coco_records(
        os.path.join(coco_root, "val2017"),
        os.path.join(coco_root, "annotations", "instances_val2017.json"),
        contiguous=True,
    )
    assert len(recs) == 4
    r0 = next(r for r in recs if r.image_id == 0)
    # degenerate + crowd dropped -> single box; cat 1 -> contiguous 0
    assert r0.boxes.shape == (1, 4)
    assert r0.labels[0] == 0
    # cat 90 -> contiguous 3
    r3 = next(r for r in recs if r.image_id == 3)
    assert r3.labels[0] == 3
    assert index.cat_to_contiguous[90] == 3


def test_label_map_tolerates_sparse_coco_categories(coco_root):
    """legacy+COCO label map must not assume all 80 categories exist
    (custom COCO-format datasets / tools/make_shapes_coco.py carry
    fewer): model slots without a category map to -1, an id the
    evaluator (which walks cat_ids) never scores."""
    from faster_rcnn_pytorch_tpu.config import Options
    from faster_rcnn_pytorch_tpu.main import label_map_for

    index = CocoIndex(
        os.path.join(coco_root, "annotations", "instances_val2017.json")
    )
    opts = Options(data_type="coco", model_generation="legacy")
    label_map = label_map_for(opts, index)
    # 4-category index: slots 0..3 map to the real ids, the rest to -1
    table = [label_map(i) for i in range(80)]  # must not raise
    assert table[:4] == [1, 3, 18, 90]
    assert set(table[4:]) == {-1}
    assert -1 not in index.cat_ids


def test_make_shapes_coco_roundtrip(tmp_path):
    """The COCO shapes generator writes a tree both load paths consume."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from make_shapes_coco import write_split
    finally:
        sys.path.pop(0)

    ann = str(tmp_path / "annotations" / "instances_val2017.json")
    write_split(str(tmp_path / "val2017"), ann, n=3, seed=0)
    for contiguous in (True, False):
        recs, index = load_coco_records(
            str(tmp_path / "val2017"), ann, contiguous=contiguous
        )
        assert 1 <= len(recs) <= 3
        labels = np.concatenate([r.labels for r in recs])
        if contiguous:
            assert set(labels) <= {0, 1, 2}
        else:
            assert set(labels) <= {18, 44, 62}
        for r in recs:
            assert os.path.exists(r.image_path)
            assert (r.boxes[:, 2:] > r.boxes[:, :2]).all()


def test_resize_min_side_caps_max():
    img = np.zeros((100, 400, 3), np.uint8)
    out, boxes = resize_min_side(img, np.array([[0, 0, 400, 100]], np.float32), 800)
    assert max(out.shape[:2]) <= 1333
    np.testing.assert_allclose(
        boxes[0], [0, 0, out.shape[1], out.shape[0]], atol=1.5
    )


def test_hflip_involution():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (50, 70, 3), np.uint8)
    boxes = np.array([[10, 5, 30, 40]], np.float32)
    i2, b2 = hflip(*hflip(img, boxes))
    np.testing.assert_array_equal(i2, img)
    np.testing.assert_allclose(b2, boxes)


def test_normalize_range():
    img = np.full((4, 4, 3), 255, np.uint8)
    out = normalize(img)
    assert out.dtype == np.float32
    assert (out > 1.5).all()  # (1 - mean)/std > 1.5 for all channels


def test_center_crop_keeps_inside_boxes():
    from faster_rcnn_pytorch_tpu.data.transforms import center_crop

    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[40, 40, 60, 60], [0, 0, 5, 5]], np.float32)
    out, b, l = center_crop(img, boxes, np.array([1, 2]), 50, 50)
    assert out.shape == (50, 50, 3)
    assert len(b) == 1 and l[0] == 1
    np.testing.assert_allclose(b[0], [15, 15, 35, 35])


def test_random_pad_and_erasing():
    from faster_rcnn_pytorch_tpu.data.transforms import (
        random_erasing,
        random_pad,
    )

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 50, 3), np.uint8)
    out, boxes = random_pad(img, np.zeros((0, 4), np.float32), rs, 8)
    assert out.shape[0] >= 40 and out.shape[1] >= 50
    erased = random_erasing(img, np.random.RandomState(1), p=1.0)
    assert erased.shape == img.shape
    assert (erased != img).any()


def test_random_select_and_multiscale():
    from faster_rcnn_pytorch_tpu.data.transforms import RandomSelect

    rs = np.random.RandomState(2)
    a = lambda i, b, l, r: ("a", b, l)  # noqa: E731
    b_t = lambda i, b, l, r: ("b", b, l)  # noqa: E731
    sel = RandomSelect(a, b_t, p=0.5)
    seen = {sel(None, None, None, rs)[0] for _ in range(20)}
    assert seen == {"a", "b"}

    tf = TrainAugment(size=(48, 64, 96), max_size=128, hflip_prob=0.0)
    img = np.zeros((120, 90, 3), np.uint8)
    sizes = set()
    for s in range(10):
        out, _, _ = tf(img, np.zeros((0, 4), np.float32), np.zeros(0, np.int32),
                       np.random.RandomState(s))
        sizes.add(min(out.shape[:2]))
    assert len(sizes) > 1
    assert max(sizes) <= 96


def test_mosaic_output():
    rs = np.random.RandomState(3)
    items = []
    for _ in range(4):
        img = rs.randint(0, 255, (60, 90, 3), np.uint8)
        boxes = np.array([[5, 5, 40, 30]], np.float32)
        items.append((img, boxes, np.array([1], np.int32)))
    canvas, boxes, labels = load_mosaic(items, 128, rs)
    assert canvas.shape == (256, 256, 3)
    assert len(boxes) == len(labels)
    assert (boxes[:, 2:] <= 256).all() and (boxes[:, :2] >= 0).all()


def test_loader_batches(voc_root):
    recs = load_voc_records(voc_root, "trainval")
    loader = DetectionLoader(
        recs,
        TrainAugment(size=96, max_size=160),
        batch_size=2,
        size=96,
        max_size=160,
        max_gt=10,
        num_workers=2,
        seed=3,
    )
    batches = list(loader.epoch(0))
    assert batches
    for b in batches:
        assert b["image"].shape[0] == 2
        h, w = b["image"].shape[1:3]
        assert h % 16 == 0 and w % 16 == 0
        assert b["gt_boxes"].shape == (2, 10, 4)
        assert (b["extent"] <= 1.0 + 1e-6).all()
        m = b["gt_mask"]
        assert (b["gt_boxes"][m] <= 1.0).all() and (b["gt_boxes"][m] >= 0.0).all()


def test_loader_sharding(voc_root):
    recs = load_voc_records(voc_root, "trainval")
    ids = set()
    for shard in range(2):
        loader = DetectionLoader(
            recs,
            EvalTransform(size=96, max_size=160),
            batch_size=1,
            size=96,
            max_size=160,
            shuffle=False,
            num_workers=0,
            shard_id=shard,
            num_shards=2,
            drop_last=False,
        )
        for b in loader.epoch(0):
            ids.add(int(b["image_id"][0]))
    assert len(ids) == 6  # disjoint union covers the dataset


def test_loader_deterministic(voc_root):
    recs = load_voc_records(voc_root, "trainval")

    def run():
        loader = DetectionLoader(
            recs,
            TrainAugment(size=96, max_size=160),
            batch_size=2,
            size=96,
            max_size=160,
            num_workers=3,
            seed=11,
        )
        return [b["image"].sum() for b in loader.epoch(0)]

    assert run() == run()


def test_photometric_distort_contract():
    """All four jitters applied in random order (transforms_.py:38-58):
    output differs from input, dtype/shape preserved, seed-deterministic,
    different seeds give different orders/factors."""
    from faster_rcnn_pytorch_tpu.data.transforms import photometric_distort

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 50, 3), dtype=np.uint8)
    out1 = photometric_distort(img, np.random.RandomState(42))
    out2 = photometric_distort(img, np.random.RandomState(42))
    out3 = photometric_distort(img, np.random.RandomState(7))
    assert out1.shape == img.shape and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)  # deterministic per seed
    assert not np.array_equal(out1, img)  # jitter actually applied
    assert not np.array_equal(out1, out3)  # seed-dependent


def test_loader_process_workers_match_inline(voc_root):
    """The shared-memory process pipeline must yield byte-identical
    batches to the inline path, in the same order (this test box has 1
    core, where the worker cap would disable processes — patch it)."""
    from unittest import mock

    recs = load_voc_records(voc_root, "trainval")

    def make(nw):
        return DetectionLoader(
            recs,
            TrainAugment(size=96, max_size=160),
            batch_size=2,
            size=96,
            max_size=160,
            num_workers=nw,
            seed=11,
        )

    ref = list(make(0).epoch(0))
    with mock.patch("os.cpu_count", return_value=4):
        got = list(make(2).epoch(0))
    assert len(ref) == len(got) and len(ref) > 0
    for r, g in zip(ref, got):
        assert set(r) == set(g)
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k
            )


def test_loader_worker_death_raises_not_hangs(voc_root):
    """A worker killed without cleanup (OOM killer / native crash) can
    never deliver its batch; the consumer's bounded get + liveness check
    must surface a RuntimeError instead of blocking forever."""
    import os
    from unittest import mock

    recs = load_voc_records(voc_root, "trainval")
    loader = DetectionLoader(
        recs,
        TrainAugment(size=96, max_size=160),
        batch_size=2,
        size=96,
        max_size=160,
        num_workers=1,
        seed=11,
    )

    def die(self, *a, **k):
        os._exit(3)  # simulates SIGKILL: no exception, no queue put

    with mock.patch("os.cpu_count", return_value=4), mock.patch.object(
        DetectionLoader, "_make_batch_raw", die
    ):
        with pytest.raises(RuntimeError, match="died with exit"):
            list(loader.epoch(0))
