"""Generate a synthetic COCO-format shapes-detection dataset.

COCO twin of ``make_shapes_voc.py`` (same generated scenes): writes the
standard COCO layout the loader expects (data/loader.py:541-547) —
``train2017/ val2017/ annotations/instances_*.json`` — with real COCO
category ids (dog=18, bottle=44, chair=62), so both model generations
consume it through the unmodified train CLI: the legacy generation's
contiguous remap (datasets/coco_dataset.py:124-128 semantics) and the
FPN generation's raw-id path. Driving a full train+eval run on this
tree is the end-to-end exercise of the COCO-protocol evaluator (the
VOC-format twin exercises the VOC AP path).

Run: python tools/make_shapes_coco.py [root] [n_train] [n_test]
"""

from __future__ import annotations

import json
import os
import sys

from make_shapes_voc import CLASSES, SIZE, make_image

import numpy as np

# Shape class index (rectangle, ellipse, triangle) -> real COCO id.
COCO_IDS = {"bottle": 44, "chair": 62, "dog": 18}
CATEGORIES = [
    {"id": COCO_IDS[name], "name": name, "supercategory": "shape"}
    for name in sorted(COCO_IDS, key=COCO_IDS.get)
]


def write_split(img_dir: str, ann_path: str, n: int, seed: int) -> None:
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.dirname(ann_path), exist_ok=True)
    rs = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        img, boxes, labels = make_image(rs)
        file_name = f"{i:012d}.jpg"
        img.save(os.path.join(img_dir, file_name), quality=92)
        images.append(
            {"id": i + 1, "file_name": file_name, "width": SIZE, "height": SIZE}
        )
        for (x1, y1, x2, y2), c in zip(boxes, labels):
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": COCO_IDS[CLASSES[c]],
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "area": float((x2 - x1) * (y2 - y1)),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    with open(ann_path, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": CATEGORIES},
            f,
        )


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shapes_coco"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    ann = os.path.join(root, "annotations")
    write_split(
        os.path.join(root, "train2017"),
        os.path.join(ann, "instances_train2017.json"),
        n_train,
        seed=0,
    )
    write_split(
        os.path.join(root, "val2017"),
        os.path.join(ann, "instances_val2017.json"),
        n_test,
        seed=1,
    )
    print(f"wrote {n_train} train / {n_test} val shape scenes to {root}")


if __name__ == "__main__":
    main()
