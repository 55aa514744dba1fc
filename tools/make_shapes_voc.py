"""Generate a synthetic VOC-format shapes-detection dataset.

Real VOC/COCO data cannot be mounted in this image (no egress), so the
end-to-end accuracy demonstration uses generated scenes: colored
rectangles / ellipses / triangles on textured backgrounds, with exact
VOC XML annotations (the reference's XML contract incl. the +1 pixel
convention, datasets/voc_dataset.py:218-253). Driving the unmodified
train CLI on this tree exercises the full product path — decode,
transforms, canvas batching, SPMD train step, eval, VOC mAP — and the
resulting AP50 is direct evidence the framework trains a working
detector from scratch.

Run: python tools/make_shapes_voc.py [root] [n_train] [n_test] [--classes20]

``--classes20`` maps 20 distinguishable categories (4 shapes x 5 color
bins) onto ALL 20 VOC class names. The dual-stack parity drill
(tools/dualstack_parity.py) needs this: the reference's voc_eval indexes
predicted labels into the sorted set of class names found in the test
XMLs (evaluation/voc_eval.py:104-110), so the test set must contain the
full VOC class universe for a stock 21-class model's labels to map the
way they do on real VOC.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image, ImageDraw

# Shape classes are mapped onto three VOC class names so the stock
# 21-class VOC label map applies unchanged.
CLASSES = ("bottle", "chair", "dog")  # rectangle, ellipse, triangle
# 20-class mode: VOC's class list IS alphabetically sorted, so index i
# here == index i in the reference voc_eval's sorted(gt_classes).
CLASSES20 = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
# class -> (shape, color bin): shape = cls % 4, color = cls // 4
COLOR_BINS = (
    (220, 40, 40), (40, 200, 40), (60, 80, 230), (230, 220, 40),
    (200, 50, 210),
)
SIZE = 320

XML_OBJ = """  <object><name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
"""


def _background(rs: np.random.RandomState) -> Image.Image:
    base = rs.randint(30, 120, size=3)
    grad = np.linspace(0, rs.randint(20, 80), SIZE)
    img = np.zeros((SIZE, SIZE, 3), np.float32) + base
    img += grad[None, :, None] if rs.rand() < 0.5 else grad[:, None, None]
    img += rs.normal(0, 8, size=(SIZE, SIZE, 3))
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def _draw_shape(draw: ImageDraw.ImageDraw, cls: int, box, color) -> None:
    x1, y1, x2, y2 = box
    if cls == 0:
        draw.rectangle([x1, y1, x2, y2], fill=color)
    elif cls == 1:
        draw.ellipse([x1, y1, x2, y2], fill=color)
    elif cls == 2:
        draw.polygon(
            [((x1 + x2) // 2, y1), (x1, y2), (x2, y2)], fill=color
        )
    else:  # diamond (20-class mode's fourth shape)
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        draw.polygon(
            [(cx, y1), (x2, cy), (cx, y2), (x1, cy)], fill=color
        )


def make_image(
    rs: np.random.RandomState,
    classes20: bool = False,
    force_cls: int | None = None,
):
    img = _background(rs)
    draw = ImageDraw.Draw(img)
    n = rs.randint(1, 5)
    boxes, labels = [], []
    for _ in range(n):
        w = rs.randint(48, 161)
        h = rs.randint(48, 161)
        x1 = rs.randint(0, SIZE - w)
        y1 = rs.randint(0, SIZE - h)
        box = (x1, y1, x1 + w, y1 + h)
        # reject heavy overlap with existing shapes (keeps gt unambiguous)
        if any(
            max(0, min(box[2], b[2]) - max(box[0], b[0]))
            * max(0, min(box[3], b[3]) - max(box[1], b[1]))
            > 0.3 * w * h
            for b in boxes
        ):
            continue
        if classes20:
            # image i's first object carries class i % 20, so every
            # class is present in any split of >= 20 images (the
            # reference voc_eval's class universe comes from test GT).
            cls = (
                force_cls
                if force_cls is not None and not boxes
                else rs.randint(len(CLASSES20))
            )
            base = np.array(COLOR_BINS[cls // 4], np.int32)
            color = tuple(
                int(c) for c in np.clip(
                    base + rs.randint(-25, 26, size=3), 0, 255
                )
            )
            _draw_shape(draw, cls % 4, box, color)
        else:
            cls = rs.randint(len(CLASSES))
            color = tuple(int(c) for c in rs.randint(140, 256, size=3))
            _draw_shape(draw, cls, box, color)
        boxes.append(box)
        labels.append(cls)
    return img, boxes, labels


def write_split(
    split_dir: str, n: int, seed: int, classes20: bool = False
) -> None:
    ann = os.path.join(split_dir, "Annotations")
    jpg = os.path.join(split_dir, "JPEGImages")
    os.makedirs(ann, exist_ok=True)
    os.makedirs(jpg, exist_ok=True)
    names = CLASSES20 if classes20 else CLASSES
    rs = np.random.RandomState(seed)
    for i in range(n):
        img, boxes, labels = make_image(
            rs, classes20, force_cls=(i % 20) if classes20 else None
        )
        name = f"im{i:05d}"
        img.save(os.path.join(jpg, name + ".jpg"), quality=92)
        objs = "".join(
            # VOC XML stores 1-based inclusive coords; the parser
            # subtracts 1 (reference datasets/voc_dataset.py:232-239)
            XML_OBJ.format(
                name=names[c], x1=b[0] + 1, y1=b[1] + 1, x2=b[2], y2=b[3]
            )
            for b, c in zip(boxes, labels)
        )
        xml = (
            "<annotation>\n"
            f"  <size><width>{SIZE}</width><height>{SIZE}</height>"
            "<depth>3</depth></size>\n" + objs + "</annotation>"
        )
        with open(os.path.join(ann, name + ".xml"), "w") as f:
            f.write(xml)


def main():
    args = [a for a in sys.argv[1:] if a != "--classes20"]
    classes20 = "--classes20" in sys.argv[1:]
    root = args[0] if len(args) > 0 else "/tmp/shapes_voc"
    n_train = int(args[1]) if len(args) > 1 else 800
    n_test = int(args[2]) if len(args) > 2 else 160
    write_split(
        os.path.join(root, "VOCtrainval_2007", "VOCdevkit", "VOC2007"),
        n_train,
        seed=0,
        classes20=classes20,
    )
    write_split(
        os.path.join(root, "VOCtest_2007", "VOCdevkit", "VOC2007"),
        n_test,
        seed=1,
        classes20=classes20,
    )
    kind = "20-class" if classes20 else "3-class"
    print(
        f"wrote {n_train} train / {n_test} test {kind} shape scenes to {root}"
    )


if __name__ == "__main__":
    main()
