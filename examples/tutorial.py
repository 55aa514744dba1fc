"""End-to-end single-image inference walkthrough.

Counterpart of the reference's ``frcnn_tutorial.py``: build the flagship
VGG16 detector, load weights (a converted torch ``.pth.tar``, a framework
``.ckpt``, or fresh-initialised if neither is given), run ``predict`` on
one image and draw the detections.

    python examples/tutorial.py [image.jpg] [checkpoint]
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

# Runnable without installation: `python examples/tutorial.py` puts
# examples/ (not the repo root) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_rcnn_pytorch_tpu.data.loader import load_image
from faster_rcnn_pytorch_tpu.data.transforms import normalize, resize_min_side
from faster_rcnn_pytorch_tpu.data.visualize import draw_boxes_matplotlib
from faster_rcnn_pytorch_tpu.data.voc import VOC_CLASSES
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    init_detector_params,
    predict,
)


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    ckpt_path = sys.argv[2] if len(sys.argv) > 2 else None

    # 1. model + params
    model, cfg = build_model("legacy", num_classes=21)
    if ckpt_path and ckpt_path.endswith((".pth", ".pth.tar")):
        from faster_rcnn_pytorch_tpu.utils.checkpoint import (
            import_legacy_torch_params,
            load_torch_state_dict,
        )

        params = import_legacy_torch_params(load_torch_state_dict(ckpt_path), 21)
        print(f"imported torch checkpoint {ckpt_path}")
    else:
        params = init_detector_params(model, jax.random.key(0))
        print("using fresh-initialised params (random detections expected)")

    # 2. image -> padded canvas
    if image_path:
        raw = load_image(image_path)
    else:
        rs = np.random.RandomState(0)
        raw = rs.randint(0, 255, (480, 640, 3), np.uint8)
        print("no image given; using random noise")
    resized, _ = resize_min_side(raw, np.zeros((0, 4), np.float32), 800)
    h, w = resized.shape[:2]
    ch, cw = -(-h // 16) * 16, -(-w // 16) * 16
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:h, :w] = normalize(resized)
    extent = np.array([[w / cw, h / ch]], np.float32)

    # 3. jitted predict
    det = jax.jit(
        lambda p, im, e: model.apply(p, cfg, im, e, 0.5, method=predict)
    )(params, jnp.asarray(canvas[None]), jnp.asarray(extent))

    valid = np.asarray(det.valid[0])
    boxes = np.asarray(det.boxes[0])[valid] * np.array([cw, ch, cw, ch])
    boxes = boxes / np.array([w, h, w, h]) * np.array(
        [raw.shape[1], raw.shape[0], raw.shape[1], raw.shape[0]]
    )
    labels = np.asarray(det.labels[0])[valid]
    scores = np.asarray(det.scores[0])[valid]
    print(f"{valid.sum()} detections")
    for b, l, s in zip(boxes, labels, scores):
        print(f"  {VOC_CLASSES[l]:12s} {s:.2f} {b.round(1)}")

    draw_boxes_matplotlib(
        raw, boxes, labels, VOC_CLASSES, scores, save_path="tutorial_out.png"
    )
    print("wrote tutorial_out.png")


if __name__ == "__main__":
    main()
