"""End-to-end training integration: the full loop (loader-style batches ->
SPMD train step -> losses) must reduce the loss on a tiny synthetic
detection problem, and the predict path must run from trained params.

The counterpart of the reference's only integration signal ("does mAP
reproduce", SURVEY.md §4.3) at a scale that runs on the CPU backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    init_detector_params,
    predict,
)
from faster_rcnn_pytorch_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from faster_rcnn_pytorch_tpu.parallel.train_step import (
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from tests.test_parallel import TINY_CANVAS, TINY_LEGACY, tiny_batch


def synthetic_batch(rs, b):
    """Images with one bright square; gt box covers it, class 1."""
    images = rs.normal(size=(b, TINY_CANVAS, TINY_CANVAS, 3)).astype(np.float32) * 0.1
    boxes = np.zeros((b, 4, 4), np.float32)
    labels = np.zeros((b, 4), np.int32)
    mask = np.zeros((b, 4), bool)
    for i in range(b):
        s = TINY_CANVAS
        x1, y1 = rs.randint(4, s // 2, size=2)
        w, h = rs.randint(s // 4, s // 2, size=2)
        x2, y2 = min(x1 + w, s - 2), min(y1 + h, s - 2)
        images[i, y1:y2, x1:x2, :] += 2.0
        boxes[i, 0] = [x1 / s, y1 / s, x2 / s, y2 / s]
        labels[i, 0] = 1
        mask[i, 0] = True
    extents = np.ones((b, 2), np.float32)
    return images, extents, boxes, labels, mask


@pytest.mark.slow
def test_training_reduces_loss_and_predict_runs():
    mesh = make_mesh(num_devices=1)
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)

    sched = make_lr_schedule("constant", 2e-3, 1, 1)
    opt = make_optimizer(params, sched, weight_decay=1e-4)
    state = replicate(init_train_state(params, opt), mesh)
    step = make_train_step(model, TINY_LEGACY, opt, mesh)

    rs = np.random.RandomState(0)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batches = []
    for _ in range(4):
        vals = synthetic_batch(rs, 2)
        batches.append(
            shard_batch({k: v for k, v in zip(keys, vals)}, mesh)
        )

    losses = []
    for i in range(24):
        state, metrics = step(state, batches[i % 4], jax.random.key(i))
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert np.isfinite(losses).all()
    assert last < first, (first, last)

    # Predict runs from the trained params and emits well-formed output.
    images, extents, *_ = synthetic_batch(rs, 2)
    det = model.apply(
        state.params,
        TINY_LEGACY,
        jnp.asarray(images),
        jnp.asarray(extents),
        method=predict,
    )
    assert np.isfinite(np.asarray(det.scores)).all()
    assert det.boxes.shape[0] == 2
