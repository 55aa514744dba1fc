"""Data-parallel SPMD training over the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model
from faster_rcnn_pytorch_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from faster_rcnn_pytorch_tpu.parallel.train_step import (
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from tests.test_model_forward import CANVAS, SMALL_LEGACY, make_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_lr_schedules():
    cos = make_lr_schedule("cosine", 1e-3, epochs=10, steps_per_epoch=100)
    assert np.isclose(float(cos(0)), 1e-3, rtol=1e-3)
    assert np.isclose(float(cos(1000)), 5e-5, rtol=1e-3)
    ms = make_lr_schedule(
        "multistep", 2e-3, epochs=26, steps_per_epoch=10, milestones=(16, 22)
    )
    assert np.isclose(float(ms(0)), 2e-3)
    assert np.isclose(float(ms(165)), 2e-4)
    assert np.isclose(float(ms(225)), 2e-5)
    warm = make_lr_schedule(
        "cosine", 1e-3, epochs=10, steps_per_epoch=100, warmup_epochs=1
    )
    assert float(warm(0)) < 2e-5
    assert np.isclose(float(warm(100)), 1e-3, rtol=1e-2)


@pytest.mark.slow
def test_dp_train_step_8way():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.normal(size=(1, CANVAS, CANVAS, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = model.init(jax.random.key(0), images, rois, method="init_all")

    sched = make_lr_schedule("cosine", 1e-3, epochs=2, steps_per_epoch=4)
    opt = make_optimizer(params, sched)
    state = replicate(init_train_state(params, opt), mesh)
    step = make_train_step(model, SMALL_LEGACY, opt, mesh)

    # Global batch of 8, one image per device.
    batch_np = make_batch(np.random.RandomState(1), b=n_dev)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}
    batch = shard_batch(batch, mesh)

    before = jax.tree.leaves(state.params)[0].copy()
    metrics = None
    for i in range(2):
        state, metrics = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    after = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_dp_matches_single_device_gradients():
    """The 8-way sharded loss must equal the replicated-computation loss."""
    mesh8 = make_mesh()
    mesh1 = make_mesh(num_devices=1)
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    rs = np.random.RandomState(2)
    images = jnp.asarray(rs.normal(size=(1, CANVAS, CANVAS, 3)), jnp.float32)
    rois = jnp.asarray(rs.uniform(0.2, 0.5, size=(1, 4, 4)), jnp.float32)
    params = model.init(jax.random.key(0), images, rois, method="init_all")
    sched = make_lr_schedule("constant", 1e-3, 1, 1)
    opt = make_optimizer(params, sched)

    batch_np = make_batch(np.random.RandomState(3), b=8)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}

    losses = []
    for mesh in (mesh8, mesh1):
        state = replicate(init_train_state(params, opt), mesh)
        step = make_train_step(model, SMALL_LEGACY, opt, mesh, donate=False)
        _, metrics = step(state, shard_batch(batch, mesh), jax.random.key(7))
        losses.append(float(metrics["loss"]))
    assert np.isclose(losses[0], losses[1], rtol=2e-4)
