"""Data-parallel SPMD training over the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model
from faster_rcnn_pytorch_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    shard_tree,
    tree_shardings,
)
from faster_rcnn_pytorch_tpu.parallel.train_step import (
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from faster_rcnn_pytorch_tpu.models.faster_rcnn import LEGACY_CONFIG

# Dry-run-sized config: CPU XLA compiles the 8-way SPMD step in minutes at
# canvas 160 but well under one at canvas 96 with small proposal budgets.
TINY_CANVAS = 64
TINY_LEGACY = dataclasses.replace(
    LEGACY_CONFIG,
    num_classes=6,
    pre_nms_train=64,
    post_nms_train=16,
    pre_nms_test=32,
    post_nms_test=8,
    roi_samples=8,
    roi_pos_quota=2,
    max_detections=8,
)


def tiny_batch(rs, b):
    images = rs.normal(size=(b, TINY_CANVAS, TINY_CANVAS, 3)).astype(np.float32)
    extents = np.tile(
        np.array([[1.0, 1.0], [0.8, 0.9]], np.float32), (-(-b // 2), 1)
    )[:b]
    xy1 = rs.uniform(0, 0.5, size=(b, 4, 2))
    wh = rs.uniform(0.1, 0.4, size=(b, 4, 2))
    boxes = np.concatenate([xy1, np.minimum(xy1 + wh, 0.99)], -1).astype(np.float32)
    labels = rs.randint(0, 5, size=(b, 4)).astype(np.int32)
    mask = np.ones((b, 4), bool)
    return images, extents, boxes, labels, mask


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
def test_dp_train_step_and_parity():
    """8-way SPMD step runs, updates params, and its global-batch loss
    matches the single-device computation (DDP-equivalence check)."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import init_detector_params

    mesh8 = make_mesh()
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)
    sched = make_lr_schedule("constant", 1e-3, 1, 1)
    opt = make_optimizer(params, sched)

    batch_np = tiny_batch(np.random.RandomState(3), b=8)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}

    state8 = replicate(init_train_state(params, opt), mesh8)
    step8 = make_train_step(model, TINY_LEGACY, opt, mesh8, donate=False)
    before = np.asarray(jax.tree.leaves(state8.params)[0]).copy()
    new_state, metrics8 = step8(state8, shard_batch(batch, mesh8), jax.random.key(7))
    new_state, metrics8b = step8(new_state, shard_batch(batch, mesh8), jax.random.key(8))
    assert np.isfinite(float(metrics8["loss"]))
    assert int(new_state.step) == 2
    after = np.asarray(jax.tree.leaves(new_state.params)[0])
    assert not np.allclose(before, after)

    mesh1 = make_mesh(num_devices=1)
    state1 = replicate(init_train_state(params, opt), mesh1)
    step1 = make_train_step(model, TINY_LEGACY, opt, mesh1, donate=False)
    _, metrics1 = step1(state1, shard_batch(batch, mesh1), jax.random.key(7))
    assert np.isclose(float(metrics8["loss"]), float(metrics1["loss"]), rtol=2e-4)


def test_tree_shardings_megatron_pair():
    """(data, model) mesh: fc6 is column-parallel, fc7 row-parallel,
    everything else replicated; a data-only mesh replicates everything."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import init_detector_params

    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)

    mesh = make_mesh(model_parallel=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, MODEL_AXIS: 2,
    }
    shardings = tree_shardings(params, mesh)
    flat = {
        "/".join(str(getattr(q, "key", q)) for q in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    assert flat["params/fc6/kernel"].spec == (None, MODEL_AXIS)
    assert flat["params/fc6/bias"].spec == (MODEL_AXIS,)
    assert flat["params/fc7/kernel"].spec == (MODEL_AXIS, None)
    assert flat["params/cls_head/kernel"].spec == ()
    # placement sanity: the sharded fc6 kernel is split over model groups
    placed = shard_tree(params, mesh)
    fc6 = placed["params"]["fc6"]["kernel"]
    assert fc6.sharding.spec == (None, MODEL_AXIS)
    shard_shape = fc6.addressable_shards[0].data.shape
    assert shard_shape[1] == fc6.shape[1] // 2

    mesh_dp = make_mesh()
    flat_dp = jax.tree.leaves(tree_shardings(params, mesh_dp))
    assert all(s.spec == () for s in flat_dp)


@pytest.mark.slow
def test_tp_train_step_parity():
    """dp4 x tp2 train step (Megatron-sharded head FCs) runs and its
    loss matches the single-device computation."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import init_detector_params

    mesh = make_mesh(model_parallel=2)
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)
    sched = make_lr_schedule("constant", 1e-3, 1, 1)
    opt = make_optimizer(params, sched)

    batch_np = tiny_batch(np.random.RandomState(3), b=8)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}

    state = shard_tree(init_train_state(params, opt), mesh)
    step = make_train_step(
        model, TINY_LEGACY, opt, mesh, donate=False,
        state_shardings=tree_shardings(state, mesh),
    )
    state, metrics = step(state, shard_batch(batch, mesh), jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))
    # updated fc6 stays sharded through the step (no silent regather)
    fc6 = state.params["params"]["fc6"]["kernel"]
    assert fc6.sharding.spec == (None, MODEL_AXIS)

    mesh1 = make_mesh(num_devices=1)
    state1 = replicate(init_train_state(params, opt), mesh1)
    step1 = make_train_step(model, TINY_LEGACY, opt, mesh1, donate=False)
    _, metrics1 = step1(state1, shard_batch(batch, mesh1), jax.random.key(7))
    assert np.isclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-4
    )


@pytest.mark.slow
def test_dp_fpn_train_step():
    """8-way SPMD FPN train step (ResNet50-FPN + MultiScaleRoIAlign with
    its custom dense VJP + oversize cond) compiles and runs under the
    mesh: finite loss, params update."""
    import dataclasses as dc

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        FPN_CONFIG,
        init_detector_params,
    )

    tiny_fpn = dc.replace(
        FPN_CONFIG,
        num_classes=6,
        pre_nms_train=64,
        post_nms_train=16,
        pre_nms_test=32,
        post_nms_test=8,
        roi_samples=8,
        roi_pos_quota=2,
        max_detections=8,
    )
    mesh8 = make_mesh()
    model, _ = build_model("fpn", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)
    sched = make_lr_schedule("constant", 1e-3, 1, 1)
    opt = make_optimizer(params, sched)

    batch_np = tiny_batch(np.random.RandomState(5), b=8)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}

    state = replicate(init_train_state(params, opt), mesh8)
    step = make_train_step(model, tiny_fpn, opt, mesh8, donate=False)
    before = [np.asarray(x).copy() for x in jax.tree.leaves(state.params)]
    state, metrics = step(state, shard_batch(batch, mesh8), jax.random.key(11))
    assert np.isfinite(float(metrics["loss"]))
    after = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    # Frozen-BN stats/affines and frozen stages (conv1+layer1,
    # trainable_layers=3) legitimately stay put — that's ~220 of the 295
    # leaves; the trainable convs + FPN neck + heads (~72) must all move.
    changed = sum(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed >= 60


@pytest.mark.slow
def test_msra_batch_partitioned_over_mesh():
    """multiscale_roi_align_batch fwd+grad under an 8-device data mesh:
    the custom_partitioning rule must shard the batch dim (no
    all-gather of the feature operands in the compiled HLO) and match
    the unsharded single-device result — for both the XLA gather path
    and the Pallas kernel (interpret) path."""
    import importlib
    import os

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ra = importlib.import_module("faster_rcnn_pytorch_tpu.ops.roi_align")
    strides = (4, 8, 16, 32)
    rs = np.random.RandomState(3)
    b, n = 8, 12
    feats = tuple(
        jnp.asarray(rs.normal(size=(b, s, s, 128)).astype(np.float32) * 0.1)
        for s in (32, 16, 8, 4)
    )
    xy1 = rs.uniform(0, 80, size=(b, n - 2, 2))
    wh = np.exp(rs.uniform(np.log(4), np.log(120), size=(b, n - 2, 2)))
    r = np.concatenate([xy1, xy1 + wh], axis=-1)
    extremes = np.tile(
        np.array([[[0, 0, 127, 6], [0, 0, 900, 900]]], np.float32), (b, 1, 1)
    )
    rois = jnp.asarray(
        np.concatenate([r, extremes], axis=1).astype(np.float32)
    )
    g = jnp.asarray(rs.normal(size=(b, n, 7, 7, 128)).astype(np.float32))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    fsh = NamedSharding(mesh, P("data", None, None, None))
    rsh = NamedSharding(mesh, P("data", None, None))
    gsh = NamedSharding(mesh, P("data", None, None, None, None))

    def val_and_dfeat(f, r2, g2):
        def loss(f2):
            out = ra.multiscale_roi_align_batch(f2, r2, strides, 7, 2)
            return (out.astype(jnp.float32) * g2).sum()

        return jax.value_and_grad(loss)(f)

    # Single-device reference through the dense formulation's autodiff.
    def ref_loss(f):
        out = jax.vmap(
            lambda f2, r2: ra.multiscale_roi_align_dense(f2, r2, strides)
        )(f, rois)
        return (out.astype(jnp.float32) * g).sum()

    want_v, want_df = jax.value_and_grad(ref_loss)(feats)

    for env in ("0", "interpret"):
        old = os.environ.get("FRT_ALIGN_KERNEL")
        os.environ["FRT_ALIGN_KERNEL"] = env
        jax.clear_caches()  # env is read at trace time
        try:
            jitted = jax.jit(
                val_and_dfeat,
                in_shardings=((fsh,) * 4, rsh, gsh),
            )
            lowered = jitted.lower(feats, rois, g)
            hlo = lowered.compile().as_text()
            assert "all-gather" not in hlo and "all_gather" not in hlo, (
                f"feature operands gathered under the mesh (env={env})"
            )
            got_v, got_df = jitted(feats, rois, g)
        finally:
            if old is None:
                os.environ.pop("FRT_ALIGN_KERNEL", None)
            else:
                os.environ["FRT_ALIGN_KERNEL"] = old
        np.testing.assert_allclose(
            float(got_v), float(want_v), rtol=2e-4,
            err_msg=f"env={env}",
        )
        for got_l, want_l in zip(got_df, want_df):
            np.testing.assert_allclose(
                np.asarray(got_l), np.asarray(want_l), atol=3e-4, rtol=2e-4,
                err_msg=f"env={env}",
            )


def test_roi_pool_batch_partitioned_over_mesh():
    """roi_pool_batch fwd+grad under an 8-device data mesh: sharded
    batch dim, no all-gather, matches the unsharded vmapped roi_pool."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from faster_rcnn_pytorch_tpu.ops.roi_pool import (
        roi_pool_batch,
        roi_pool_lax,
    )

    rs = np.random.RandomState(9)
    b, n, h, w, c = 8, 6, 20, 24, 16
    feats = jnp.asarray(rs.normal(size=(b, h, w, c)).astype(np.float32))
    x1 = rs.uniform(0, w - 3, size=(b, n, 1))
    y1 = rs.uniform(0, h - 3, size=(b, n, 1))
    x2 = np.minimum(x1 + rs.uniform(1, 12, size=(b, n, 1)), w - 1)
    y2 = np.minimum(y1 + rs.uniform(1, 10, size=(b, n, 1)), h - 1)
    rois = jnp.asarray(
        np.concatenate([x1, y1, x2, y2], -1).astype(np.float32)
    )
    g = jnp.asarray(rs.normal(size=(b, n, 7, 7, c)).astype(np.float32))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    fsh = NamedSharding(mesh, P("data", None, None, None))
    rsh = NamedSharding(mesh, P("data", None, None))
    gsh = NamedSharding(mesh, P("data", None, None, None, None))

    def val_and_dfeat(f, r2, g2):
        def loss(f2):
            out = roi_pool_batch(f2, r2, 1.0, 7)
            return (out.astype(jnp.float32) * g2).sum()

        return jax.value_and_grad(loss)(f)

    jitted = jax.jit(val_and_dfeat, in_shardings=(fsh, rsh, gsh))
    hlo = jitted.lower(feats, rois, g).compile().as_text()
    assert "all-gather" not in hlo and "all_gather" not in hlo
    got_v, got_df = jitted(feats, rois, g)

    def ref_loss(f):
        out = jax.vmap(lambda f2, r2: roi_pool_lax(f2, r2, 1.0, 7))(f, rois)
        return (out.astype(jnp.float32) * g).sum()

    want_v, want_df = jax.value_and_grad(ref_loss)(feats)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_df), np.asarray(want_df), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_remat_backbone_matches_no_remat():
    """--remat_backbone must be numerics-transparent: same loss, same
    gradients (recompute executes the identical ops), different only in
    what the backward saves."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        forward_train,
        init_detector_params,
    )

    rs = np.random.RandomState(7)
    images, extents, boxes, labels, mask = tiny_batch(rs, 2)
    args = (
        jnp.asarray(images),
        jnp.asarray(extents),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.asarray(mask),
    )

    outs = []
    for remat in (False, True):
        model, _ = build_model(
            "legacy", num_classes=6, dtype=jnp.float32, remat=remat
        )
        params = init_detector_params(
            model, jax.random.key(0), canvas=TINY_CANVAS
        )

        def loss_fn(p):
            out = model.apply(
                p, TINY_LEGACY, *args, jax.random.key(1),
                method=forward_train,
            )
            return out.losses.total

        val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        outs.append((float(val), grads))

    (v0, g0), (v1, g1) = outs
    # Tight but not exact: two separately jitted programs; XLA may
    # reorder loss-sum reductions under a different remat schedule.
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_remat_fpn_backbone_matches_no_remat():
    """FPN generation: per-bottleneck remat (ResNet50 blocks recomputed
    in the backward) must leave loss and gradients unchanged."""
    import dataclasses as dc

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        FPN_CONFIG,
        forward_train,
        init_detector_params,
    )

    tiny_fpn = dc.replace(
        FPN_CONFIG,
        num_classes=6,
        pre_nms_train=64,
        post_nms_train=16,
        pre_nms_test=32,
        post_nms_test=8,
        roi_samples=8,
        roi_pos_quota=2,
        max_detections=8,
    )
    rs = np.random.RandomState(9)
    images, extents, boxes, labels, mask = tiny_batch(rs, 2)
    args = (
        jnp.asarray(images),
        jnp.asarray(extents),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.asarray(mask),
    )

    outs = []
    for remat in (False, True):
        model, _ = build_model(
            "fpn", num_classes=6, dtype=jnp.float32, remat=remat
        )
        params = init_detector_params(
            model, jax.random.key(0), canvas=TINY_CANVAS
        )

        def loss_fn(p):
            out = model.apply(
                p, tiny_fpn, *args, jax.random.key(1),
                method=forward_train,
            )
            return out.losses.total

        val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        outs.append((float(val), grads))

    (v0, g0), (v1, g1) = outs
    # Tight but not exact: two separately jitted programs; XLA may
    # reorder loss-sum reductions under a different remat schedule.
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_grad_accum_matches_manual_micro_mean():
    """--grad_accum 2: one step equals the mean of the two micro-batch
    gradients (micro i = batch[i::2], rng = split(rng, 2)[i]) fed through
    the same optimizer update."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        forward_train,
        init_detector_params,
    )

    mesh1 = make_mesh(num_devices=1)
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=TINY_CANVAS)
    sched = make_lr_schedule("constant", 1e-3, 1, 1)
    opt = make_optimizer(params, sched)

    batch_np = tiny_batch(np.random.RandomState(11), b=4)
    keys = ["image", "extent", "gt_boxes", "gt_labels", "gt_mask"]
    batch = {k: np.asarray(v) for k, v in zip(keys, batch_np)}
    rng = jax.random.key(21)

    state = replicate(init_train_state(params, opt), mesh1)
    step = make_train_step(
        model, TINY_LEGACY, opt, mesh1, donate=False, grad_accum=2
    )
    new_state, metrics = step(state, shard_batch(batch, mesh1), rng)
    assert int(new_state.step) == 1

    def loss_fn(p, mb, r):
        out = model.apply(
            p,
            TINY_LEGACY,
            mb["image"],
            mb["extent"],
            mb["gt_boxes"],
            mb["gt_labels"],
            mb["gt_mask"],
            r,
            method=forward_train,
        )
        return out.losses.total

    rngs = jax.random.split(rng, 2)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    losses, grads = [], []
    for i in range(2):
        micro = {k: v[i::2] for k, v in batch.items()}
        v, g = vg(params, {k: jnp.asarray(x) for k, x in micro.items()}, rngs[i])
        losses.append(float(v))
        grads.append(g)
    mean_grads = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = opt.update(mean_grads, state.opt_state, params)
    import optax

    expected = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(losses), rtol=1e-6
    )
    for got, want in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(expected)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
        )
