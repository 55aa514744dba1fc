"""Checkpoint save/resume + torch-checkpoint importer numerics.

torch (CPU) is available in this image, so the layout conversions are
verified numerically: OIHW->HWIO conv kernels against
``torch.nn.functional.conv2d``, and the channel-major pool-flatten
permutation against a real torch Linear.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch
import torch.nn.functional as F

from faster_rcnn_pytorch_tpu.utils import checkpoint as ck


def test_save_load_roundtrip(tmp_path):
    state = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": {"c": np.ones(4, np.int32)},
    }
    path = str(tmp_path / "x.ckpt")
    ck.save_checkpoint(path, state, metadata={"epoch": 3})
    loaded, meta = ck.load_checkpoint(path, state)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(loaded["a"], state["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], state["b"]["c"])


def test_checkpoint_path_naming():
    p = ck.checkpoint_path("./logs", "frcnn", 7)
    assert p.endswith("logs/frcnn/saves/frcnn.7.ckpt")
    assert ck.checkpoint_path("./logs", "frcnn", "best").endswith("frcnn.best.ckpt")


def test_conv_conversion_matches_torch():
    rs = np.random.RandomState(0)
    w = rs.normal(size=(8, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rs.normal(size=(8,)).astype(np.float32)
    x = rs.normal(size=(1, 3, 10, 12)).astype(np.float32)  # NCHW

    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()

    kernel = ck._conv(w)  # HWIO
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_pool_flatten_permutation_matches_torch():
    rs = np.random.RandomState(1)
    ch, pool, out = 6, 7, 5
    w = rs.normal(size=(out, ch * pool * pool)).astype(np.float32)
    feat = rs.normal(size=(ch, pool, pool)).astype(np.float32)  # CHW

    want = torch.from_numpy(feat).flatten() @ torch.from_numpy(w).T

    kernel = ck._linear_from_pool(w, ch=ch, pool=pool)  # [p*p*ch, out]
    feat_hwc = feat.transpose(1, 2, 0).reshape(-1)  # our NHWC flatten
    got = feat_hwc @ kernel
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)


def _fake_legacy_state_dict(rs, num_classes=21):
    from faster_rcnn_pytorch_tpu.models.vgg import (
        TORCH_VGG16_CONV_INDICES,
        VGG16_STAGES,
    )

    sd = {}
    chans = []
    for ch, layers in VGG16_STAGES:
        chans += [ch] * layers
    in_ch = 3
    for idx, out_ch in zip(TORCH_VGG16_CONV_INDICES, chans):
        sd[f"extractor.{idx}.weight"] = rs.normal(
            size=(out_ch, in_ch, 3, 3)
        ).astype(np.float32) * 0.05
        sd[f"extractor.{idx}.bias"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    for name, (o, i, k) in {
        "rpn.inter_layer": (512, 512, 3),
        "rpn.cls_layer": (18, 512, 1),
        "rpn.reg_layer": (36, 512, 1),
    }.items():
        sd[f"{name}.weight"] = rs.normal(size=(o, i, k, k)).astype(np.float32) * 0.01
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    sd["classifier.0.weight"] = rs.normal(size=(4096, 25088)).astype(np.float32) * 0.01
    sd["classifier.0.bias"] = np.zeros(4096, np.float32)
    sd["classifier.2.weight"] = rs.normal(size=(4096, 4096)).astype(np.float32) * 0.01
    sd["classifier.2.bias"] = np.zeros(4096, np.float32)
    sd["fast_rcnn_head.cls_head.weight"] = rs.normal(
        size=(num_classes, 4096)
    ).astype(np.float32) * 0.01
    sd["fast_rcnn_head.cls_head.bias"] = np.zeros(num_classes, np.float32)
    sd["fast_rcnn_head.reg_head.weight"] = rs.normal(
        size=(num_classes * 4, 4096)
    ).astype(np.float32) * 0.001
    sd["fast_rcnn_head.reg_head.bias"] = np.zeros(num_classes * 4, np.float32)
    return sd


@pytest.mark.slow
def test_legacy_import_produces_usable_params():
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import build_model, predict
    import dataclasses
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import LEGACY_CONFIG

    rs = np.random.RandomState(2)
    sd = _fake_legacy_state_dict(rs)
    params = ck.import_legacy_torch_params(sd, num_classes=21)

    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    cfg = dataclasses.replace(
        LEGACY_CONFIG,
        pre_nms_test=64,
        post_nms_test=16,
        max_detections=8,
    )
    images = jnp.asarray(rs.normal(size=(1, 160, 160, 3)), jnp.float32)
    extents = jnp.ones((1, 2), jnp.float32)
    det = model.apply(params, cfg, images, extents, method=predict)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_module_prefix_stripped():
    sd = {"module.extractor.0.weight": np.zeros((2, 2))}
    out = ck._strip_module(sd)
    assert "extractor.0.weight" in out


def test_orbax_roundtrip_and_autodetect(tmp_path):
    """Orbax backend: directory checkpoint + metadata sidecar; loads are
    auto-detected by path type, and re-saving an epoch slot rotates the
    old directory."""
    state = {
        "p": np.arange(8, dtype=np.float32).reshape(2, 4),
        "opt": {"mu": jnp.ones((3,), jnp.float32)},
    }
    path = str(tmp_path / "m.0.ckpt")
    ck.save_checkpoint(path, state, metadata={"epoch": 0}, backend="orbax")
    assert os.path.isdir(path)
    loaded, meta = ck.load_checkpoint(path, state)
    assert meta == {"epoch": 0}
    np.testing.assert_array_equal(np.asarray(loaded["p"]), state["p"])
    np.testing.assert_array_equal(np.asarray(loaded["opt"]["mu"]), 1.0)

    # overwrite same slot with new values
    state2 = {"p": state["p"] + 1, "opt": {"mu": jnp.zeros((3,), jnp.float32)}}
    ck.save_checkpoint(path, state2, metadata={"epoch": 0}, backend="orbax")
    loaded2, _ = ck.load_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(loaded2["p"]), state["p"] + 1)


def test_orbax_async_save(tmp_path):
    state = {"w": jnp.full((16, 16), 3.0)}
    path = str(tmp_path / "m.async.ckpt")
    ck.save_checkpoint(path, state, metadata={"epoch": 5}, backend="orbax",
                       async_save=True)
    ck.wait_for_checkpoints()
    loaded, meta = ck.load_checkpoint(path, state)
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(loaded["w"]), 3.0)


def test_resolve_and_load_params_policy(tmp_path):
    """Shared CLI checkpoint-resolution policy: torch suffixes pass
    through, bogus explicit paths error (never silently run random
    weights), empty + missing tolerates, empty + present loads."""
    from types import SimpleNamespace

    params = {"params": {"w": jnp.zeros((3,), jnp.float32)}}

    def opts(checkpoint="", **kw):
        return SimpleNamespace(
            checkpoint=checkpoint, log_dir=str(tmp_path), name="m",
            test_epoch="best", lr=1e-3, **kw,
        )

    # torch import suffix: pass-through (import itself happened upstream)
    got, note = ck.resolve_and_load_params(opts("w.pth.tar"), params)
    assert got is params and "torch" in note

    # bogus explicit path: hard error
    with pytest.raises(ValueError, match="expected a .ckpt"):
        ck.resolve_and_load_params(opts("weights.npz"), params)

    # explicit .ckpt that doesn't exist: FileNotFoundError propagates
    with pytest.raises(FileNotFoundError):
        ck.resolve_and_load_params(opts(str(tmp_path / "no.ckpt")), params)

    # empty + missing derived path: tolerated, params unchanged
    got, note = ck.resolve_and_load_params(opts(), params)
    assert got is params and "no checkpoint" in note

    # empty + present derived path: loads it
    from faster_rcnn_pytorch_tpu.parallel.train_step import (
        init_train_state,
        make_lr_schedule,
        make_optimizer,
    )

    opt = make_optimizer(params, make_lr_schedule("constant", 1e-3, 1, 1))
    state = init_train_state(
        {"params": {"w": jnp.full((3,), 7.0)}}, opt
    )
    path = ck.checkpoint_path(str(tmp_path), "m", "best")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ck.save_checkpoint(path, state, metadata={"epoch": 2})
    got, note = ck.resolve_and_load_params(opts(), params)
    assert "epoch 2" in note
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 7.0)


def test_prune_checkpoints_retention(tmp_path):
    """--keep_checkpoints K deletes all but the newest K epoch files,
    never touches the best copy, and 0 keeps everything (reference
    keep-all parity, train.py:80-85)."""
    log_dir = str(tmp_path)
    state = {"w": np.zeros(2, np.float32)}
    for e in range(5):
        ck.save_checkpoint(ck.checkpoint_path(log_dir, "run", e), state)
    ck.save_checkpoint(ck.checkpoint_path(log_dir, "run", "best"), state)

    assert ck.prune_checkpoints(log_dir, "run", 0) == []  # keep-all default

    removed = ck.prune_checkpoints(log_dir, "run", 2)
    assert sorted(removed) == [
        ck.checkpoint_path(log_dir, "run", e) for e in range(3)
    ]
    saves = os.path.dirname(ck.checkpoint_path(log_dir, "run", 0))
    left = sorted(os.listdir(saves))
    assert left == ["run.3.ckpt", "run.4.ckpt", "run.best.ckpt"]

    # idempotent once under budget; missing dir is a no-op
    assert ck.prune_checkpoints(log_dir, "run", 2) == []
    assert ck.prune_checkpoints(log_dir, "absent", 2) == []


def test_prune_checkpoints_orbax_dirs(tmp_path):
    """Retention removes orbax checkpoint *directories* too."""
    log_dir = str(tmp_path)
    for e in range(3):
        path = ck.checkpoint_path(log_dir, "r", e)
        os.makedirs(path)
        with open(os.path.join(path, "marker"), "w") as f:
            f.write("x")
    ck.prune_checkpoints(log_dir, "r", 1)
    saves = os.path.dirname(ck.checkpoint_path(log_dir, "r", 0))
    assert sorted(os.listdir(saves)) == ["r.2.ckpt"]
