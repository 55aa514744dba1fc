"""Checkpoint save / resume + bidirectional PyTorch checkpoint migration.

Counterpart of the reference checkpoint flow (SURVEY.md §2.30): per-epoch
``{epoch, model, optimizer, scheduler}`` dicts at
``{log_dir}/{name}/saves/{name}.{epoch}.pth.tar`` (train.py:80-85), a
best-by-mAP copy (test.py:155-163) and resume from ``start_epoch - 1``
(utils/util.py:142-155). Here the state is a flax/optax pytree serialised
with ``flax.serialization`` (msgpack); naming mirrors the reference with
a ``.ckpt`` suffix.

The importer converts released ``.pth.tar`` torch checkpoints into this
framework's parameter trees so published weights can be evaluated for
parity (BASELINE.md north star). Layout conversions handled:

* conv kernels OIHW -> HWIO,
* linear weights [out, in] -> [in, out],
* the first RoI-head FC consumes a flattened 7x7 pool: torch flattens
  channel-major (C, 7, 7), NHWC flattens (7, 7, C) — the input dimension
  is permuted accordingly,
* ``module.`` DataParallel prefixes stripped (models/model_.py:308-311),
* the legacy checkpoint stores the shared classifier twice (aliased as
  ``classifier.*`` and ``fast_rcnn_head.classifier.*``,
  models/model.py:282-298) — both map to the single fc6/fc7 here.

The exporters at the bottom invert every conversion, producing
reference-layout state dicts (``export_*_torch_state_dict``) and
reference-format ``.pth.tar`` blobs (``save_torch_checkpoint``) so a
model trained on TPU can be handed back to the torch ecosystem.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

import flax.serialization


def save_checkpoint(
    path: str,
    state: Any,
    metadata: dict | None = None,
    backend: str = "flax",
    async_save: bool = False,
) -> None:
    """Write a checkpoint.

    backend 'flax' (default): single msgpack+pickle file, atomic
    tmp+rename — the reference's torch.save equivalent. backend 'orbax':
    an orbax checkpoint *directory* at ``path`` (its own atomicity via
    finalize-rename), optionally asynchronous (``async_save`` — the
    train loop keeps stepping while the previous epoch's state streams
    out; call :func:`wait_for_checkpoints` before exit). Orbax is the
    scale path: multi-host coordinated saves, per-array chunking.
    """
    if backend == "orbax":
        _save_orbax(path, state, metadata, async_save)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": flax.serialization.to_bytes(state),
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> tuple[Any, dict]:
    """Read a checkpoint saved by either backend (auto-detected: orbax
    checkpoints are directories, flax ones are files)."""
    if os.path.isdir(path):
        return _load_orbax(path, template)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = flax.serialization.from_bytes(template, payload["state"])
    return state, payload.get("metadata", {})


_ASYNC_CHECKPOINTER = None


def _orbax_checkpointer(async_save: bool):
    import orbax.checkpoint as ocp

    global _ASYNC_CHECKPOINTER
    if not async_save:
        return ocp.StandardCheckpointer(), False
    if _ASYNC_CHECKPOINTER is None:
        _ASYNC_CHECKPOINTER = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler()
        )
    return _ASYNC_CHECKPOINTER, True


def _save_orbax(path, state, metadata, async_save):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.isdir(path):  # orbax refuses to overwrite; epochs rotate
        import shutil

        shutil.rmtree(path)
    ckptr, is_async = _orbax_checkpointer(async_save)
    if is_async:
        ckptr.wait_until_finished()  # at most one save in flight
        ckptr.save(path, args=ocp.args.StandardSave(state))
    else:
        with ckptr:
            ckptr.save(path, state)
    # metadata sidecar (epoch/mAP scalars; orbax trees hold arrays only)
    with open(path + ".meta.json", "w") as f:
        json.dump(metadata or {}, f)


def _load_orbax(path, template):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, template)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


def wait_for_checkpoints() -> None:
    """Block until any in-flight async orbax save has committed (call
    before process exit)."""
    if _ASYNC_CHECKPOINTER is not None:
        _ASYNC_CHECKPOINTER.wait_until_finished()


def checkpoint_path(log_dir: str, name: str, epoch: int | str) -> str:
    """Reference naming scheme: ``{log}/{name}/saves/{name}.{epoch}``."""
    return os.path.join(log_dir, name, "saves", f"{name}.{epoch}.ckpt")


def prune_checkpoints(log_dir: str, name: str, keep_last: int) -> list[str]:
    """Delete all but the newest ``keep_last`` per-epoch checkpoints.

    Retention policy the reference lacks (train.py:80-85 keeps every
    epoch — ~1 GB each); opt-in via ``--keep_checkpoints K``, 0 = keep
    all (parity default). The ``best`` copy is never deleted, and both
    backends are handled (flax files, orbax directories). Returns the
    removed paths.
    """
    if keep_last <= 0:
        return []
    import re
    import shutil

    saves_dir = os.path.dirname(checkpoint_path(log_dir, name, 0))
    if not os.path.isdir(saves_dir):
        return []
    pat = re.compile(re.escape(name) + r"\.(\d+)\.ckpt$")
    epochs = sorted(
        int(m.group(1))
        for fn in os.listdir(saves_dir)
        if (m := pat.fullmatch(fn))
    )
    removed = []
    for e in epochs[: max(len(epochs) - keep_last, 0)]:
        path = checkpoint_path(log_dir, name, e)
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
        removed.append(path)
    return removed


def resolve_and_load_params(opts, params):
    """Shared eval/demo/export checkpoint resolution (one policy instead
    of three diverging copies; counterpart of test.py:29-32 /
    demo.py:30-33 checkpoint loads).

    ``opts.checkpoint`` semantics:
      * ``*.pth`` / ``*.pth.tar`` — torch import already performed by
        ``main.init_params``; ``params`` is used as-is.
      * ``*.ckpt`` (file or orbax dir) — explicit native checkpoint,
        must exist.
      * empty — the run's ``{log_dir}/{name}/saves/{name}.{epoch}.ckpt``;
        missing is tolerated (fresh params, with a console note).
      * anything else — error. Silently proceeding with random weights
        (the old behavior for a typo'd path) is the worst failure mode
        an eval/serving CLI can have.

    Returns ``(params, source_note)``.
    """
    from faster_rcnn_pytorch_tpu.parallel.train_step import (
        init_train_state,
        make_lr_schedule,
        make_optimizer,
    )

    ckpt = opts.checkpoint
    if ckpt.endswith((".pth.tar", ".pth")):
        return params, f"imported torch checkpoint {ckpt}"
    if ckpt and not ckpt.endswith(".ckpt") and not os.path.isdir(ckpt):
        raise ValueError(
            f"--checkpoint {ckpt!r}: expected a .ckpt file, an orbax "
            "checkpoint directory, or a torch .pth/.pth.tar"
        )
    path = ckpt or checkpoint_path(opts.log_dir, opts.name, opts.test_epoch)

    sched = make_lr_schedule("constant", opts.lr, 1, 1)
    opt = make_optimizer(params, sched)
    try:
        state, meta = load_checkpoint(path, init_train_state(params, opt))
    except FileNotFoundError:
        if ckpt:  # explicit path must exist
            raise
        return params, f"no checkpoint at {path}; using current params"
    return state.params, f"loaded {path} (epoch {meta.get('epoch')})"


# --------------------------------------------------------------- importer


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _conv(w) -> np.ndarray:  # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:  # [out, in] -> [in, out]
    return _t(w).transpose(1, 0)


def _linear_from_pool(w, ch: int, pool: int = 7) -> np.ndarray:
    """Torch FC over a flattened (C, p, p) pool -> ours over (p, p, C)."""
    out_dim = w.shape[0]
    w = _t(w).reshape(out_dim, ch, pool, pool)
    w = w.transpose(2, 3, 1, 0)  # (p, p, C, out)
    return w.reshape(pool * pool * ch, out_dim)


def _strip_module(sd: dict) -> dict:
    return {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}


def load_torch_state_dict(path: str) -> dict:
    """torch.load a .pth.tar and return the raw model state dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return _strip_module({k: v.numpy() for k, v in sd.items()})


def import_legacy_torch_params(sd: dict, num_classes: int) -> dict:
    """Torch legacy-FRCNN state dict -> LegacyFRCNN flax params.

    Torch layout (models/model.py:275-298): ``extractor.{i}`` VGG convs,
    ``rpn.{inter,cls,reg}_layer``, ``classifier.{0,2}`` shared FCs,
    ``fast_rcnn_head.{cls_head,reg_head}``.
    """
    from faster_rcnn_pytorch_tpu.models.vgg import TORCH_VGG16_CONV_INDICES

    p: dict[str, Any] = {}
    extractor = {}
    for k, torch_idx in enumerate(TORCH_VGG16_CONV_INDICES):
        extractor[f"conv{k}"] = {
            "kernel": _conv(sd[f"extractor.{torch_idx}.weight"]),
            "bias": _t(sd[f"extractor.{torch_idx}.bias"]),
        }
    p["extractor"] = extractor
    p["rpn"] = {
        "inter": {
            "kernel": _conv(sd["rpn.inter_layer.weight"]),
            "bias": _t(sd["rpn.inter_layer.bias"]),
        },
        "cls": {
            "kernel": _conv(sd["rpn.cls_layer.weight"]),
            "bias": _t(sd["rpn.cls_layer.bias"]),
        },
        "reg": {
            "kernel": _conv(sd["rpn.reg_layer.weight"]),
            "bias": _t(sd["rpn.reg_layer.bias"]),
        },
    }
    p["fc6"] = {
        "kernel": _linear_from_pool(sd["classifier.0.weight"], ch=512),
        "bias": _t(sd["classifier.0.bias"]),
    }
    p["fc7"] = {
        "kernel": _linear(sd["classifier.2.weight"]),
        "bias": _t(sd["classifier.2.bias"]),
    }
    cls_w = sd["fast_rcnn_head.cls_head.weight"]
    reg_w = sd["fast_rcnn_head.reg_head.weight"]
    assert cls_w.shape[0] == num_classes, (cls_w.shape, num_classes)
    p["cls_head"] = {
        "kernel": _linear(cls_w),
        "bias": _t(sd["fast_rcnn_head.cls_head.bias"]),
    }
    p["reg_head"] = {
        "kernel": _linear(reg_w),
        "bias": _t(sd["fast_rcnn_head.reg_head.bias"]),
    }
    return {"params": p}


def import_torchvision_vgg16(sd: dict) -> dict:
    """Plain torchvision ``vgg16`` ImageNet state dict -> the
    ``extractor`` param subtree of :class:`LegacyFRCNN`.

    The reference bootstraps training from
    ``vgg16(pretrained=True).features[:-1]`` (models/model.py:275-281);
    only the 13 convs are pretrained — the 4096-wide classifier FCs are
    freshly initialised ``nn.Linear`` there, so they are NOT imported.

    Accepts ``features.{i}.*`` keys (optionally under a ``features``-only
    dump or a full vgg16 dump with ``classifier.*``, which is ignored).
    """
    from faster_rcnn_pytorch_tpu.models.vgg import TORCH_VGG16_CONV_INDICES

    extractor = {}
    for k, torch_idx in enumerate(TORCH_VGG16_CONV_INDICES):
        extractor[f"conv{k}"] = {
            "kernel": _conv(sd[f"features.{torch_idx}.weight"]),
            "bias": _t(sd[f"features.{torch_idx}.bias"]),
        }
    return extractor


def import_torchvision_resnet50(sd: dict) -> dict:
    """Plain torchvision ``resnet50`` ImageNet state dict -> the
    ``backbone.body`` param subtree of :class:`FPNFRCNN` (frozen-BN stats
    included; ``fc.*`` ignored).

    The reference bootstraps from ``resnet_fpn_backbone('resnet50',
    IMAGENET1K_V1)`` (models/new_model.py:372) — the body comes from
    ImageNet, the FPN convs are freshly initialised there too.
    """
    body: dict[str, Any] = {
        "conv1": {"kernel": _conv(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
    }
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            t = f"layer{stage + 1}.{b}"
            blk: dict[str, Any] = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            body[f"layer{stage + 1}_{b}"] = blk
    return body


def _merge_subtree(params: dict, path: tuple[str, ...], new: dict) -> dict:
    """Replace ``params['params'][*path]`` with ``new``, checking that
    every leaf shape matches the initialised template."""
    import jax

    params = flax.core.unfreeze(params)
    node = params["params"]
    for key in path[:-1]:
        node = node[key]
    old = node[path[-1]]
    old_shapes = jax.tree.map(lambda x: tuple(x.shape), old)
    new_shapes = jax.tree.map(lambda x: tuple(x.shape), new)
    if old_shapes != new_shapes:
        raise ValueError(
            f"backbone import shape mismatch at {'.'.join(path)}:\n"
            f"  model: {old_shapes}\n  import: {new_shapes}"
        )
    node[path[-1]] = new
    return params


def load_pretrained_backbone(params: dict, path: str, generation: str) -> dict:
    """Merge an ImageNet-pretrained torchvision backbone state dict
    (``vgg16`` / ``resnet50`` ``.pth``) into freshly initialised detector
    params — the counterpart of the reference's pretrained bootstrap
    (models/model.py:275-281, models/new_model.py:372). ``path`` may also
    be a release spec (``auto`` / ``imagenet`` / registry name), resolved
    through the gated downloader (utils/pretrained.py)."""
    from faster_rcnn_pytorch_tpu.utils.pretrained import resolve_backbone

    sd = load_torch_state_dict(resolve_backbone(path, generation))
    if generation == "legacy":
        return _merge_subtree(params, ("extractor",), import_torchvision_vgg16(sd))
    if generation == "fpn":
        return _merge_subtree(
            params, ("backbone", "body"), import_torchvision_resnet50(sd)
        )
    raise ValueError(f"unknown generation: {generation!r}")


def _bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


# --------------------------------------------------------------- exporter
#
# Inverse direction: this framework's params -> a reference-layout torch
# state dict, so models trained here can be loaded by the reference
# (models/model.py:275-298 legacy, models/new_model.py:365-385 FPN) or by
# any tool in its ecosystem. Together with the importer above this makes
# checkpoint migration bidirectional (MIGRATION.md).


def _conv_back(w) -> np.ndarray:  # HWIO -> OIHW
    return _t(w).transpose(3, 2, 0, 1)


def _linear_back(w) -> np.ndarray:  # [in, out] -> [out, in]
    return _t(w).transpose(1, 0)


def _linear_to_pool(w, ch: int, pool: int = 7) -> np.ndarray:
    """Inverse of :func:`_linear_from_pool`: ours over a flattened
    (p, p, C) pool -> torch FC over flattened (C, p, p)."""
    out_dim = w.shape[1]
    w = _t(w).reshape(pool, pool, ch, out_dim)
    w = w.transpose(3, 2, 0, 1)  # (out, C, p, p)
    return np.ascontiguousarray(w.reshape(out_dim, ch * pool * pool))


def _params_root(params: dict) -> dict:
    return params["params"] if "params" in params else params


def _bn_back(sd: dict, prefix: str, bn: dict) -> None:
    sd[f"{prefix}.weight"] = _t(bn["scale"])
    sd[f"{prefix}.bias"] = _t(bn["bias"])
    sd[f"{prefix}.running_mean"] = _t(bn["mean"])
    sd[f"{prefix}.running_var"] = _t(bn["var"])
    # torch BatchNorm registers this buffer; strict load needs it.
    sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def export_legacy_torch_state_dict(params: dict) -> dict:
    """LegacyFRCNN flax params -> the reference legacy model's state-dict
    layout (inverse of :func:`import_legacy_torch_params`).

    The reference registers the shared VGG classifier twice
    (``classifier.*`` and ``fast_rcnn_head.classifier.*``,
    models/model.py:282-298), so both aliases are emitted — the output
    loads with ``strict=True``.
    """
    from faster_rcnn_pytorch_tpu.models.vgg import TORCH_VGG16_CONV_INDICES

    p = _params_root(params)
    sd: dict[str, np.ndarray] = {}
    for k, torch_idx in enumerate(TORCH_VGG16_CONV_INDICES):
        c = p["extractor"][f"conv{k}"]
        sd[f"extractor.{torch_idx}.weight"] = _conv_back(c["kernel"])
        sd[f"extractor.{torch_idx}.bias"] = _t(c["bias"])
    for ours, theirs in (("inter", "inter_layer"), ("cls", "cls_layer"), ("reg", "reg_layer")):
        sd[f"rpn.{theirs}.weight"] = _conv_back(p["rpn"][ours]["kernel"])
        sd[f"rpn.{theirs}.bias"] = _t(p["rpn"][ours]["bias"])
    fc6_w = _linear_to_pool(p["fc6"]["kernel"], ch=512)
    fc6_b = _t(p["fc6"]["bias"])
    fc7_w = _linear_back(p["fc7"]["kernel"])
    fc7_b = _t(p["fc7"]["bias"])
    for prefix in ("classifier", "fast_rcnn_head.classifier"):
        sd[f"{prefix}.0.weight"] = fc6_w
        sd[f"{prefix}.0.bias"] = fc6_b
        sd[f"{prefix}.2.weight"] = fc7_w
        sd[f"{prefix}.2.bias"] = fc7_b
    for head in ("cls_head", "reg_head"):
        sd[f"fast_rcnn_head.{head}.weight"] = _linear_back(p[head]["kernel"])
        sd[f"fast_rcnn_head.{head}.bias"] = _t(p[head]["bias"])
    return sd


def export_fpn_torch_state_dict(params: dict) -> dict:
    """FPNFRCNN flax params -> the reference FPN model's state-dict
    layout (inverse of :func:`import_fpn_torch_params`), frozen-BN
    statistics included."""
    p = _params_root(params)
    body = p["backbone"]["body"]
    sd: dict[str, np.ndarray] = {
        "backbone.body.conv1.weight": _conv_back(body["conv1"]["kernel"]),
    }
    _bn_back(sd, "backbone.body.bn1", body["bn1"])
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            blk = body[f"layer{stage + 1}_{b}"]
            t = f"backbone.body.layer{stage + 1}.{b}"
            for ci in (1, 2, 3):
                sd[f"{t}.conv{ci}.weight"] = _conv_back(blk[f"conv{ci}"]["kernel"])
                _bn_back(sd, f"{t}.bn{ci}", blk[f"bn{ci}"])
            if "down_conv" in blk:
                sd[f"{t}.downsample.0.weight"] = _conv_back(blk["down_conv"]["kernel"])
                _bn_back(sd, f"{t}.downsample.1", blk["down_bn"])
    fpn = p["backbone"]["fpn"]
    for i in range(4):
        sd[f"backbone.fpn.inner_blocks.{i}.0.weight"] = _conv_back(fpn[f"lateral{i}"]["kernel"])
        sd[f"backbone.fpn.inner_blocks.{i}.0.bias"] = _t(fpn[f"lateral{i}"]["bias"])
        sd[f"backbone.fpn.layer_blocks.{i}.0.weight"] = _conv_back(fpn[f"output{i}"]["kernel"])
        sd[f"backbone.fpn.layer_blocks.{i}.0.bias"] = _t(fpn[f"output{i}"]["bias"])
    for ours, theirs in (("inter", "inter_layer"), ("cls", "cls_layer"), ("reg", "reg_layer")):
        sd[f"rpn.rpn_head.{theirs}.weight"] = _conv_back(p["rpn"][ours]["kernel"])
        sd[f"rpn.rpn_head.{theirs}.bias"] = _t(p["rpn"][ours]["bias"])
    # The FPN generation shares the roi classifier the same way the
    # legacy one does (new_model.py:373-385 passes self.classifier into
    # FRCNNHead), so it too appears twice in the state dict.
    for prefix in ("classifier", "frcnn_head.classifier"):
        sd[f"{prefix}.0.weight"] = _linear_to_pool(p["fc6"]["kernel"], ch=256)
        sd[f"{prefix}.0.bias"] = _t(p["fc6"]["bias"])
        sd[f"{prefix}.2.weight"] = _linear_back(p["fc7"]["kernel"])
        sd[f"{prefix}.2.bias"] = _t(p["fc7"]["bias"])
    for head in ("cls_head", "reg_head"):
        sd[f"frcnn_head.{head}.weight"] = _linear_back(p[head]["kernel"])
        sd[f"frcnn_head.{head}.bias"] = _t(p[head]["bias"])
    return sd


def export_torch_state_dict(params: dict, generation: str) -> dict:
    if generation == "legacy":
        return export_legacy_torch_state_dict(params)
    if generation == "fpn":
        return export_fpn_torch_state_dict(params)
    raise ValueError(f"unknown generation: {generation!r}")


def save_torch_checkpoint(path: str, params: dict, generation: str, epoch: int = 0) -> None:
    """Write a reference-format ``.pth.tar`` (the exact blob
    train.py:78-85 writes: ``{'epoch', 'model_state_dict', ...}``) from
    this framework's params, loadable by the reference's resume path
    (utils/util.py:142-155 reads ``model_state_dict``)."""
    import torch

    sd = export_torch_state_dict(params, generation)
    blob = {
        "epoch": epoch,
        # copy=True: exported leaves can be read-only jax-array views,
        # which torch.from_numpy rejects as non-writable.
        "model_state_dict": {
            k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()
        },
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    torch.save(blob, tmp)
    os.replace(tmp, path)


def import_fpn_torch_params(sd: dict, num_classes: int) -> dict:
    """Torch FPN-FRCNN state dict (models/new_model.py:365-385 layout,
    torchvision resnet_fpn_backbone naming) -> FPNFRCNN flax params."""
    body: dict[str, Any] = {
        "conv1": {"kernel": _conv(sd["backbone.body.conv1.weight"])},
        "bn1": _bn(sd, "backbone.body.bn1"),
    }
    stage_blocks = (3, 4, 6, 3)
    for stage, blocks in enumerate(stage_blocks):
        for b in range(blocks):
            t = f"backbone.body.layer{stage + 1}.{b}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            body[f"layer{stage + 1}_{b}"] = blk
    fpn = {}
    for i in range(4):
        fpn[f"lateral{i}"] = {
            "kernel": _conv(sd[f"backbone.fpn.inner_blocks.{i}.0.weight"]),
            "bias": _t(sd[f"backbone.fpn.inner_blocks.{i}.0.bias"]),
        }
        fpn[f"output{i}"] = {
            "kernel": _conv(sd[f"backbone.fpn.layer_blocks.{i}.0.weight"]),
            "bias": _t(sd[f"backbone.fpn.layer_blocks.{i}.0.bias"]),
        }
    p: dict[str, Any] = {"backbone": {"body": body, "fpn": fpn}}
    p["rpn"] = {
        "inter": {
            "kernel": _conv(sd["rpn.rpn_head.inter_layer.weight"]),
            "bias": _t(sd["rpn.rpn_head.inter_layer.bias"]),
        },
        "cls": {
            "kernel": _conv(sd["rpn.rpn_head.cls_layer.weight"]),
            "bias": _t(sd["rpn.rpn_head.cls_layer.bias"]),
        },
        "reg": {
            "kernel": _conv(sd["rpn.rpn_head.reg_layer.weight"]),
            "bias": _t(sd["rpn.rpn_head.reg_layer.bias"]),
        },
    }
    p["fc6"] = {
        "kernel": _linear_from_pool(sd["classifier.0.weight"], ch=256),
        "bias": _t(sd["classifier.0.bias"]),
    }
    p["fc7"] = {
        "kernel": _linear(sd["classifier.2.weight"]),
        "bias": _t(sd["classifier.2.bias"]),
    }
    p["cls_head"] = {
        "kernel": _linear(sd["frcnn_head.cls_head.weight"]),
        "bias": _t(sd["frcnn_head.cls_head.bias"]),
    }
    p["reg_head"] = {
        "kernel": _linear(sd["frcnn_head.reg_head.weight"]),
        "bias": _t(sd["frcnn_head.reg_head.bias"]),
    }
    return {"params": p}
