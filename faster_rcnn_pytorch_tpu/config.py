"""Config / flag system (counterpart of config.py:4-49 + configs/*.txt).

The reference layers configargparse: defaults < ``--config file.txt``
< CLI flags. configargparse is not in this image, so the same layering is
implemented on plain argparse + a tiny ``key = value`` file parser that
reads the reference's config-file format unchanged.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any


@dataclasses.dataclass
class Options:
    """All run options. Field-for-field coverage of the reference flags
    (config.py:5-48), plus TPU-native replacements for the GPU ones."""

    name: str = "frcnn"
    # visualisation / logging
    vis_step: int = 100
    log_backend: str = "tensorboard"  # visdom-equivalent live plots
    # data
    resize: int = 800
    max_size: int = 1333
    mosaic_transform: bool = False
    data_root: str = "./data"
    data_type: str = "voc"  # voc | coco
    num_classes: int = 21
    num_workers: int = 4
    batch_size: int = 1
    # micro-batch gradient accumulation inside one jitted step (HBM
    # relief for large global batches; 1 = off). The global batch must
    # divide by grad_accum x data-mesh size.
    grad_accum: int = 1
    # per-host eval batch; 0 = auto (the mesh's local data-axis size, so
    # the per-epoch eval runs SPMD over every chip; 1 off-mesh)
    eval_batch_size: int = 0
    max_gt: int = 100
    # optimisation
    epoch: int = 13
    lr: float = 1e-3
    warmup_epoch: int = 0
    weight_decay: float = 5e-4
    momentum: float = 0.9
    start_epoch: int = 0
    scheduler: str = "cosine"  # cosine | multistep | constant | cosine_warmup_restarts
    milestones: tuple = (16, 22)
    eta_min: float = 5e-5
    # cosine_warmup_restarts only (reference scheduler.py:6-92):
    cycle_mult: float = 1.0  # cycle length growth factor
    cycle_gamma: float = 1.0  # per-cycle peak-lr decay
    first_cycle_epoch: int = 0  # first cycle length in epochs (0 = all epochs)
    seed: int = 0
    # checkpoints / logging
    log_dir: str = "./logs"
    test_epoch: str = "best"
    ckpt_backend: str = "flax"  # flax (single file) | orbax (dir, scale path)
    async_checkpoint: bool = False  # orbax only: overlap save with training
    # retention: keep only the newest K per-epoch checkpoints (the best
    # copy is always kept). 0 = keep every epoch, the reference's
    # behaviour (train.py:80-85 never deletes).
    keep_checkpoints: int = 0
    # inference
    thres: float = 0.05
    # eval: also pickle {predictions, gts} to this path (cross-stack
    # detection diffing, e.g. tools/dualstack_parity decomposition)
    dump_detections: str = ""
    demo_root: str = "./demo"
    demo_image_type: str = "jpg"
    demo_vis: bool = True
    # model
    model_generation: str = "legacy"  # legacy | fpn
    pretrained_backbone: str = ""  # path to converted backbone params
    checkpoint: str = ""  # resume / eval checkpoint path
    # parallelism (replaces gpu_ids/rank/world_size/distributed,
    # config.py:44-48: one data axis over the ICI mesh)
    num_devices: int = 0  # 0 = all local devices
    model_parallel: int = 1  # tensor-parallel axis size (roi-head FCs)
    remat_backbone: bool = False  # rematerialize backbone activations
    host_id: int = 0
    num_hosts: int = 1
    coordinator: str = ""  # multi-host jax.distributed coordinator addr
    # serving export (python -m faster_rcnn_pytorch_tpu.export)
    export_dir: str = "./export"
    export_platforms: str = ""  # "" = current backend; e.g. "cpu,tpu"
    export_torch: str = ""  # write a reference-layout .pth.tar instead
    # params as call arguments + weights.msgpack sidecar instead of
    # baked constants: halves artifact size, shares one weights file
    # across buckets, and keeps the StableHLO body small enough for
    # remote_compile HTTP limits (the 274 MB baked legacy artifact
    # trips a 413 through the tunnelled runtime; DESIGN.md §6)
    params_sidecar: bool = False
    # numerics
    dtype: str = "bfloat16"
    # MXU dot/conv precision for float32 operands. jax's "default" on
    # TPU multiplies in bfloat16 (fp32 accumulate) — fast, but NOT true
    # fp32 numerics; "highest" runs the multi-pass fp32 schedule. Parity
    # evals against a torch-fp32 stack need "highest" (the dual-stack
    # drill's float32 leg sets it); production train/eval keep "default".
    matmul_precision: str = "default"  # default | high | highest
    # observability
    profile: bool = False  # jax.profiler trace around the first epoch


def parse_config_file(path: str) -> dict[str, str]:
    """Parse the reference's ``key = value`` .txt config format."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                key, val = line.split("=", 1)
            elif ":" in line:
                key, val = line.split(":", 1)
            else:
                continue
            out[key.strip().lstrip("-")] = val.strip()
    return out


_BOOL_TRUE = {"1", "true", "yes", "on"}


def _coerce(value: str, field_type: Any, key: str = ""):
    if field_type is bool:
        return value.lower() in _BOOL_TRUE
    if field_type is tuple:
        return tuple(int(v) for v in value.strip("[]() ").split(",") if v)
    try:
        return field_type(value)
    except (TypeError, ValueError):
        if field_type in (int, float):
            raise SystemExit(
                f"invalid value for --{key or 'option'}: {value!r} "
                f"(expected {field_type.__name__})"
            )
        return value


def get_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("faster_rcnn_pytorch_tpu")
    parser.add_argument("--config", type=str, default="", help="key=value .txt file")
    for f in dataclasses.fields(Options):
        flag = f"--{f.name}"
        if f.type is bool or f.type == "bool":
            parser.add_argument(flag, type=str, default=None)
        else:
            parser.add_argument(flag, type=str, default=None)
    return parser


def load_options(argv: list[str] | None = None) -> Options:
    """defaults < config file < CLI, like configargparse (config.py:7)."""
    args = get_args_parser().parse_args(argv)
    opts = Options()
    fields = {f.name: f for f in dataclasses.fields(Options)}
    if args.config:
        for k, v in parse_config_file(args.config).items():
            if k in fields:
                setattr(opts, k, _coerce(v, _runtime_type(fields[k]), k))
    for k, f in fields.items():
        v = getattr(args, k, None)
        if v is not None:
            setattr(opts, k, _coerce(v, _runtime_type(f), k))
    return opts


def _runtime_type(field) -> Any:
    if isinstance(field.type, str):
        return {"str": str, "int": int, "float": float, "bool": bool, "tuple": tuple}.get(
            field.type, str
        )
    return field.type
