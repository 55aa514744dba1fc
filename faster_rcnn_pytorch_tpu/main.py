"""Entry point (counterpart of main.py:30-123 ``main_worker``).

``python -m faster_rcnn_pytorch_tpu.main --config configs/voc_train.txt``

Orchestration: options -> (optional) multi-host init -> loaders -> model +
params (fresh init / backbone import / resume) -> optimizer + schedule ->
epoch loop (train_one_epoch, then eval with best-checkpoint tracking —
the loop the reference clearly intends at main.py:83-102).

Where the reference spawns one process per GPU (mp.spawn, main.py:117),
here a single process drives all local devices through one SPMD program;
multiple *hosts* each run this entry with ``--coordinator`` set.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.config import Options, load_options
from faster_rcnn_pytorch_tpu.data.loader import build_dataloader
from faster_rcnn_pytorch_tpu.engine.evaluate import evaluate
from faster_rcnn_pytorch_tpu.engine.train import train_one_epoch
from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    label_offset_for,
)
from faster_rcnn_pytorch_tpu.parallel.mesh import (
    initialize_multihost,
    make_mesh,
    shard_tree,
    tree_shardings,
)
from faster_rcnn_pytorch_tpu.parallel.train_step import (
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from faster_rcnn_pytorch_tpu.utils.checkpoint import (
    checkpoint_path,
    load_checkpoint,
    load_torch_state_dict,
    import_fpn_torch_params,
    import_legacy_torch_params,
    save_checkpoint,
    wait_for_checkpoints,
)
from faster_rcnn_pytorch_tpu.utils.logging import ScalarWriter, is_main, print0


def init_params(model, opts: Options):
    """Fresh init (or torch-checkpoint import when ``checkpoint`` points
    at a ``.pth.tar``), with optional ImageNet-pretrained backbone
    bootstrap like the reference (models/model.py:275-281,
    new_model.py:372)."""
    if opts.checkpoint == "pretrained":
        # The reference demo variant's pretrained=True: fetch the
        # author's released VOC detector into the cache and import it
        # (models/model_.py:300-312). Rewritten in place so the shared
        # checkpoint-resolution policy sees a concrete .pth.tar path.
        from faster_rcnn_pytorch_tpu.utils.pretrained import fetch

        opts.checkpoint = fetch("frcnn_demo")
    if opts.checkpoint.endswith((".pth.tar", ".pth")):
        sd = load_torch_state_dict(opts.checkpoint)
        importer = (
            import_legacy_torch_params
            if opts.model_generation == "legacy"
            else import_fpn_torch_params
        )
        return importer(sd, opts.num_classes)
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import init_detector_params

    params = init_detector_params(model, jax.random.key(opts.seed))
    if opts.pretrained_backbone:
        from faster_rcnn_pytorch_tpu.utils.checkpoint import (
            load_pretrained_backbone,
        )

        params = load_pretrained_backbone(
            params, opts.pretrained_backbone, opts.model_generation
        )
        print0(f"backbone initialised from {opts.pretrained_backbone}")
    return params


def label_map_for(opts: Options, coco_index):
    if opts.data_type == "voc":
        return lambda l: l
    if opts.model_generation == "legacy":
        # .get(-1): the model always has 80 foreground slots but a
        # COCO-format dataset may carry fewer categories (custom data,
        # tools/make_shapes_coco.py); slots without a category map to an
        # id no gt has, so the evaluator (which walks cat_ids) never
        # scores them.
        return lambda l: coco_index.contiguous_to_cat.get(l, -1)
    return lambda l: l + 1  # fpn softmax index == raw COCO id


def main(argv=None) -> int:
    from faster_rcnn_pytorch_tpu.utils.runtime import (
        apply_matmul_precision,
        setup_runtime,
    )

    setup_runtime()
    opts = load_options(argv)
    apply_matmul_precision(opts.matmul_precision)
    if opts.coordinator:
        initialize_multihost(opts.coordinator, opts.num_hosts, opts.host_id)
    opts.host_id = jax.process_index()
    opts.num_hosts = jax.process_count()

    # The data-axis size must divide the per-host batch (batch sharded
    # over `data` only); pick the largest compatible device count that is
    # also a multiple of the tensor-parallel axis.
    avail = opts.num_devices or len(jax.devices())
    mp = max(opts.model_parallel, 1)
    per_host_batch = max(opts.batch_size // opts.num_hosts, 1)
    n_dev = max(
        (
            k
            for k in range(1, avail + 1)
            if k % mp == 0 and per_host_batch % (k // mp) == 0
        ),
        default=mp,
    )
    mesh = make_mesh(n_dev, model_parallel=mp)
    print0(
        f"devices: {mesh.devices.size}/{avail} "
        f"(data {mesh.devices.shape[0]} x model {mp}), "
        f"hosts: {opts.num_hosts}"
    )
    if opts.eval_batch_size == 0:
        # auto: one eval image per data-mesh slot on this host, so the
        # per-epoch eval runs SPMD over the same devices as training
        opts.eval_batch_size = max(
            mesh.devices.shape[0] // opts.num_hosts, 1
        )

    train_loader, test_loader = build_dataloader(opts)
    dtype = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32
    model, cfg = build_model(
        opts.model_generation, opts.num_classes, dtype,
        label_offset=label_offset_for(opts.model_generation, opts.data_type),
        remat=opts.remat_backbone,
    )

    # Preflight: with the legacy boundary filter on, anchors crossing
    # the image extent are untrainable (targets.py). At small resize
    # the 128-512px legacy anchors can leave <1% eligible — the RPN
    # classifier then pins at ln2 and nothing converges. Warn at launch
    # instead of five epochs in.
    if cfg.rpn_boundary_filter:
        from faster_rcnn_pytorch_tpu.models.anchors import inside_fraction

        for ch, cw in {train_loader.canvas_land, train_loader.canvas_port}:
            anc = model.canvas_anchors(ch, cw)
            ext = (min(opts.resize / cw, 1.0), min(opts.resize / ch, 1.0))
            frac = inside_fraction(anc, ext)
            if frac < 0.01:
                print0(
                    f"WARNING: only {frac:.2%} of RPN anchors fit inside a "
                    f"square image's extent on the {ch}x{cw} canvas — the "
                    "boundary filter will leave the RPN nearly untrainable. "
                    "The legacy generation's anchors are 128-512px: raise "
                    "--resize to >=320 or use --model_generation fpn."
                )

    coco_index = None
    if opts.data_type == "coco":
        import os

        from faster_rcnn_pytorch_tpu.data.coco import CocoIndex

        coco_index = CocoIndex(
            os.path.join(opts.data_root, "annotations", "instances_val2017.json")
        )

    params = init_params(model, opts)
    steps_per_epoch = max(len(train_loader), 1)
    schedule = make_lr_schedule(
        opts.scheduler,
        opts.lr,
        opts.epoch,
        steps_per_epoch,
        milestones=tuple(opts.milestones),
        eta_min=opts.eta_min,
        warmup_epochs=opts.warmup_epoch,
        cycle_mult=opts.cycle_mult,
        restart_gamma=opts.cycle_gamma,
        first_cycle_epochs=opts.first_cycle_epoch,
    )
    optimizer = make_optimizer(
        params, schedule, momentum=opts.momentum, weight_decay=opts.weight_decay
    )
    state = init_train_state(params, optimizer)

    if opts.start_epoch > 0:  # resume (utils/util.py:142-155)
        path = checkpoint_path(opts.log_dir, opts.name, opts.start_epoch - 1)
        state, meta = load_checkpoint(path, state)
        print0(f"resumed from {path} (epoch {meta.get('epoch')})")
    elif opts.checkpoint.endswith(".ckpt"):
        state, _ = load_checkpoint(opts.checkpoint, state)
        print0(f"loaded checkpoint {opts.checkpoint}")

    accum = max(opts.grad_accum, 1)
    local_data = max(mesh.devices.shape[0] // opts.num_hosts, 1)
    if accum > 1 and per_host_batch % (accum * local_data) != 0:
        raise SystemExit(
            f"--grad_accum {accum}: per-host batch {per_host_batch} must "
            f"divide by grad_accum x local data-mesh size "
            f"({accum} x {local_data})"
        )
    state = shard_tree(state, mesh)
    step_fn = make_train_step(
        model, cfg, optimizer, mesh,
        state_shardings=tree_shardings(state, mesh),
        grad_accum=accum,
    )
    writer = ScalarWriter(opts.log_dir, opts.name, opts.log_backend)
    label_map = label_map_for(opts, coco_index)

    from faster_rcnn_pytorch_tpu.utils.logging import trace_context

    best_map = -1.0
    for epoch in range(opts.start_epoch, opts.epoch):
        with trace_context(
            f"{opts.log_dir}/{opts.name}/trace",
            enabled=opts.profile and epoch == opts.start_epoch,
        ):
            state = train_one_epoch(
                state, step_fn, train_loader, mesh, epoch, opts, schedule, writer
            )
        result = evaluate(
            model,
            cfg,
            state.params,
            test_loader,
            data_type=opts.data_type,
            coco_index=coco_index,
            label_map=label_map,
            score_threshold=opts.thres,
            mesh=mesh,
        )
        writer.scalar("eval/mAP", result["map"], epoch)
        print0(f"epoch {epoch}: mAP = {result['map']:.4f}")
        if is_main() and result["map"] > best_map:
            best_map = result["map"]
            save_checkpoint(
                checkpoint_path(opts.log_dir, opts.name, "best"),
                state,
                metadata={"epoch": epoch, "map": best_map},
                backend=opts.ckpt_backend,
                async_save=opts.async_checkpoint,
            )
    writer.close()
    wait_for_checkpoints()
    return 0


if __name__ == "__main__":
    sys.exit(main())
