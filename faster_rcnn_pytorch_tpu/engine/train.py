"""Train loop (counterpart of train.py:7-85 ``train_one_epoch``).

Per step: shard the host batch over the ``data`` mesh axis, run the jitted
SPMD step (forward + 4-part loss + SGD update, gradients psum'd by XLA),
log smoothed losses every ``vis_step`` to console + TensorBoard/CSV.
Checkpointing each epoch on the main process only (train.py:74-85).
"""

from __future__ import annotations

import jax

from faster_rcnn_pytorch_tpu.parallel.mesh import shard_batch
from faster_rcnn_pytorch_tpu.utils.checkpoint import (
    checkpoint_path,
    prune_checkpoints,
    save_checkpoint,
)
from faster_rcnn_pytorch_tpu.utils.logging import (
    MetricLogger,
    ScalarWriter,
    is_main,
)

BATCH_KEYS = ("image", "extent", "gt_boxes", "gt_labels", "gt_mask")


def train_one_epoch(
    state,
    step_fn,
    loader,
    mesh,
    epoch: int,
    opts,
    schedule,
    writer: ScalarWriter | None = None,
):
    """Runs one epoch; returns the new train state."""
    logger = MetricLogger()
    rng = jax.random.key(opts.seed * 100_003 + epoch)
    steps_per_epoch = len(loader)

    for i, host_batch in logger.log_every(
        loader.epoch(epoch), opts.vis_step, header=f"epoch {epoch}"
    ):
        batch = {k: host_batch[k] for k in BATCH_KEYS}
        batch = shard_batch(batch, mesh)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        if i % opts.vis_step == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            step = epoch * steps_per_epoch + i
            lr = float(schedule(step))
            logger.update(lr=lr, **{k: metrics[k] for k in (
                "loss", "rpn_cls", "rpn_reg", "roi_cls", "roi_reg")})
            if writer is not None:
                for k, v in metrics.items():
                    writer.scalar(f"train/{k}", v, step)
                writer.scalar("train/lr", lr, step)

    if is_main():
        path = checkpoint_path(opts.log_dir, opts.name, epoch)
        save_checkpoint(
            path,
            state,
            metadata={"epoch": epoch},
            backend=getattr(opts, "ckpt_backend", "flax"),
            async_save=getattr(opts, "async_checkpoint", False),
        )
        print(f"saved checkpoint {path}")
        prune_checkpoints(
            opts.log_dir, opts.name, getattr(opts, "keep_checkpoints", 0)
        )
    return state
