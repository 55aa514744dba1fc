"""SPMD parallelism over a ``(data, model)`` device mesh."""

from faster_rcnn_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_tree,
    tree_shardings,
    replicate,
)
from faster_rcnn_pytorch_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    make_lr_schedule,
)
