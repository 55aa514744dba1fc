"""SPMD data parallelism over a device mesh."""

from faster_rcnn_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from faster_rcnn_pytorch_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    make_lr_schedule,
)
