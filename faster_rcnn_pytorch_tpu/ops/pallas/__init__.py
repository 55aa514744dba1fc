"""Pallas TPU kernels for the hot detection ops.

These replace the torchvision C++/CUDA extension ops the reference leans
on (SURVEY.md §2.9): pairwise IoU, greedy NMS, RoIPool. RoIAlign needs no
custom kernel — its bilinear interpolation is expressed as two MXU
matmuls in :mod:`..roi_align`.

Each kernel has a pure-lax twin in :mod:`faster_rcnn_pytorch_tpu.ops`
used as the CPU fallback and as the differential-testing oracle; the
``interpret=True`` path lets the kernels themselves run in CI without a
TPU.
"""

from faster_rcnn_pytorch_tpu.ops.pallas.iou_kernel import pairwise_iou_pallas  # noqa: F401
from faster_rcnn_pytorch_tpu.ops.pallas.roi_pool_kernel import roi_pool_pallas  # noqa: F401
