"""faster_rcnn_pytorch_tpu — a TPU-native Faster R-CNN detection framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference ``csm-kr/faster_rcnn_pytorch`` PyTorch implementation:

* VGG16 single-scale Faster R-CNN (the "paper"/legacy generation).
* ResNet50-FPN multi-scale Faster R-CNN (the "torchvision-style" generation).
* VOC / COCO data pipelines, COCO-protocol + VOC AP50 evaluation.
* Data-parallel training over a ``jax.sharding.Mesh`` (ICI), SGD + LR
  schedules, checkpoint/resume, logging.

Everything in the hot path is fixed-shape, mask-driven, and jit-compiled;
the torchvision C++/CUDA ops the reference depends on (nms, RoIPool,
RoIAlign) are re-implemented as TPU kernels under :mod:`.ops`.
"""

__version__ = "0.1.0"
