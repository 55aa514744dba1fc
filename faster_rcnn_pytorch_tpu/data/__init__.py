"""Host-side data pipeline: datasets, transforms, padded-canvas batching."""

from faster_rcnn_pytorch_tpu.data.loader import DetectionLoader, build_dataloader  # noqa: F401
