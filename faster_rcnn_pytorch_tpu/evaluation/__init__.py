"""Evaluation: COCO-protocol mAP and VOC AP50, host-side numpy."""

from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator  # noqa: F401
from faster_rcnn_pytorch_tpu.evaluation.voc_eval import voc_eval  # noqa: F401
