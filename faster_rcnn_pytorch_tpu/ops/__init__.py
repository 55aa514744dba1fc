"""Fixed-shape TPU ops: box geometry, IoU, NMS, RoI pooling, sampling."""

from faster_rcnn_pytorch_tpu.ops.boxes import (  # noqa: F401
    xy_to_cxcy,
    cxcy_to_xy,
    encode,
    decode,
    box_area,
    box_iou,
    jaccard_iou,
    pairwise_iou,
    clip_boxes,
)
from faster_rcnn_pytorch_tpu.ops.nms import nms, batched_nms, multiclass_nms  # noqa: F401
from faster_rcnn_pytorch_tpu.ops.roi_pool import roi_pool  # noqa: F401
from faster_rcnn_pytorch_tpu.ops.roi_align import roi_align, multiscale_roi_align  # noqa: F401
from faster_rcnn_pytorch_tpu.ops.sampling import sample_pos_neg  # noqa: F401
