"""Fixed-shape XLA/Pallas tensor ops: geometry, preprocess, NMS, assignment."""

from strongsort_yolo_tpu.ops.boxes import (
    box_area,
    box_iou,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.nms import non_max_suppression
from strongsort_yolo_tpu.ops.assignment import solve_assignment

__all__ = [
    "box_area",
    "box_iou",
    "scale_boxes",
    "xywh2xyxy",
    "xyxy2xywh",
    "letterbox",
    "letterbox_params",
    "non_max_suppression",
    "solve_assignment",
]
