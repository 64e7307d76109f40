"""Model zoo: YOLOv5/v8/v11 det/seg/pose + OSNet ReID, functional JAX."""

from strongsort_yolo_tpu.models.yolo import (
    YoloConfig,
    build_model,
    init_model,
    model_apply,
)

__all__ = ["YoloConfig", "build_model", "init_model", "model_apply"]
