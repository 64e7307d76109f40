"""One config system for the three config layers the reference has.

The reference splits configuration across argparse flags
(/root/reference/yolo_multi_model.py:343-346), the ``model.overrides``
NMS dict (:18-22) and a tracker YAML name (:41) — SURVEY.md §5.6. Here
everything is dataclasses with a YAML loader for tracker configs
(key set = ultralytics cfg/trackers/*.yaml, SURVEY.md D13), and the CLI
(cli.py) maps flags onto these.
"""

from __future__ import annotations

import dataclasses
import os

from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
from strongsort_yolo_tpu.track.strongsort import StrongSortConfig

TrackerConfig = ByteTrackConfig | StrongSortConfig


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Model + NMS configuration (reference ``model.overrides`` parity:
    conf=0.3, iou=0.4, agnostic_nms=False, max_det=1000 at
    yolo_multi_model.py:18-21)."""

    weights: str = "yolov8n"  # model name or checkpoint path
    imgsz: int = 640
    conf: float = 0.3
    iou: float = 0.4
    agnostic_nms: bool = False
    max_det: int = 1000
    classes: tuple[int, ...] | None = None  # optional class filter (:22)
    half: bool = True  # bfloat16 compute on TPU
    fuse: bool = True  # fold BN into convs
    quant: str | None = None  # "int8": post-training quantization of
    # the fused conv stack (ops/quant.py — per-channel int8 weights,
    # dynamic per-tensor int8 activations, int32 MXU accumulation;
    # v5e int8 peak is 2x bf16). Head output layers stay bf16.


# Built-in tracker configs by name — the reference passes
# ``tracker="botsort.yaml"`` (yolo_multi_model.py:41).
_BUILTIN_TRACKERS = {
    "botsort.yaml": ByteTrackConfig(tracker_type="botsort"),
    "botsort": ByteTrackConfig(tracker_type="botsort"),
    "bytetrack.yaml": ByteTrackConfig(
        tracker_type="bytetrack", gmc_method="none"
    ),
    "bytetrack": ByteTrackConfig(tracker_type="bytetrack", gmc_method="none"),
    "botsort-reid.yaml": ByteTrackConfig(tracker_type="botsort", with_reid=True),
    "botsort-reid": ByteTrackConfig(tracker_type="botsort", with_reid=True),
    "strongsort.yaml": StrongSortConfig(),
    "strongsort": StrongSortConfig(),
}

_STRONGSORT_YAML_KEYS = {
    "det_thresh", "max_cosine_distance", "lambda_appearance",
    "match_thresh", "max_iou_distance", "max_age", "n_init", "ema_alpha",
    "gmc_method",
}

_TRACKER_YAML_KEYS = {
    "tracker_type": "tracker_type",
    "track_high_thresh": "track_high_thresh",
    "track_low_thresh": "track_low_thresh",
    "new_track_thresh": "new_track_thresh",
    "track_buffer": "track_buffer",
    "match_thresh": "match_thresh",
    "fuse_score": "fuse_score",
    "gmc_method": "gmc_method",
    "proximity_thresh": "proximity_thresh",
    "appearance_thresh": "appearance_thresh",
    "with_reid": "with_reid",
}


def load_tracker_config(name_or_path: str) -> TrackerConfig:
    """Resolve a tracker config by built-in name or YAML file path."""
    if name_or_path in _BUILTIN_TRACKERS:
        return _BUILTIN_TRACKERS[name_or_path]
    if os.path.exists(name_or_path):
        import yaml

        with open(name_or_path) as f:
            raw = yaml.safe_load(f) or {}
        if raw.get("tracker_type") == "strongsort":
            kwargs = {
                k: v for k, v in raw.items() if k in _STRONGSORT_YAML_KEYS
            }
            return StrongSortConfig(**kwargs)
        kwargs = {
            _TRACKER_YAML_KEYS[k]: v
            for k, v in raw.items()
            if k in _TRACKER_YAML_KEYS
        }
        return ByteTrackConfig(**kwargs)
    raise ValueError(
        f"unknown tracker {name_or_path!r}; use one of "
        f"{sorted(set(_BUILTIN_TRACKERS))} or a YAML path"
    )
