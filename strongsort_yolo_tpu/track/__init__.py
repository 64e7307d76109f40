"""On-device multi-object trackers: ByteTrack, BoT-SORT, StrongSORT.

The reference's tracking happens inside ultralytics'
``model.track(..., tracker="botsort.yaml")``
(/root/reference/yolo_multi_model.py:41 — SURVEY.md D8-D13) as
host-side Python over dynamic lists. Here the whole tracker is a pure
jitted function over fixed-slot state pytrees, so detect→embed→
associate is one XLA program per frame.
"""

from strongsort_yolo_tpu.track.state import TrackState, init_track_state
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step

__all__ = [
    "TrackState",
    "init_track_state",
    "ByteTrackConfig",
    "bytetrack_step",
]
