"""Fixed-slot track state — the tracker's entire memory as one pytree.

The reference stack keeps tracks as Python lists of STrack objects
(``tracked_stracks`` / ``lost_stracks``, ultralytics byte_tracker —
reached via /root/reference/yolo_multi_model.py:41 with
``persist=True``), which forces dynamic shapes and host control flow.
Here a stream's tracker memory is K pre-allocated slots of pure
arrays: births claim EMPTY slots, deaths release them, and every
transition is a masked vectorized op. The pytree is also trivially
checkpointable (orbax) and batchable across streams with vmap/shard_map
(SURVEY.md §5.4, §2.5).

Status encoding (``STATUS_*``): EMPTY=0, TRACKED=1, LOST=2.
"Unconfirmed" (ByteTrack's tentative state) is TRACKED with
``activated=False``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STATUS_EMPTY = 0
STATUS_TRACKED = 1
STATUS_LOST = 2


class TrackState(NamedTuple):
    mean: jnp.ndarray  # (K, 8) KF mean (cx, cy, w|a, h, velocities)
    cov: jnp.ndarray  # (K, 8, 8) KF covariance
    track_id: jnp.ndarray  # (K,) int32; 0 = unassigned
    status: jnp.ndarray  # (K,) int32 STATUS_*
    activated: jnp.ndarray  # (K,) bool — ByteTrack is_activated
    score: jnp.ndarray  # (K,) float32 last detection confidence
    cls: jnp.ndarray  # (K,) int32 class id
    feat: jnp.ndarray  # (K, D) EMA appearance embedding (L2-normed)
    end_frame: jnp.ndarray  # (K,) int32 frame of last update
    hits: jnp.ndarray  # (K,) int32 number of matched updates
    next_id: jnp.ndarray  # () int32 next track id to hand out
    frame_id: jnp.ndarray  # () int32 current frame counter
    dropped_births: jnp.ndarray  # () int32 births lost to slot overflow
    truncated_dets: jnp.ndarray  # () int32 valid detections that never
    # reached association because they ranked below tracker_max_dets
    # (reference parity gap: ultralytics feeds EVERY det above
    # track_low_thresh to the tracker, max_det=1000 — SURVEY.md D9)


class TrackOutputs(NamedTuple):
    """Per-frame tracker emission (fixed shape, per slot)."""

    boxes: jnp.ndarray  # (K, 4) xyxy, KF-filtered, model-input coords
    track_id: jnp.ndarray  # (K,) int32
    score: jnp.ndarray  # (K,) float32
    cls: jnp.ndarray  # (K,) int32
    active: jnp.ndarray  # (K,) bool — rows to draw/log this frame
    det_index: jnp.ndarray  # (K,) int32 — detection that updated this
    # slot this frame (-1 if none); carries masks/kpts to track rows


def init_track_state(num_slots: int = 128, feat_dim: int = 0) -> TrackState:
    k = num_slots
    d = max(feat_dim, 1)
    return TrackState(
        mean=jnp.zeros((k, 8), jnp.float32),
        cov=jnp.zeros((k, 8, 8), jnp.float32),
        track_id=jnp.zeros((k,), jnp.int32),
        status=jnp.full((k,), STATUS_EMPTY, jnp.int32),
        activated=jnp.zeros((k,), bool),
        score=jnp.zeros((k,), jnp.float32),
        cls=jnp.zeros((k,), jnp.int32),
        feat=jnp.zeros((k, d), jnp.float32),
        end_frame=jnp.zeros((k,), jnp.int32),
        hits=jnp.zeros((k,), jnp.int32),
        next_id=jnp.int32(1),
        frame_id=jnp.int32(0),
        dropped_births=jnp.int32(0),
        truncated_dets=jnp.int32(0),
    )
