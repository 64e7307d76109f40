"""Crowded-scene association (VERDICT r2 #5).

The reference feeds EVERY detection above track_low_thresh to the
tracker (max_det=1000, /root/reference/yolo_multi_model.py:21 +
SURVEY.md D9). This repo bounds the association problem at
``tracker_max_dets`` confidence-sorted rows and the track store at
``track_slots`` slots. These tests pin the crowding semantics:

- at full width, a 250-object scene is tracked losslessly;
- truncation to 128 rows demonstrably loses objects (the gap the
  ``truncated_dets`` counter exists to surface);
- slot overflow is counted in ``dropped_births``;
- the pipeline-level ``truncated_dets`` counter matches the exact
  number of valid detections beyond the cut.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state


def _crowd_frame(t: int, n: int = 250):
    """n well-separated 30x30 boxes on a 16x16 grid, drifting
    +2px/frame. Returns (boxes (n,4) xyxy, scores (n,))."""
    idx = np.arange(n)
    gx, gy = idx % 16, idx // 16
    x1 = gx * 60.0 + 2.0 * t
    y1 = gy * 60.0 + 2.0 * t
    boxes = np.stack([x1, y1, x1 + 30.0, y1 + 30.0], axis=1)
    scores = np.full((n,), 0.9, np.float32) - 1e-4 * idx  # strict order
    return boxes.astype(np.float32), scores


def _run(num_dets_fed: int, track_slots: int, frames: int = 3, n: int = 250):
    """Feed the top ``num_dets_fed`` rows of the 250-object scene for
    ``frames`` frames; return (state, last outputs)."""
    cfg = ByteTrackConfig(tracker_type="bytetrack", gmc_method="none")
    state = init_track_state(track_slots)
    step = jax.jit(lambda st, b, s, c, v: bytetrack_step(st, b, s, c, v, cfg))
    out = None
    for t in range(frames):
        boxes, scores = _crowd_frame(t, n)
        b, s = boxes[:num_dets_fed], scores[:num_dets_fed]
        valid = np.ones((num_dets_fed,), bool)
        state, out = step(
            state, jnp.asarray(b), jnp.asarray(s),
            jnp.zeros((num_dets_fed,), jnp.int32), jnp.asarray(valid),
        )
    return jax.tree.map(np.asarray, state), jax.tree.map(np.asarray, out)


def test_full_width_250_objects_lossless():
    """256-row association + 512 slots: every one of 250 objects is
    born on frame 1 and stays matched — no drops, stable ids."""
    state, out = _run(num_dets_fed=250, track_slots=512)
    assert int(out.active.sum()) == 250
    assert int(state.dropped_births) == 0
    # ids are 1..250, each exactly once
    ids = np.sort(out.track_id[out.active])
    np.testing.assert_array_equal(ids, np.arange(1, 251))


def test_truncation_to_128_loses_objects():
    """The 128-row cut demonstrably drops objects in this scene —
    the documented reason tracker_max_dets defaults must be sized to
    the scene (and why truncated_dets is surfaced)."""
    state, out = _run(num_dets_fed=128, track_slots=512)
    assert int(out.active.sum()) == 128  # 122 objects never tracked


def test_slot_overflow_counts_dropped_births():
    state, out = _run(num_dets_fed=250, track_slots=128, frames=1)
    assert int(out.active.sum()) == 128
    assert int(state.dropped_births) == 250 - 128


def test_pipeline_truncated_dets_counter():
    """Pipeline-level counter: valid dets beyond tracker_max_dets are
    counted exactly (cross-checked against predict() on the same
    frame)."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline

    det_cfg = DetectorConfig(  # conf far below the random-init cls
        weights="yolov8n", imgsz=160, conf=1e-8, max_det=64, half=False
    )  # bias so plenty of NMS rows come out valid
    pipe = Pipeline(
        det_cfg, tracker="bytetrack.yaml", track_slots=32,
        tracker_max_dets=8,
    )
    frame, n_dets = None, 0
    for seed in range(8):  # find a frame the random-weight detector
        rng = np.random.default_rng(seed)  # fires >8 NMS rows on
        cand = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        n = len(pipe.predict(cand).boxes)  # all valid NMS rows
        if n > n_dets:
            frame, n_dets = cand, n
        if n_dets > 8:
            break
    if n_dets <= 8:
        pytest.skip("random-weight detector produced too few dets")
    pipe.track(frame)
    assert int(pipe.track_state.truncated_dets) == n_dets - 8
    pipe.track(frame)
    assert int(pipe.track_state.truncated_dets) == 2 * (n_dets - 8)
