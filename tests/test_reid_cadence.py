"""Embed cadence (round 5, VERDICT r4 #1 secondary lever): with
``reid_cadence=k``, stream s contributes ReID crops only on ticks
where (s + tick) % k == 0. Skip frames carry all-zero det features and
the StrongSORT stage-1 cost falls back to motion-only
(strongsort_step ``has_app``); the EMA appearance bank holds. The
packed total-slot ladder sees the masked demand, so the steady-state
bucket shrinks ~k-fold.

Quality deltas of k>1 are measured on the occlusion-relay clip
(tools/eval_sequence --cadence; BASELINE.md round-5 table) — these
tests pin the MECHANICS: masking, ladder demand, replay interaction,
and that slow scenes track identically with and without cadence.
"""

import numpy as np
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline

from tests.test_auto_topk import _frames


def _mk_pipe(cadence=1):
    import os

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "assets", "yolov8n_synth160.npz"
    )
    return Pipeline(
        DetectorConfig(weights=ckpt, imgsz=160, half=False, max_det=16),
        tracker="strongsort.yaml", track_slots=16, tracker_max_dets=16,
        reid_topk=16, reid_cadence=cadence,
    )


def test_cadence_masks_alternate_and_demand_shrinks():
    """S=2, k=2: each tick embeds exactly one stream (staggered), and
    a per-stream load that forces the WIDE bucket at cadence 1 stays on
    the NARROW bucket under cadence 2 (the masked demand halves)."""
    frame_seq = [_frames(t, 9) for t in range(8)]  # dense: 9 rects each

    pipe1 = _mk_pipe(cadence=1)
    bp1 = pipe1.track_batch_prepare(2, (320, 320), auto_topk=True)
    for f in frame_seq:
        bp1.step(f)
    assert bp1._bucket == 32  # both streams embed: 16+16 slots

    pipe2 = _mk_pipe(cadence=2)
    bp2 = pipe2.track_batch_prepare(2, (320, 320), auto_topk=True)
    masks = []
    for f in frame_seq:
        h = bp2.step_async(f)
        masks.append(np.asarray(h.embed_mask))
        bp2.materialize(h)
    assert bp2._bucket == 16  # one stream per tick: <= 16 slots
    masks = np.stack(masks)
    # staggered: tick t embeds stream (t % 2 == s phase), one per tick
    assert (masks.sum(axis=1) == 1).all()
    assert (masks[0] != masks[1]).all()
    assert (masks[0] == masks[2]).all()


def test_cadence_slow_scene_tracks_identically():
    """On a slow scene (the fixture drifts ~1 px/tick) motion-only
    skip-frame association must pick the same det-track pairing as
    full appearance: ids and boxes identical tick for tick."""
    frame_seq = [_frames(t, 4) for t in range(10)]

    pipe1 = _mk_pipe(cadence=1)
    bp1 = pipe1.track_batch_prepare(2, (320, 320), auto_topk=True)
    ref = [bp1.step(f) for f in frame_seq]

    pipe2 = _mk_pipe(cadence=2)
    bp2 = pipe2.track_batch_prepare(2, (320, 320), auto_topk=True)
    got = [bp2.step(f) for f in frame_seq]

    for t, (rs_ref, rs_got) in enumerate(zip(ref, got)):
        for s, (a, b) in enumerate(zip(rs_ref, rs_got)):
            assert len(a.boxes) == len(b.boxes), (t, s)
            if a.boxes.id is not None:
                np.testing.assert_array_equal(
                    a.boxes.id, b.boxes.id, err_msg=f"t={t} s={s}"
                )
            np.testing.assert_allclose(
                a.boxes.xyxy, b.boxes.xyxy, atol=1e-2,
                err_msg=f"t={t} s={s}",
            )


def test_cadence_overflow_replays_with_same_mask():
    """A burst that overflows the bucket must replay with each tick's
    ORIGINAL cadence mask (determinism of the committed results).

    S=3 / cadence 2 alternates 2-embedding-stream and 1-embedding-
    stream ticks (ladder base 24, cap_total 48): a dense burst on a
    2-stream tick pads to 16+16 = 32 > 24 and must replay at 48."""
    schedule = [1] * 4 + [9] * 3 + [1] * 2
    frame_seq = [_frames(t, n, S=3) for t, n in enumerate(schedule)]

    pipe = _mk_pipe(cadence=2)
    bp = pipe.track_batch_prepare(3, (320, 320), auto_topk=True)
    assert bp._ladder[0] == 24
    handles = [bp.step_async(f) for f in frame_seq]
    res = [bp.materialize(h) for h in handles]
    assert bp.n_replays > 0  # the burst overflowed the narrow bucket
    # masks still follow the (s + tick) % 2 stagger after the replay
    for t, h in enumerate(handles):
        np.testing.assert_array_equal(
            np.asarray(h.embed_mask),
            (np.arange(3) + t) % 2 == 0,
        )
    assert all(len(r) == 3 for r in res)


def test_cadence_rejects_botsort_with_reid():
    import os

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "assets", "yolov8n_synth160.npz"
    )
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    pipe = Pipeline(
        DetectorConfig(weights=ckpt, imgsz=160, half=False, max_det=16),
        tracker=ByteTrackConfig(tracker_type="botsort", with_reid=True,
                                gmc_method="none"),
        track_slots=16, tracker_max_dets=16, reid_topk=16, reid_cadence=2,
    )
    with pytest.raises(ValueError, match="StrongSORT"):
        pipe.track_batch_prepare(2, (320, 320), auto_topk=True)
