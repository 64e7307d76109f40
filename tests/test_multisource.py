"""Concurrent multi-source execution: the batched lockstep device path
must be output-identical to sequential per-source runs (reference
parity target: Pool-of-processes concurrency at
/root/reference/yolo_multi_model.py:353-354)."""

import os

import numpy as np
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.media.video import SyntheticSource
from strongsort_yolo_tpu.pipeline import Pipeline


@pytest.fixture(scope="module")
def pipe():
    return Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        tracker="bytetrack.yaml",
        track_slots=16,
        tracker_max_dets=16,
    )


def test_batched_pipeline_equals_sequential(pipe):
    """S streams through BatchedPipeline == S independent sequential
    runs: same boxes, same track ids, frame by frame."""
    rng = np.random.default_rng(0)
    S, T = 3, 4
    frames = rng.integers(0, 255, (S, T, 240, 320, 3), dtype=np.uint8)
    for s in range(S):
        frames[s, :, 40 + 30 * s : 120 + 30 * s, 60:180] = (40, 180, 220)

    seq = []
    for s in range(S):
        pipe.reset()
        seq.append([pipe.track(frames[s, t]) for t in range(T)])

    bp = pipe.track_batch_prepare(S, (240, 320))
    bat = [bp.step(frames[:, t]) for t in range(T)]

    for s in range(S):
        for t in range(T):
            a, b = seq[s][t].boxes, bat[t][s].boxes
            assert len(a) == len(b)
            np.testing.assert_allclose(a.xyxy, b.xyxy, atol=1e-4)
            if a.id is not None:
                np.testing.assert_array_equal(a.id, b.id)


def test_batched_reset_stream(pipe):
    """reset_stream reinitializes exactly one stream's slots."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 240, 320, 3), dtype=np.uint8)
    frames[:, 60:140, 80:180] = (40, 180, 220)
    bp = pipe.track_batch_prepare(2, (240, 320))
    bp.step(frames)
    bp.step(frames)
    assert all(int(f) == 2 for f in np.asarray(bp.states.frame_id))
    bp.reset_stream(0)
    fids = np.asarray(bp.states.frame_id)
    assert int(fids[0]) == 0 and int(fids[1]) == 2


def _labels(path):
    with open(path) as f:
        return f.read()


def test_app_batched_matches_sequential_uneven_lengths(tmp_path):
    """Full app: 3 synthetic sources of DIFFERENT lengths run batched
    vs sequentially — per-stream label files must be byte-identical,
    and shorter streams must not truncate longer ones."""
    from strongsort_yolo_tpu.app import AppConfig, run

    lengths = [4, 6, 5]

    def mk_sources():
        return [
            SyntheticSource(num_frames=n, size=(240, 320), num_objects=2, seed=s)
            for s, n in enumerate(lengths)
        ]

    base = dict(
        track=True, count=True, weights="yolov8n", imgsz=160, max_det=16,
        half=False,
    )
    cfg_b = AppConfig(output_dir=str(tmp_path / "bat"), **base)
    cfg_s = AppConfig(
        output_dir=str(tmp_path / "seq"), multi_mode="sequential", **base
    )
    stats_b = run(cfg_b, sources=mk_sources())
    stats_s = run(cfg_s, sources=mk_sources())

    for sb, ss, n in zip(stats_b, stats_s, lengths):
        assert sb.frames == ss.frames == n
        assert sb.failed is None and sb.errors == 0
        assert _labels(sb.labels_file) == _labels(ss.labels_file)
        assert sb.counts == ss.counts
        assert os.path.getsize(sb.output_video) > 0


def test_app_batched_mixed_resolutions(tmp_path):
    """Mixed-resolution sources fall into per-resolution groups; all
    still complete with correct frame counts."""
    from strongsort_yolo_tpu.app import AppConfig, run

    sources = [
        SyntheticSource(num_frames=3, size=(240, 320), num_objects=2, seed=0),
        SyntheticSource(num_frames=3, size=(192, 256), num_objects=2, seed=1),
        SyntheticSource(num_frames=3, size=(240, 320), num_objects=2, seed=2),
    ]
    cfg = AppConfig(
        track=True, weights="yolov8n", imgsz=160, max_det=16, half=False,
        output_dir=str(tmp_path),
    )
    stats = run(cfg, sources=sources)
    assert [s.frames for s in stats] == [3, 3, 3]
    assert all(s.failed is None for s in stats)
    # distinct per-stream outputs despite identical basenames
    assert len({s.labels_file for s in stats}) == 3


def test_track_async_equals_track(pipe):
    """One-tick overlapped dispatch (track_async + materialize) is
    exactly the synchronous track()."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (3, 240, 320, 3), dtype=np.uint8)
    frames[:, 60:140, 80:180] = (40, 180, 220)

    pipe.reset()
    sync = [pipe.track(f) for f in frames]
    pipe.reset()
    handles = []
    overlapped = []
    for f in frames:
        h = pipe.track_async(f)
        if handles:
            overlapped.append(pipe.materialize(handles.pop()))
        handles.append(h)
    overlapped.append(pipe.materialize(handles.pop()))

    for a, b in zip(sync, overlapped):
        np.testing.assert_allclose(a.boxes.xyxy, b.boxes.xyxy, atol=1e-4)
        if a.boxes.id is not None:
            np.testing.assert_array_equal(a.boxes.id, b.boxes.id)


def test_batched_pipeline_carries_seg_extras():
    """Batched multi-stream mode keeps masks identical to sequential
    per-stream runs (full reference capability in the concurrent
    path)."""
    rng = np.random.default_rng(4)
    S, T = 2, 2
    frames = rng.integers(0, 255, (S, T, 240, 320, 3), dtype=np.uint8)
    frames[:, :, 60:140, 80:180] = (40, 180, 220)
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n-seg", imgsz=160, half=False, max_det=16),
        tracker="bytetrack.yaml", track_slots=16, tracker_max_dets=16,
    )
    seq = []
    for s in range(S):
        pipe.reset()
        seq.append([pipe.track(frames[s, t]) for t in range(T)])
    bp = pipe.track_batch_prepare(S, (240, 320))
    bat = [bp.step(frames[:, t]) for t in range(T)]
    for s in range(S):
        for t in range(T):
            a, b = seq[s][t], bat[t][s]
            assert (a.masks is None) == (b.masks is None)
            if a.masks is not None and len(a.masks):
                np.testing.assert_allclose(a.masks.data, b.masks.data, atol=1e-4)


def test_batched_strongsort_packed_reid_equals_sequential():
    """Batched StrongSORT with the packed ReID crop/stem path
    (reid_packed=True) == plain-path sequential runs: the packed
    layout survives the vmapped batched program unchanged."""
    rng = np.random.default_rng(2)
    S, T = 2, 3
    frames = rng.integers(0, 255, (S, T, 240, 320, 3), dtype=np.uint8)
    for s in range(S):
        frames[s, :, 50 + 20 * s : 130 + 20 * s, 70:170] = (60, 160, 230)

    def mk(packed):
        return Pipeline(
            DetectorConfig(weights="yolov8n", imgsz=160, half=False,
                           max_det=16),
            tracker="strongsort.yaml", track_slots=16,
            tracker_max_dets=16, reid_packed=packed, seed=3,
        )

    plain = mk(False)
    seq = []
    for s in range(S):
        plain.reset()
        seq.append([plain.track(frames[s, t]) for t in range(T)])

    bp = mk(True).track_batch_prepare(S, (240, 320))
    bat = [bp.step(frames[:, t]) for t in range(T)]

    for s in range(S):
        for t in range(T):
            a, b = seq[s][t].boxes, bat[t][s].boxes
            assert len(a) == len(b)
            np.testing.assert_allclose(a.xyxy, b.xyxy, atol=1e-3)
            if a.id is not None:
                np.testing.assert_array_equal(a.id, b.id)
