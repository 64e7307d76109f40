"""Directional line-cross counting (BASELINE.json configs[4]): unit
tests with engineered crossings + the app loop end-to-end with
--count-line (SURVEY.md F7 extension; the reference's own --count
overlay is the per-class unique-track counter at
yolo_multi_model.py:284-318)."""

import numpy as np

from strongsort_yolo_tpu.pipeline import Boxes
from strongsort_yolo_tpu.utils.counting import LineCrossCounter

NAMES = {0: "person", 2: "car"}


def boxes_at(rows):
    """rows: [(tid, cls, cx, cy)] -> Boxes with 10x10 boxes."""
    xyxy = [(cx - 5, cy - 5, cx + 5, cy + 5) for _, _, cx, cy in rows]
    return Boxes(
        np.asarray(xyxy, np.float32),
        np.full(len(rows), 0.9, np.float32),
        np.asarray([c for _, c, _, _ in rows], np.float32),
        np.asarray([t for t, _, _, _ in rows], np.float32),
    )


def test_single_crossing_direction():
    # vertical line pointing down at x=100: left of A->B is x < 100
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 80, 50)]))
    c.update(boxes_at([(1, 0, 120, 50)]))  # left -> right = "out"
    assert c.counts() == {"in": {}, "out": {"person": 1}}
    c.update(boxes_at([(1, 0, 70, 60)]))  # back = "in"
    assert c.totals() == (1, 1)


def test_no_crossing_off_segment():
    # motion crosses the infinite line but BELOW the segment end
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 80, 300)]))
    c.update(boxes_at([(1, 0, 120, 300)]))
    assert c.totals() == (0, 0)


def test_parallel_motion_never_counts():
    c = LineCrossCounter(NAMES, (0, 100, 200, 100))
    for x in range(10, 200, 20):
        c.update(boxes_at([(1, 0, x, 50)]))
    assert c.totals() == (0, 0)


def test_per_class_tallies_and_multiple_tracks():
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 80, 40), (2, 2, 130, 90), (3, 0, 90, 150)]))
    c.update(boxes_at([(1, 0, 120, 40), (2, 2, 60, 90), (3, 0, 95, 150)]))
    assert c.counts() == {"in": {"car": 1}, "out": {"person": 1}}


def test_landing_exactly_on_line_counts_once_when_leaving():
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 80, 50)]))
    c.update(boxes_at([(1, 0, 100, 50)]))  # on the line: nothing yet
    assert c.totals() == (0, 0)
    c.update(boxes_at([(1, 0, 115, 50)]))  # comes off: one crossing
    assert c.counts() == {"in": {}, "out": {"person": 1}}


def test_missed_frames_still_count_the_crossing():
    # track unmatched for a few frames while it jumps the line
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 90, 50)]))
    c.update(boxes_at([]))
    c.update(boxes_at([]))
    c.update(boxes_at([(1, 0, 140, 55)]))
    assert c.totals() == (0, 1)


def test_prune_drops_stale_tracks():
    c = LineCrossCounter(NAMES, (100, 0, 100, 200))
    c.update(boxes_at([(1, 0, 90, 50)]))
    for _ in range(400):
        c.update(boxes_at([]))
    c.prune(max_gap=300)
    c.update(boxes_at([(1, 0, 140, 55)]))  # reused id: no phantom cross
    assert c.totals() == (0, 0)


def test_app_e2e_count_line(tmp_path):
    """Trained detector + tracker on rendered video with --count-line:
    the tally must match the truth crossings of the directed line
    exactly (real detections, no oracle boxes — same trained synth
    checkpoint as tests/test_trained_e2e.py)."""
    import os

    from strongsort_yolo_tpu.app import AppConfig, run
    from strongsort_yolo_tpu.media.video import SyntheticDetSource

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "assets", "yolov8n_synth160.npz"
    )
    line_x = 120.0
    cfg = AppConfig(
        track=True,
        count=True,
        count_line=(line_x, 0.0, line_x, 320.0),
        weights=ckpt,
        tracker="bytetrack.yaml",
        imgsz=160,
        max_det=16,
        output_dir=str(tmp_path),
        half=False,
        max_frames=40,
    )
    src = SyntheticDetSource(num_frames=40, size=(320, 320), num_objects=3, seed=0)
    # oracle: truth centroid sign flips over the line
    truth_crossings = 0
    prev = {}
    for t in range(40):
        for tid, x1, y1, x2, y2 in src.truth(t):
            cx = (x1 + x2) / 2
            if tid in prev and (prev[tid] - line_x) * (cx - line_x) < 0:
                truth_crossings += 1
            prev[tid] = cx
    assert truth_crossings == 2  # seed pinned so the scene really crosses
    stats = run(cfg, sources=[src])
    assert stats[0].line_counts is not None
    got = sum(stats[0].line_counts["in"].values()) + sum(
        stats[0].line_counts["out"].values()
    )
    assert got == truth_crossings, stats[0].line_counts
    assert stats[0].frames == 40


def test_cli_parses_count_line():
    from strongsort_yolo_tpu.cli import _parse_line

    assert _parse_line("1,2,3.5,4") == (1.0, 2.0, 3.5, 4.0)
    assert _parse_line("1 2 3 4") == (1.0, 2.0, 3.0, 4.0)
    assert _parse_line(None) is None
