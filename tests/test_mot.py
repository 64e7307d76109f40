"""MOT-format loader + public-detection tracking harness on a
generated mini-sequence (no media assets; SURVEY.md §4)."""

import os

import numpy as np
import jax
import pytest

from strongsort_yolo_tpu.data.mot import (
    MotSequence,
    evaluate_sequence,
    save_mot_results,
    track_sequence_public,
)


@pytest.fixture(scope="module")
def mini_seq(tmp_path_factory):
    """Fabricate a MOT17-layout sequence with 3 moving objects."""
    import cv2

    root = tmp_path_factory.mktemp("MOT17-mini") / "MINI-01"
    img1 = root / "img1"
    img1.mkdir(parents=True)
    (root / "gt").mkdir()
    (root / "det").mkdir()
    n_frames, w, h = 25, 320, 240
    objs = [(1, 20.0, 30.0, 3.0, 1.0), (2, 150.0, 60.0, -2.0, 2.0),
            (3, 250.0, 150.0, -3.0, -1.5)]
    gt_lines, det_lines = [], []
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        frame = np.zeros((h, w, 3), np.uint8)
        for tid, x0, y0, vx, vy in objs:
            x, y = x0 + vx * t, y0 + vy * t
            bw, bh = 30.0, 50.0
            frame[int(y) : int(y + bh), int(x) : int(x + bw)] = 200
            gt_lines.append(
                f"{t+1},{tid},{x:.1f},{y:.1f},{bw},{bh},1,1,1.0\n"
            )
            jx, jy = rng.normal(0, 1.0, 2)
            det_lines.append(
                f"{t+1},-1,{x+jx:.1f},{y+jy:.1f},{bw},{bh},0.9,-1,-1,-1\n"
            )
        cv2.imwrite(str(img1 / f"{t+1:06d}.jpg"), frame)
    (root / "gt" / "gt.txt").write_text("".join(gt_lines))
    (root / "det" / "det.txt").write_text("".join(det_lines))
    (root / "seqinfo.ini").write_text(
        "[Sequence]\nname=MINI-01\nimDir=img1\nframeRate=30\n"
        f"seqLength={n_frames}\nimWidth={w}\nimHeight={h}\nimExt=.jpg\n"
    )
    return str(root)


def test_sequence_loads(mini_seq):
    seq = MotSequence(mini_seq)
    assert len(seq) == 25
    assert seq.width == 320
    gt = seq.ground_truth()
    assert len(gt) == 25
    assert len(gt[0]) == 3


def test_public_detections(mini_seq):
    seq = MotSequence(mini_seq)
    dets = seq.public_detections()
    assert len(dets[0]) == 3
    assert all(d[4] == 0.9 for d in dets[0])


def test_bytetrack_on_public_dets(mini_seq):
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
    from strongsort_yolo_tpu.track.state import init_track_state

    seq = MotSequence(mini_seq)
    cfg = ByteTrackConfig()
    step = jax.jit(
        lambda st, b, s, c, v: bytetrack_step(st, b, s, c, v, cfg)
    )
    hyp = track_sequence_public(
        seq, step, init_track_state(32), max_dets=16
    )
    m = evaluate_sequence(seq, hyp)
    assert m["mota"] > 0.9, m
    assert m["idf1"] > 0.9, m


def test_save_results_roundtrip(mini_seq, tmp_path):
    seq = MotSequence(mini_seq)
    gt = seq.ground_truth()
    path = str(tmp_path / "res.txt")
    save_mot_results(path, gt)
    assert os.path.exists(path)
    from strongsort_yolo_tpu.data.mot import load_mot_txt

    back = load_mot_txt(path, len(gt), person_only=False)
    assert len(back[0]) == len(gt[0])
    m = evaluate_sequence(seq, back)
    assert m["mota"] == 1.0
