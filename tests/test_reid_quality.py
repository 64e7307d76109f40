"""Appearance-quality e2e on real signal (VERDICT r2 #6).

Proves the ReID term EARNS its cost: the trained detector (assets/)
drives StrongSORT+OSNet through an occlusion-bounce scenario — two
visually distinct objects slide behind a static wall at the same
frame, BOUNCE while fully hidden, and re-emerge simultaneously on
their original sides. A constant-velocity KF coasts each track past
the midpoint during the 29-frame blind window, so at re-emergence
each track's prediction is strictly CLOSER to the other object's
detection: motion-only association swaps the identities, and the
appearance term (cosine distance between OSNet embeddings of the
two gradient patterns) must recover the truth. The chi2 gate radius
after 29 coasts was measured (maha^2 < 3 at 110 px) so both the
true and the swapped pairings stay inside the gate — the decision
is made by the cost blend, not the gate.

"Without ReID" = the same StrongSORT step with lambda_appearance=0
and the appearance gate disabled (max_cosine_distance=1.0) — the
motion/gating math is identical, only the appearance term is removed.
"""

import os

import numpy as np
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.strongsort import StrongSortConfig
from strongsort_yolo_tpu.utils.metrics import evaluate_mot

CKPT = os.path.join(os.path.dirname(__file__), "..", "assets", "yolov8n_synth160.npz")


class BounceClip:
    """Two gradient-shaded squares approach a static wall along x,
    vanish behind it the SAME frame, bounce while hidden, re-emerge
    the SAME frame on their original sides.  Occlusion is abrupt: an
    object is not drawn at all once >=HIDE_PX of it overlaps the wall
    (gradual sliver occlusion corrupts the KF velocity estimate and
    desynchronizes the blind windows — measured in round 3).  Speeds
    differ (2.3 vs 2.7 px/frame) so the coasted predictions cross the
    midpoint by different margins and the motion-only 2x2 assignment
    strictly prefers the SWAPPED pairing; appearance (one square is
    bright-at-bottom, the other bright-at-top — the pattern pair with
    the largest trained-detector-safe OSNet cosine separation) must
    recover the true identities.  Ground truth: id1=left object,
    id2=right, id3=wall; objects appear in truth only while drawn."""

    # square occluder at the trained detector's object scale (a tall
    # wall splits into two stacked detections and floods the metric
    # with fp); drawn on top of everything
    WALL = (116.0, 108.0, 204.0, 196.0)
    HIDE_PX = 16.0  # hide the object once this much overlaps the wall

    def __init__(self, num_frames=64, size=(320, 320), seed=5):
        self.num_frames = num_frames
        self.h, self.w = size
        self._bg = np.random.default_rng(seed)
        self.box = 64.0
        self.y = {1: 120.0, 2: 126.0}
        self.grad = {1: (0.4, 0.9), 2: (0.9, 0.4)}  # top->bottom shade
        # both cross the hide threshold at t=16 and re-emerge at t=45
        # (29 blind frames; coasted overshoot 69 px / 81 px vs a
        # 125 px re-emergence separation -> predictions cross)
        self.v = {1: 2.3, 2: -2.7}
        self.x0 = {1: 68.0 - 16 * 2.3, 2: 188.0 + 16 * 2.7}
        self.t_bounce = 30  # both fully hidden by the wall here

    def _x(self, tid, t):
        tb, v = self.t_bounce, self.v[tid]
        return self.x0[tid] + (v * t if t <= tb else v * (2 * tb - t))

    def _hidden(self, tid, t):
        x1 = self._x(tid, t)
        wx1, _, wx2, _ = self.WALL
        overlap = min(x1 + self.box, wx2) - max(x1, wx1)
        return overlap >= self.HIDE_PX

    def truth(self, t):
        rows = [
            (tid, self._x(tid, t), self.y[tid],
             self._x(tid, t) + self.box, self.y[tid] + self.box)
            for tid in (1, 2)
            if not self._hidden(tid, t)
        ]
        rows.append((3, *self.WALL))
        return rows

    def __iter__(self):
        b = int(self.box)
        for t in range(self.num_frames):
            frame = (self._bg.uniform(0, 0.3, (self.h, self.w, 3)) * 255
                     ).astype(np.uint8)
            for tid in (1, 2):
                if self._hidden(tid, t):
                    continue
                x1, y1 = int(self._x(tid, t)), int(self.y[tid])
                lo, hi = self.grad[tid]
                g = (np.linspace(lo, hi, b)[:, None, None] * 255)
                frame[y1:y1 + b, x1:x1 + b] = g.astype(np.uint8)
            wx1, wy1, wx2, wy2 = (int(v) for v in self.WALL)
            frame[wy1:wy2, wx1:wx2] = int(0.66 * 255)  # wall on top
            yield frame


def _run(reid: bool, collect=None, reid_weights=None):
    tracker = StrongSortConfig(
        gmc_method="none",
        max_age=60,  # survive the blind window (both arms; the right
        # object's detector blindness extends ~9 frames past the
        # geometric re-emergence on each side — wall adjacency)
        **({} if reid else
           dict(lambda_appearance=0.0, max_cosine_distance=1.0)),
    )
    pipe = Pipeline(
        DetectorConfig(weights=CKPT, imgsz=160, conf=0.3, iou=0.4,
                       max_det=16, half=False),
        tracker=tracker, track_slots=16, tracker_max_dets=16,
        reid_weights=reid_weights,
    )
    clip = BounceClip()
    gt_frames, hyp_frames = [], []
    for t, frame in enumerate(clip):
        r = pipe.track(frame)
        gt_frames.append([tuple(g) for g in clip.truth(t)])
        hyp_frames.append(
            [(int(r.boxes.id[i]), *r.boxes.xyxy[i]) for i in range(len(r.boxes))]
        )
        if collect is not None:
            collect.append((t, hyp_frames[-1]))
    return evaluate_mot(gt_frames, hyp_frames)


def test_reid_recovers_identity_through_occlusion_bounce():
    m_with = _run(reid=True)
    m_without = _run(reid=False)
    # the appearance term must measurably improve identity quality
    assert m_with["idf1"] > m_without["idf1"] + 0.05, (m_with, m_without)
    assert m_with["idf1"] > 0.8, m_with
    # and must not cost detection quality
    assert m_with["mota"] >= m_without["mota"] - 1e-6, (m_with, m_without)


if __name__ == "__main__":  # manual diagnostics
    for reid in (True, False):
        log = []
        m = _run(reid, collect=log)
        print("reid" if reid else "motion-only", m)
        for t, rows in log:
            print(t, [(tid, round(x1), round(y1)) for tid, x1, y1, *_ in rows])


def test_reid_recovery_with_trained_embedder():
    """Same occlusion bounce, but with the in-repo TRAINED embedder
    (assets/osnet_x0_25_synth.npz, tools/train_osnet.py) instead of
    random-init OSNet: learned appearance must also recover the swap,
    proving the trained checkpoint works end to end in the tracker."""
    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "assets", "osnet_x0_25_synth.npz"
    )
    m = _run(reid=True, reid_weights=ckpt)
    # The trained net separates the two patterns 6x more widely than
    # random init (same/diff cosine 0.955/0.758 vs 1.000/0.965) but
    # these gradient squares + wall-gray partial crops are far outside
    # its clothing-recipe training domain, so the e2e margin is
    # smaller than the random-init run tuned for this scene. The
    # load-bearing claim: LEARNED appearance still clearly beats
    # motion-only association (idf1 0.697, idsw 4 measured on this
    # clip with the same detector).
    assert m["idf1"] > 0.73, m
    assert m["idsw"] <= 3, m  # motion-only: 4
