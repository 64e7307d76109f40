"""Render demo frames from the in-repo trained checkpoints — the
rebuild's analog of the reference's ``testing.jpg`` (its only visual
artifact: an annotated sample frame with boxes/ids/counts).

Each image drives the FULL user surface (uint8 frame ->
Pipeline.track/predict -> Results -> annotator.draw_results):

- demo_track.jpg  : trained detector + ByteTrack ids + count overlay
  on a SyntheticSource frame (assets/yolov8n_synth160.npz)
- demo_seg.jpg    : trained segment model, mask fill + outline
  (assets/yolov8n_seg_synth160.npz)
- demo_pose.jpg   : trained pose model, keypoint dots + indices
  (assets/yolov8n_pose_synth160.npz)

Usage: python tools/make_demo.py [outdir=assets]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.media.annotator import make_annotator  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(ROOT, "assets")


def save(path, frame):
    import cv2

    cv2.imwrite(path, frame)
    print("wrote", path)


def demo_track(outdir):
    from strongsort_yolo_tpu.media.video import SyntheticDetSource
    from strongsort_yolo_tpu.utils.counting import StreamingCounter

    pipe = Pipeline(
        DetectorConfig(
            weights=os.path.join(ASSETS, "yolov8n_synth160.npz"),
            imgsz=160, conf=0.3, iou=0.4, max_det=16, half=False,
        ),
        track_slots=16, tracker_max_dets=16,
    )
    # the trained checkpoint's distribution (shaded boxes on noise)
    src = SyntheticDetSource(num_frames=30, num_objects=4, seed=5)
    ann = make_annotator(pipe.names)
    counter = StreamingCounter(pipe.names)
    frame = r = None
    for t, frame in enumerate(src):
        r = pipe.track(frame)
        if r.boxes.id is not None:
            counter.update(r.boxes)
    out = ann.draw_results(frame.copy(), r)
    out = ann.draw_counts(out, counter.counts())
    ann.draw_fps(out, "FPS: 1216")
    save(os.path.join(outdir, "demo_track.jpg"), out)


def demo_seg(outdir):
    rng = np.random.default_rng(3)
    size = 320
    frame = (rng.uniform(0, 0.3, (size, size, 3)) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    for cx, cy, rw, rh, c in (
        (170, 150, 52, 38, 1), (70, 240, 34, 40, 0), (250, 70, 30, 26, 2),
    ):
        ell = ((xx - cx) / rw) ** 2 + ((yy - cy) / rh) ** 2 <= 1.0
        frame[ell] = int((0.5 + 0.16 * c) * 255)
    pipe = Pipeline(
        DetectorConfig(
            weights=os.path.join(ASSETS, "yolov8n_seg_synth160.npz"),
            imgsz=160, conf=0.3, iou=0.4, max_det=8, half=False,
        ),
        track_slots=8, tracker_max_dets=8,
    )
    r = pipe.predict(frame)
    ann = make_annotator(pipe.names)
    save(os.path.join(outdir, "demo_seg.jpg"),
         ann.draw_results(frame.copy(), r))


def demo_pose(outdir):
    from strongsort_yolo_tpu.tools.train import POSE_KPT_COLORS

    rng = np.random.default_rng(11)
    size = 320
    frame = (rng.uniform(0, 0.3, (size, size, 3)) * 255).astype(np.uint8)
    x1, y1, w, h = 90.0, 70.0, 120.0, 100.0
    frame[int(y1):int(y1 + h), int(x1):int(x1 + w)] = int(
        (0.5 + 0.16 * 0) * 255
    )
    gt = []
    for k in range(5):
        while True:
            kx = x1 + rng.uniform(0.15, 0.85) * w
            ky = y1 + rng.uniform(0.15, 0.85) * h
            if not gt or min(
                max(abs(px - kx), abs(py - ky)) for px, py in gt
            ) > 18:
                break
        gt.append((kx, ky))
        iy, ix = int(ky), int(kx)
        frame[iy - 7:iy + 8, ix - 7:ix + 8] = (
            POSE_KPT_COLORS[k][::-1] * 255  # BGR frame convention
        ).astype(np.uint8)
    pipe = Pipeline(
        DetectorConfig(
            weights=os.path.join(ASSETS, "yolov8n_pose_synth160.npz"),
            imgsz=160, conf=0.3, iou=0.4, max_det=8, half=False,
        ),
        track_slots=8, tracker_max_dets=8,
    )
    r = pipe.predict(frame)
    ann = make_annotator(pipe.names)
    save(os.path.join(outdir, "demo_pose.jpg"),
         ann.draw_results(frame.copy(), r))


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else ASSETS
    demo_track(outdir)
    demo_seg(outdir)
    demo_pose(outdir)
