"""Application layer: the per-source video loop and multi-source runner.

Parity target: ``process_video`` and the ``__main__`` launcher of the
reference (/root/reference/yolo_multi_model.py:244-354, SURVEY.md
L4/L5):

- outputs ``output/{name}_output.mp4`` (15 fps default, :260) and
  ``output/{name}_labels.txt`` per stream;
- ``--count`` without ``--track`` prints the reference's hint and
  stops (:280-282);
- count overlay, FPS overlay, trajectory trails, optional live window
  with 'q' quit (:330-334);
- multi-source: the reference forks one OS process per source
  (:353-354), re-loading the model per process; here all streams share
  ONE set of model weights — round-robin on one device by default, or
  the batched device path in parallel/streams.py;
- fixes the same-basename label-file race (SURVEY.md §5.2) by
  suffixing duplicate stream names.
"""

from __future__ import annotations

import dataclasses
import os
import time

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.media.annotator import make_annotator
from strongsort_yolo_tpu.media.video import SyntheticSource, VideoReader, VideoWriter
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.utils.counting import StreamingCounter
from strongsort_yolo_tpu.utils.fps import FpsMeter
from strongsort_yolo_tpu.utils.labels import LabelWriter
from strongsort_yolo_tpu.utils.trajectories import TrajectoryMemory


@dataclasses.dataclass
class AppConfig:
    sources: tuple[str, ...] = ("0",)
    track: bool = False
    count: bool = False
    weights: str = "yolov8n"
    tracker: str = "botsort.yaml"
    conf: float = 0.3
    iou: float = 0.4
    max_det: int = 1000
    classes: tuple[int, ...] | None = None
    imgsz: int = 640
    output_dir: str = "output"
    out_fps: float = 15.0  # reference writes 15 fps regardless (:260)
    show: bool = False  # headless default (reference always imshows)
    save: bool = True
    compat_labels: bool = False  # frame-id-0 + append mode (F9 quirks)
    half: bool = True
    max_frames: int | None = None  # test/bench hook
    seed: int = 0


@dataclasses.dataclass
class StreamStats:
    source: str
    frames: int = 0
    mean_fps: float = 0.0
    counts: dict | None = None
    output_video: str | None = None
    labels_file: str | None = None
    errors: int = 0  # frames skipped on processing errors (SURVEY §5.3)
    failed: str | None = None  # stream-fatal error, if any
    stage_times: dict | None = None  # per-stage profile (SURVEY §5.1)


def _stream_name(source: str, used: set[str]) -> str:
    base = os.path.splitext(os.path.basename(str(source)))[0] or str(source)
    name = base
    i = 1
    while name in used:
        name = f"{base}_{i}"
        i += 1
    used.add(name)
    return name


def open_source(source):
    if isinstance(source, SyntheticSource):
        return source, source.w, source.h
    reader = VideoReader(source)
    if not reader.ok:
        print(f"Error: Could not open video file {source}.")
        return None, 0, 0
    return reader, reader.width, reader.height


def process_video(
    cfg: AppConfig,
    source,
    name: str,
    pipeline: Pipeline,
) -> StreamStats:
    """One stream's loop: read → step → overlay → write."""
    stats = StreamStats(source=str(source))
    if cfg.count and not cfg.track:
        # reference behavior at yolo_multi_model.py:280-282
        print("[INFO] count works only when objects are tracking.. so use: --track --count")
        return stats

    reader, width, height = open_source(source)
    if reader is None:
        return stats

    pipeline.reset()
    annotator = make_annotator(pipeline.names, seed=cfg.seed)
    trails = TrajectoryMemory()
    counter = StreamingCounter(pipeline.names)
    fps = FpsMeter()
    writer = None
    label_writer = None
    if cfg.save:
        os.makedirs(cfg.output_dir, exist_ok=True)
        out_path = os.path.join(cfg.output_dir, f"{name}_output.mp4")
        writer = VideoWriter(out_path, width, height, cfg.out_fps)
        stats.output_video = out_path
        labels_path = os.path.join(cfg.output_dir, f"{name}_labels.txt")
        label_writer = LabelWriter(labels_path, compat=cfg.compat_labels)
        stats.labels_file = labels_path

    from strongsort_yolo_tpu.utils.profiling import StageTimers

    timers = StageTimers()
    t0 = time.time()
    frame_id = 0
    try:
        for frame in reader:
            frame_id += 1
            if cfg.max_frames and frame_id > cfg.max_frames:
                break
            try:
                with timers.stage("infer_track"):
                    results = pipeline(frame, track=cfg.track)
            except Exception as e:  # corrupt frame: skip, keep stream
                stats.errors += 1
                print(f"[WARN] {source} frame {frame_id} skipped: {e}")
                continue

            with timers.stage("analytics"):
                if cfg.track:
                    trails.update(results.boxes)
                    if label_writer:
                        label_writer.write_frame(frame_id, results.boxes)
                    if cfg.count:
                        counter.update(results.boxes)

            with timers.stage("draw"):
                frame = annotator.draw_results(frame, results)
                if cfg.track:
                    annotator.draw_trails(frame, trails)
                if cfg.track and cfg.count:
                    frame = annotator.draw_counts(frame, counter.counts())
                annotator.draw_fps(frame, fps.tick())

            with timers.stage("encode"):
                if writer:
                    writer.write(frame)
            if cfg.show:
                import cv2

                cv2.imshow(f"yolo_{source}", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        if hasattr(reader, "release"):
            reader.release()
        if writer:
            writer.release()
        if label_writer:
            label_writer.close()
        if cfg.show:
            import cv2

            cv2.destroyAllWindows()

    elapsed = max(time.time() - t0, 1e-9)
    stats.frames = frame_id
    stats.mean_fps = frame_id / elapsed
    stats.counts = counter.counts() if cfg.count else None
    stats.stage_times = timers.summary()
    return stats


def run(cfg: AppConfig, sources=None) -> list[StreamStats]:
    """Multi-source entry. One weight set shared by all streams
    (unlike the reference's per-process model copies, SURVEY.md §3.1).
    """
    sources = sources if sources is not None else list(cfg.sources)
    det_cfg = DetectorConfig(
        weights=cfg.weights,
        imgsz=cfg.imgsz,
        conf=cfg.conf,
        iou=cfg.iou,
        max_det=cfg.max_det,
        classes=cfg.classes,
        half=cfg.half,
    )
    base = Pipeline(det_cfg, tracker=cfg.tracker, seed=cfg.seed)
    used: set[str] = set()
    stats = []
    for source in sources:
        name = _stream_name(
            source if isinstance(source, str) else "synthetic", used
        )
        # per-stream pipeline shares params/jit cache via the same
        # object; state reset happens inside process_video. One
        # stream's failure must not kill the others (the reference got
        # this from Pool process isolation, yolo_multi_model.py:353 —
        # SURVEY.md §5.3).
        try:
            stats.append(process_video(cfg, source, name, base))
        except Exception as e:
            print(f"[ERROR] stream {source} failed: {e}")
            stats.append(StreamStats(source=str(source), failed=str(e)))
    return stats
