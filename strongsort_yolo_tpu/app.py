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
  (:353-354), re-loading the model per process, and runs sources
  CONCURRENTLY via the Pool. Here the same concurrency comes from
  batching same-resolution streams into the leading axis of ONE
  jitted device program (pipeline.BatchedPipeline) — one weight set,
  one compile, one dispatch per tick — with per-stream reader threads
  feeding the lockstep loop. Mixed-resolution sources fall into
  per-resolution groups processed one group at a time;
- the host/device overlap: each loop tick dispatches frame t's device
  step asynchronously, then decodes + GMC-warps frame t+1 and draws/
  encodes frame t-1's results while the device computes (SURVEY.md §7
  hard part #6);
- fixes the same-basename label-file race (SURVEY.md §5.2) by
  suffixing duplicate stream names.
"""

from __future__ import annotations

import dataclasses
import os
import queue as queue_mod
import threading
import time

import numpy as np

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.media.annotator import make_annotator
from strongsort_yolo_tpu.media.video import SyntheticSource, VideoReader, VideoWriter
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.utils.counting import LineCrossCounter, StreamingCounter
from strongsort_yolo_tpu.utils.fps import FpsMeter
from strongsort_yolo_tpu.utils.labels import LabelWriter
from strongsort_yolo_tpu.utils.profiling import StageTimers
from strongsort_yolo_tpu.utils.trajectories import TrajectoryMemory


@dataclasses.dataclass
class AppConfig:
    sources: tuple[str, ...] = ("0",)
    track: bool = False
    count: bool = False
    weights: str = "yolov8n"
    tracker: str = "botsort.yaml"
    reid_weights: str | None = None  # OSNet variant name or .pt path
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
    multi_mode: str = "batched"  # "batched": lockstep device batch for
    # same-resolution sources (reference-parity concurrency);
    # "sequential": one source after another
    log_events: str | None = None  # JSON-lines event log (SURVEY §5.5)
    resume: bool = False  # restore tracker state + frame position from
    # the per-stream checkpoint and continue (SURVEY §5.4)
    tracker_max_dets: int = 128  # dets reaching association; measured
    # cost curve in the Pipeline docstring (crowding -> raise it)
    reid_topk: int = 128  # dets embedded per frame (ReID trackers);
    # 64 cuts the embed tax ~in half for scenes under 64 dets
    reid_auto_topk: bool = True  # batched mode (the serving default):
    # pack the real dets of all streams into one dense crop batch sized
    # by a total-count ladder; exact full-width behavior (overflowed
    # ticks replay at a wider bucket — see BatchedPipeline.auto_topk);
    # measured strictly faster than fixed width at S=16/32/64
    reid_cadence: int = 1  # appearance refresh cadence (batched packed
    # embed only): stream s embeds on ticks where (s+tick) % cadence
    # == 0; skip frames associate motion-only (StrongSORT has_app).
    # 1 = exact StrongSORT; >1 trades appearance freshness for
    # ~cadence-fold less OSNet work (quality deltas in BASELINE.md)
    quant: str | None = None  # "int8": PTQ of the detector conv stack
    # (ops/quant.py); activation scales auto-calibrate on the first
    # decoded frame of the first source
    checkpoint_every: int = 0  # save TrackState every N frames (0: only
    # when --resume is set, which defaults the cadence to 25)
    count_line: tuple[float, float, float, float] | None = None
    # directional line-cross counting (x1,y1,x2,y2 in source pixels):
    # tallies per-class in/out crossings of track centroids over the
    # directed line (in = ends left of A->B); needs --track


@dataclasses.dataclass
class StreamStats:
    source: str
    frames: int = 0
    mean_fps: float = 0.0
    counts: dict | None = None
    line_counts: dict | None = None  # {"in": {...}, "out": {...}}
    output_video: str | None = None
    labels_file: str | None = None
    errors: int = 0  # frames skipped on processing errors (SURVEY §5.3)
    failed: str | None = None  # stream-fatal error, if any
    stage_times: dict | None = None  # per-stage profile (SURVEY §5.1)
    dropped_births: int = 0  # births lost to track-slot overflow
    truncated_dets: int = 0  # valid dets that never reached association
    # (ranked below tracker_max_dets — crowding indicator; the
    # reference feeds every det >= track_low_thresh to the tracker)


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
    if not isinstance(source, str):  # synthetic test/bench sources
        return source, source.w, source.h
    if os.path.exists(source):
        # file path: prefer the native ffmpeg decode shim (SURVEY.md
        # N1/N7 — C decode on the reader thread, GIL dropped); frames
        # are bit-identical to cv2.videoio (test_native_decoder)
        from strongsort_yolo_tpu.media.native_decoder import NativeVideoReader

        reader = NativeVideoReader(source)
        if reader.ok:
            return reader, reader.width, reader.height
    reader = VideoReader(source)  # cameras + cv2 fallback
    if not reader.ok:
        print(f"Error: Could not open video file {source}.")
        return None, 0, 0
    return reader, reader.width, reader.height


def _ckpt_path(cfg: AppConfig, name: str) -> str:
    return os.path.abspath(os.path.join(cfg.output_dir, f"{name}_ckpt"))


def _ckpt_every(cfg: AppConfig) -> int:
    if cfg.checkpoint_every > 0:
        return cfg.checkpoint_every
    return 25 if cfg.resume else 0


def _try_restore(cfg: AppConfig, name: str, template):
    """-> (TrackState, last_frame_id) from the stream checkpoint, or
    None when absent / --resume not set."""
    import numpy as np_

    path = _ckpt_path(cfg, name)
    if not cfg.resume or not os.path.isdir(path):
        return None
    from strongsort_yolo_tpu.utils.checkpoint import restore_state

    data = restore_state(
        path, {"track_state": template, "frame_id": np_.asarray(0, np_.int64)}
    )
    return data["track_state"], int(data["frame_id"])


def _save_ckpt(cfg: AppConfig, name: str, track_state, frame_id: int) -> None:
    import numpy as np_

    from strongsort_yolo_tpu.utils.checkpoint import save_state

    save_state(
        _ckpt_path(cfg, name),
        {"track_state": track_state, "frame_id": np_.asarray(frame_id, np_.int64)},
    )


class _StreamCtx:
    """One stream's host-side state: annotator, analytics, writers,
    stats — shared by the sequential and batched loops."""

    def __init__(
        self, cfg: AppConfig, source, name: str, names, width, height,
        *, start_frame: int = 0, events=None,
    ):
        self.cfg = cfg
        self.source = source
        self.name = name
        self.start_frame = start_frame
        self.events = events
        self.stats = StreamStats(source=str(source))
        self.annotator = make_annotator(names, seed=cfg.seed)
        self.trails = TrajectoryMemory()
        self.counter = StreamingCounter(names)
        self.line_counter = (
            LineCrossCounter(names, cfg.count_line)
            if cfg.count_line is not None and cfg.track
            else None
        )
        self.fps = FpsMeter()
        self.timers = StageTimers()
        self.writer = None
        self.label_writer = None
        self.stop = False  # set by 'q' in show mode
        if cfg.save:
            os.makedirs(cfg.output_dir, exist_ok=True)
            out_path = os.path.join(cfg.output_dir, f"{name}_output.mp4")
            # native libav mp4 encoder (same mp4v codec the reference's
            # cv2 writer produces, yolo_multi_model.py:256-260); cv2
            # fallback when libav is absent
            from strongsort_yolo_tpu.media.native_decoder import (
                NativeVideoWriter, encoder_available,
            )

            self.writer = (
                NativeVideoWriter(out_path, width, height, cfg.out_fps)
                if encoder_available()
                else None
            )
            if self.writer is None or not self.writer.ok:
                self.writer = VideoWriter(out_path, width, height, cfg.out_fps)
            self.stats.output_video = out_path
            labels_path = os.path.join(cfg.output_dir, f"{name}_labels.txt")
            self.label_writer = LabelWriter(
                labels_path, compat=cfg.compat_labels, append=start_frame > 0
            )
            self.stats.labels_file = labels_path
        if events:
            events.log(
                "stream_start", stream=name, source=str(source),
                start_frame=start_frame,
            )
        self._t0 = time.time()

    def postprocess(self, frame: np.ndarray, results, frame_id: int):
        """Analytics + draw + encode for one frame (host work)."""
        cfg = self.cfg
        with self.timers.stage("analytics"):
            if cfg.track:
                self.trails.update(results.boxes)
                if self.label_writer:
                    self.label_writer.write_frame(frame_id, results.boxes)
                if cfg.count:
                    self.counter.update(results.boxes)
                if self.line_counter is not None:
                    self.line_counter.update(results.boxes)

        with self.timers.stage("draw"):
            frame = self.annotator.draw_results(frame, results)
            if cfg.track:
                self.annotator.draw_trails(frame, self.trails)
            if cfg.track and cfg.count:
                frame = self.annotator.draw_counts(frame, self.counter.counts())
            if self.line_counter is not None:
                self.annotator.draw_count_line(
                    frame, self.cfg.count_line, self.line_counter.totals()
                )
            self.annotator.draw_fps(frame, self.fps.tick())

        with self.timers.stage("encode"):
            if self.writer:
                self.writer.write(frame)
        if cfg.show:
            import cv2

            cv2.imshow(f"yolo_{self.source}", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                self.stop = True

    def finish(self, frames: int, track_state=None, stream_idx=None):
        """track_state: final TrackState (single or batched over
        streams; ``stream_idx`` selects the stream in the batched
        case) — source of the device-side drop/truncation counters."""
        elapsed = max(time.time() - self._t0, 1e-9)
        self.stats.frames = frames
        self.stats.mean_fps = frames / elapsed
        self.stats.counts = self.counter.counts() if self.cfg.count else None
        if self.line_counter is not None:
            self.stats.line_counts = self.line_counter.counts()
        self.stats.stage_times = self.timers.summary()
        if track_state is not None:
            db = np.asarray(track_state.dropped_births)
            td = np.asarray(track_state.truncated_dets)
            if stream_idx is not None:
                db, td = db[stream_idx], td[stream_idx]
            self.stats.dropped_births = int(db)
            self.stats.truncated_dets = int(td)
            if (self.stats.dropped_births or self.stats.truncated_dets):
                print(
                    f"[WARN] {self.name}: {self.stats.dropped_births} "
                    f"births dropped (track_slots), "
                    f"{self.stats.truncated_dets} detections truncated "
                    f"(tracker_max_dets) — raise the respective limit "
                    f"for crowded scenes"
                )
        if self.events:
            self.events.log(
                "stream_end", stream=self.name, frames=frames,
                mean_fps=round(self.stats.mean_fps, 2),
                errors=self.stats.errors, counts=self.stats.counts,
                line_counts=self.stats.line_counts,
                dropped_births=self.stats.dropped_births,
                truncated_dets=self.stats.truncated_dets,
            )
        if self.writer:
            self.writer.release()
        if self.label_writer:
            self.label_writer.close()
        if self.cfg.show:
            import cv2

            cv2.destroyAllWindows()
        return self.stats


def process_video(
    cfg: AppConfig,
    source,
    name: str,
    pipeline: Pipeline,
    events=None,
) -> StreamStats:
    """One stream's loop: read → step → overlay → write, with one-tick
    host/device overlap in track mode (frame t's GMC + frame t-1's
    drawing run while the device computes frame t-1's step)."""
    if cfg.count and not cfg.track:
        # reference behavior at yolo_multi_model.py:280-282
        print("[INFO] count works only when objects are tracking.. so use: --track --count")
        return StreamStats(source=str(source))

    reader, width, height = open_source(source)
    if reader is None:
        return StreamStats(source=str(source))

    pipeline.reset()
    start_frame = 0
    restored = _try_restore(cfg, name, pipeline.track_state) if cfg.track else None
    if restored is not None:
        pipeline.track_state, start_frame = restored
        if events:
            events.log("resume", stream=name, frame_id=start_frame)
    ctx = _StreamCtx(
        cfg, source, name, pipeline.names, width, height,
        start_frame=start_frame, events=events,
    )
    ckpt_every = _ckpt_every(cfg) if cfg.track else 0
    frame_id = 0
    pending = None  # (frame, frame_id, async handle)
    calibrated = cfg.quant != "int8"
    try:
        for frame in reader:
            frame_id += 1
            if frame_id <= start_frame:
                continue  # already processed before the restart
            if cfg.max_frames and frame_id > cfg.max_frames:
                frame_id -= 1
                break
            if not calibrated:
                # static int8 activation scales from the first real
                # frame (CPU eager, ops/quant.calibrate_scales)
                n_cal = pipeline.calibrate_int8([frame])
                print(f"[INFO] int8: calibrated {n_cal} convs")
                calibrated = True
            try:
                if cfg.track:
                    with ctx.timers.stage("dispatch"):
                        handle = pipeline.track_async(frame)
                    if ckpt_every and frame_id % ckpt_every == 0:
                        _save_ckpt(cfg, name, pipeline.track_state, frame_id)
                        if events:
                            events.log("checkpoint", stream=name, frame_id=frame_id)
                else:
                    handle = None
            except Exception as e:  # corrupt frame: skip, keep stream
                ctx.stats.errors += 1
                if events:
                    events.log("frame_error", stream=name, frame_id=frame_id, error=str(e))
                print(f"[WARN] {source} frame {frame_id} skipped: {e}")
                continue

            if pending is not None:
                pframe, pid, phandle = pending
                pending = None
                try:
                    with ctx.timers.stage("infer_track"):
                        results = pipeline.materialize(phandle)
                except Exception as e:
                    ctx.stats.errors += 1
                    if events:
                        events.log("frame_error", stream=name, frame_id=pid, error=str(e))
                    print(f"[WARN] {source} frame {pid} skipped: {e}")
                else:
                    ctx.postprocess(pframe, results, pid)

            if cfg.track:
                pending = (frame, frame_id, handle)
            else:
                with ctx.timers.stage("infer_track"):
                    results = pipeline(frame, track=False)
                ctx.postprocess(frame, results, frame_id)
            if ctx.stop:
                break
        # flush the last in-flight frame
        if pending is not None:
            pframe, pid, phandle = pending
            try:
                with ctx.timers.stage("infer_track"):
                    results = pipeline.materialize(phandle)
            except Exception as e:
                ctx.stats.errors += 1
                if events:
                    events.log("frame_error", stream=name, frame_id=pid, error=str(e))
                print(f"[WARN] {source} frame {pid} skipped: {e}")
            else:
                ctx.postprocess(pframe, results, pid)
    finally:
        if hasattr(reader, "release"):
            reader.release()
        stats = ctx.finish(
            frame_id, track_state=pipeline.track_state if cfg.track else None
        )
    return stats


# ---------------------------------------------------------------------------
# Batched concurrent multi-source (reference Pool parity, one device program)
# ---------------------------------------------------------------------------


def _reader_thread(reader, q, max_frames, skip: int = 0):
    n = 0
    try:
        for frame in reader:
            n += 1
            if n <= skip:
                continue  # already processed before a restart (resume)
            if max_frames and n > max_frames:
                break
            q.put(frame)
    finally:
        q.put(None)  # EOF sentinel
        if hasattr(reader, "release"):
            reader.release()


def _run_group_batched(
    cfg: AppConfig, pipeline: Pipeline, group, events=None
) -> list[StreamStats]:
    """Lockstep loop over same-resolution streams: one BatchedPipeline
    tick per frame index, per-stream reader threads, per-stream host
    postprocessing with error isolation (SURVEY.md §5.3)."""
    S = len(group)
    _, _, _, width, height = group[0]
    bp = pipeline.track_batch_prepare(
        S, (height, width), auto_topk=cfg.reid_auto_topk
    )
    starts = []
    for s, (source, name, _, _, _) in enumerate(group):
        restored = _try_restore(cfg, name, pipeline.track_state)
        if restored is not None:
            state_s, start = restored
            import jax as _jax

            bp.states = _jax.tree.map(
                lambda batched, one: batched.at[s].set(one), bp.states, state_s
            )
            if events:
                events.log("resume", stream=name, frame_id=start)
            starts.append(start)
        else:
            starts.append(0)
    ctxs = [
        _StreamCtx(
            cfg, source, name, pipeline.names, width, height,
            start_frame=start, events=events,
        )
        for (source, name, _, width, height), start in zip(group, starts)
    ]
    queues = [queue_mod.Queue(maxsize=4) for _ in range(S)]
    threads = [
        threading.Thread(
            target=_reader_thread,
            args=(reader, q, cfg.max_frames, start), daemon=True,
        )
        for (_, _, reader, _, _), q, start in zip(group, queues, starts)
    ]
    for t in threads:
        t.start()

    ckpt_every = _ckpt_every(cfg)
    live = np.ones(S, bool)
    frame_ids = np.asarray(starts, np.int64)
    last = [np.zeros((height, width, 3), np.uint8) for _ in range(S)]
    pending = None  # (frames list, mask, ids, async handle)

    def flush(p):
        frames, mask, ids, handle = p
        results = bp.materialize(handle)
        for s in range(S):
            if not mask[s]:
                continue
            try:
                ctxs[s].postprocess(frames[s], results[s], int(ids[s]))
            except Exception as e:
                ctxs[s].stats.errors += 1
                if events:
                    events.log(
                        "frame_error", stream=ctxs[s].name,
                        frame_id=int(ids[s]), error=str(e),
                    )
                print(f"[WARN] {ctxs[s].source} frame {ids[s]} skipped: {e}")
            if ctxs[s].stop:
                live[s] = False

    tick = 0
    while live.any():
        frames = []
        mask = live.copy()
        for s in range(S):
            if live[s]:
                f = queues[s].get()
                if f is None:
                    live[s] = False
                    mask[s] = False
                    f = last[s]
                else:
                    last[s] = f
                    frame_ids[s] += 1
            else:
                f = last[s]
            frames.append(f)
        if mask.any():
            if tick == 0 and cfg.quant == "int8":
                # static activation scales from the first real frames
                # (CPU eager, ops/quant.calibrate_scales)
                n_cal = pipeline.calibrate_int8(
                    [frames[s] for s in range(S) if mask[s]][:2]
                )
                bp.refresh_steps()
                print(f"[INFO] int8: calibrated {n_cal} convs")
            # dispatch tick t, then materialize + draw tick t-1 while
            # the device computes (JAX async dispatch)
            handle = bp.step_async(np.stack(frames))
            if pending is not None:
                flush(pending)
            pending = (frames, mask, frame_ids.copy(), handle)
            tick += 1
            if ckpt_every and tick % ckpt_every == 0:
                import jax as _jax

                bp.sync()  # commit pending auto_topk ticks before
                # reading .states (tentative while ticks are pending)
                for s in range(S):
                    if mask[s]:
                        _save_ckpt(
                            cfg, ctxs[s].name,
                            _jax.tree.map(lambda a: a[s], bp.states),
                            int(frame_ids[s]),
                        )
                if events:
                    events.log("checkpoint", tick=tick)
    if pending is not None:
        flush(pending)

    for t in threads:
        t.join(timeout=5.0)
    bp.sync()
    return [
        ctx.finish(int(n), track_state=bp.states, stream_idx=s)
        for s, (ctx, n) in enumerate(zip(ctxs, frame_ids))
    ]


def run(cfg: AppConfig, sources=None) -> list[StreamStats]:
    """Multi-source entry. One weight set shared by all streams
    (unlike the reference's per-process model copies, SURVEY.md §3.1).

    With ``multi_mode="batched"`` (default), same-resolution sources
    run CONCURRENTLY in one batched device program — the TPU-native
    equivalent of the reference's ``Pool(processes=len(sources))``
    (yolo_multi_model.py:353-354). Mixed resolutions form groups; each
    group runs batched, groups run one after another.
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
        quant=cfg.quant,
    )
    base = Pipeline(
        det_cfg, tracker=cfg.tracker, seed=cfg.seed,
        reid_weights=cfg.reid_weights,
        tracker_max_dets=cfg.tracker_max_dets,
        reid_topk=cfg.reid_topk,
        reid_cadence=cfg.reid_cadence,
    )
    from strongsort_yolo_tpu.utils.logging import EventLogger

    events = EventLogger(cfg.log_events) if cfg.log_events else None
    used: set[str] = set()
    named = [
        (src, _stream_name(src if isinstance(src, str) else "synthetic", used))
        for src in sources
    ]

    try:
        use_batched = (
            cfg.multi_mode == "batched"
            and cfg.track
            and len(sources) > 1
            and not (cfg.count and not cfg.track)
        )
        if not use_batched:
            stats = []
            for source, name in named:
                # One stream's failure must not kill the others (the
                # reference got this from Pool process isolation,
                # yolo_multi_model.py:353 — SURVEY.md §5.3).
                try:
                    stats.append(process_video(cfg, source, name, base, events))
                except Exception as e:
                    print(f"[ERROR] stream {source} failed: {e}")
                    if events:
                        events.log("stream_failed", stream=name, error=str(e))
                    stats.append(StreamStats(source=str(source), failed=str(e)))
            return stats

        # open everything, group by resolution (one compiled program per
        # (S, H, W) signature)
        stats_by_idx: dict[int, StreamStats] = {}
        groups: dict[tuple[int, int], list] = {}
        order: dict[tuple[int, int], list[int]] = {}
        for i, (source, name) in enumerate(named):
            reader, w, h = open_source(source)
            if reader is None:
                stats_by_idx[i] = StreamStats(source=str(source))
                continue
            groups.setdefault((w, h), []).append((source, name, reader, w, h))
            order.setdefault((w, h), []).append(i)

        for key, group in groups.items():
            try:
                gstats = _run_group_batched(cfg, base, group, events)
            except Exception as e:
                print(f"[ERROR] stream group {key} failed: {e}")
                if events:
                    events.log("group_failed", group=str(key), error=str(e))
                gstats = [
                    StreamStats(source=str(src), failed=str(e))
                    for src, *_ in group
                ]
            for i, st in zip(order[key], gstats):
                stats_by_idx[i] = st
        return [stats_by_idx[i] for i in range(len(named))]
    finally:
        if events:
            events.close()
