"""App-loop sustained-throughput bench (VERDICT r2 #9).

Measures the HOST media layer around the jitted device step — the part
of the north-star metric ("decode -> detect -> ReID -> assoc" e2e,
BASELINE.json) the device benches don't cover:

  1. native mp4 decode throughput (C libav shim, media/native_decoder),
  2. annotate + native mp4 encode throughput (drawing + libav mux),
  3. the full app loop (decode -> track -> draw -> encode) end to end.

The reference's equivalent loop is process_video
(/root/reference/yolo_multi_model.py:244-339): cv2 decode, per-frame
process(), cv2 drawing, 15-fps cv2 mp4 writer.

Caveat for (3) on this box: the TPU is reached through the axon tunnel
(~1 s per 1080p host->device frame upload, NOTES.md), which caps the
in-loop device rate at a few fps regardless of compute. Stages (1) and
(2) are tunnel-free, so "media layer sustains the device rate" is
judged by them; (3) is additionally reported on the CPU backend (run
under JAX_PLATFORMS=cpu) or at reduced resolution for an honest
all-stages number.

Usage: python tools/bench_app.py [frames] [WxH]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench_app +{time.perf_counter() - T0:.1f}s] {msg}", flush=True)


T0 = time.perf_counter()


def make_clip(path: str, n: int, w: int, h: int) -> None:
    from strongsort_yolo_tpu.media.video import SyntheticSource
    from strongsort_yolo_tpu.media import native_decoder

    src = SyntheticSource(num_frames=n, size=(h, w), num_objects=6, seed=3)
    if native_decoder.encoder_available():
        wr = native_decoder.NativeVideoWriter(path, w, h, fps=30.0)
    else:  # pragma: no cover - image lacks libav
        from strongsort_yolo_tpu.media.video import VideoWriter

        wr = VideoWriter(path, w, h, fps=30.0)
    for frame in src:
        wr.write(frame)
    wr.release()


def bench_decode(path: str) -> tuple[float, int]:
    from strongsort_yolo_tpu.app import open_source

    reader, w, h = open_source(path)
    t0 = time.perf_counter()
    n = 0
    for _ in reader:
        n += 1
    dt = time.perf_counter() - t0
    reader.release()
    return n / dt, n


def bench_draw_encode(
    path: str, n: int, w: int, h: int, backend: str = "auto"
) -> float:
    """Synthetic-results drawing + encode at a realistic det load."""
    from strongsort_yolo_tpu.media.annotator import make_annotator
    from strongsort_yolo_tpu.media import native_decoder
    from strongsort_yolo_tpu.utils.coco_names import COCO_NAMES
    from strongsort_yolo_tpu.pipeline import Boxes, Results

    rng = np.random.default_rng(0)
    k = 40  # dets/frame, matching the device-bench load
    ann = make_annotator(dict(COCO_NAMES), backend=backend)
    out = os.path.join(tempfile.gettempdir(), "bench_app_out.mp4")
    wr = (
        native_decoder.NativeVideoWriter(out, w, h, fps=15.0)
        if native_decoder.encoder_available()
        else None
    )
    frame = rng.integers(0, 255, (h, w, 3), np.uint8)
    xy = rng.uniform(0, min(w, h) - 60, (k, 2))
    boxes = Boxes(
        xyxy=np.concatenate([xy, xy + 50], 1).astype(np.float32),
        conf=np.full((k,), 0.7, np.float32),
        cls=(np.arange(k) % 80).astype(np.float32),
        id=np.arange(1, k + 1).astype(np.float32),
    )
    res = Results(boxes=boxes, names=dict(COCO_NAMES))
    t0 = time.perf_counter()
    for _ in range(n):
        img = frame.copy()
        img = ann.draw_results(img, res)
        if wr:
            wr.write(img)
    dt = time.perf_counter() - t0
    if wr:
        wr.release()
    return n / dt


def bench_full_loop(path: str, imgsz: int = 640) -> tuple[float, int]:
    from strongsort_yolo_tpu.app import AppConfig, run

    outdir = tempfile.mkdtemp(prefix="bench_app_")
    cfg = AppConfig(
        sources=(path,),
        track=True,
        count=True,
        output_dir=outdir,
        show=False,
        imgsz=imgsz,
    )
    t0 = time.perf_counter()
    stats = run(cfg)
    dt = time.perf_counter() - t0
    frames = stats[0].frames if stats else 0
    return frames / dt, frames


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    wh = sys.argv[2] if len(sys.argv) > 2 else "640x360"
    imgsz = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    w, h = (int(v) for v in wh.split("x"))

    import jax

    clip = os.path.join(tempfile.gettempdir(), f"bench_app_{w}x{h}.mp4")
    make_clip(clip, n, w, h)
    log(f"clip ready: {n} frames {w}x{h} ({os.path.getsize(clip)//1024} KB)")

    dec_fps, got = bench_decode(clip)
    log(f"decode only (native shim): {dec_fps:.1f} fps ({got} frames)")

    enc_fps = bench_draw_encode(clip, n, w, h, backend="cv2")
    log(f"draw+encode cv2 backend (40 dets/frame): {enc_fps:.1f} fps")
    enc_fps_nat = bench_draw_encode(clip, n, w, h, backend="native")
    log(f"draw+encode native backend (40 dets/frame): {enc_fps_nat:.1f} fps")

    full_fps, frames = bench_full_loop(clip, imgsz)
    log(
        f"full loop decode->track->draw->encode [{jax.default_backend()}] "
        f"imgsz={imgsz}: {full_fps:.1f} fps ({frames} frames)"
    )
    print(
        {
            "decode_fps": round(dec_fps, 1),
            "draw_encode_cv2_fps": round(enc_fps, 1),
            "draw_encode_native_fps": round(enc_fps_nat, 1),
            "full_loop_fps": round(full_fps, 1),
            "backend": jax.default_backend(),
            "frames": n,
            "size": f"{w}x{h}",
            "imgsz": imgsz,
        }
    )


if __name__ == "__main__":
    main()
