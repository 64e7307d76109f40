"""Scratch: A/B of the PACKED cross-stream ReID embed (auto_topk's
round-5 total-slot form) vs fixed full-width, on the S-stream batched
StrongSORT step at the bench load (~45 dets/stream, 1080p).

The round-4 defining gap: fixed-width StrongSORT scaled BACKWARDS
(954 -> 883 -> 871 fps/chip at S=16/32/64) because the embed batch was
S*topk slots regardless of load. Packed mode gathers the real dets of
all streams into one dense G-slot crop batch (G a total-count bucket
with exact replay-on-overflow), so the OSNet pass sees ~S*48 slots at
the bench load instead of S*128.

Usage: python tools/prof/_prof_pack_ab.py [S ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402

h, w = 1080, 1920
pool = B.make_frames(h, w)


def run(S, auto):
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    warps = jnp.tile(
        jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1)
    )
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", half=True, max_det=1000),
        tracker="strongsort.yaml",
        track_slots=256,
        reid_topk=128,
    )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w), auto_topk=auto)
    for _ in range(6):  # warmup incl. the overflow replay + rung jump
        bp.step_async(frames, warps)
    bp.sync()
    jax.block_until_ready(bp.states)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        bp.step_async(frames, warps)
    bp.sync()
    jax.block_until_ready(bp.states)
    dt = time.perf_counter() - t0
    fps = n * S / dt
    mode = "auto(packed)" if auto else "fixed128"
    extra = ""
    if auto:
        extra = (f" bucket={bp._bucket} ladder_cap={bp._ladder[-1]}"
                 f" n_replays={bp.n_replays}")
    print(
        f"S={S} {mode}: {fps:.1f} fps/chip ({dt/n*1e3:.2f} ms/tick){extra}",
        flush=True,
    )
    return fps


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    for S in sizes:
        f0 = run(S, False)
        f1 = run(S, True)
        print(f"S={S}: packed speedup {f1 / f0:.3f}x", flush=True)
