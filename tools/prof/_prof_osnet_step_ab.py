"""In-step A/B: fused OSNet stage kernels vs the XLA block graph.

Full StrongSORT batched track step (bench load, ~45 dets/stream),
SSYT_OSNET toggled per prepared pipeline at trace time, interleaved
timed blocks in ONE process (the only measurement the v5e tunnel
respects — standalone kernel timing is swamped by ~1.6 ms/dispatch
tunnel latency on dependent chains; NOTES round-5).

Usage: python tools/prof/_prof_osnet_step_ab.py [S ...] [--auto]
"""
import os
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
AUTO = "--auto" in sys.argv


def prepare(S, mode):
    os.environ["SSYT_OSNET"] = mode
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
    bp = pipe.track_batch_prepare(S, (h, w), auto_topk=AUTO)
    for _ in range(6):
        bp.step_async(frames, warps)
    bp.sync()
    jax.block_until_ready(bp.states)
    return bp, frames, warps


def block(bp, frames, warps, n=10):
    t0 = time.perf_counter()
    for _ in range(n):
        bp.step_async(frames, warps)
    bp.sync()
    jax.block_until_ready(bp.states)
    return time.perf_counter() - t0


def run(S):
    a = prepare(S, "xla")
    b = prepare(S, "fused")
    ta = tb = 0.0
    n = 10
    for _ in range(6):
        ta += block(*a, n=n)
        tb += block(*b, n=n)
    fa, fb = 60 * S / ta, 60 * S / tb
    tag = " auto" if AUTO else " fixed128"
    print(f"S={S}{tag}: xla {fa:.1f} fps/chip ({ta/60*1e3:.2f} ms) | "
          f"fused {fb:.1f} ({tb/60*1e3:.2f} ms) | {fb/fa:.3f}x",
          flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:] if not a.startswith("-")]
    for S in sizes or [16, 32, 64]:
        run(S)
