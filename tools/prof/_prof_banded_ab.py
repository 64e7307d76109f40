"""Scratch: in-pipeline A/B of the banded-pyramid crop sampler
(reid_banded: Pallas kernel on TPU) vs the legacy dense ds2 einsum, on
the S-stream batched StrongSORT step. The dense crop einsums were 5.9
of 19.8 ms at S=16 (NOTES round-3 profile).

Usage: python tools/prof/_prof_banded_ab.py [S] [topk]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
topk_arg = sys.argv[2] if len(sys.argv) > 2 else "128"
auto = topk_arg == "auto"
topk = 128 if auto else int(topk_arg)
h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))


def run(banded):
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", half=True, max_det=1000),
        tracker="strongsort.yaml",
        track_slots=256,
        reid_topk=topk,
        reid_banded=banded,
    )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w), auto_topk=auto)
    # auto: warm PAST the 30-tick hysteresis window so the timed loop
    # measures the converged bucket (each tick syncs on the count)
    for _ in range(35 if auto else 3):
        bp.step_async(frames, warps)
    jax.block_until_ready(bp.states)
    if auto:
        print(f"auto bucket converged: {bp._bucket}", flush=True)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        bp.step_async(frames, warps)
    jax.block_until_ready(bp.states)
    dt = time.perf_counter() - t0
    fps = n * S / dt
    print(
        f"banded={banded} topk={topk_arg}: {fps:.1f} fps/chip "
        f"({dt/n*1e3:.2f} ms/dispatch, S={S})",
        flush=True,
    )
    return fps


b = run(True)
a = run(False)
print(f"banded delta: {100*(b/a-1):+.1f}%", flush=True)
