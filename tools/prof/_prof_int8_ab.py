"""Scratch: in-pipeline A/B of int8 PTQ (ops/quant.quantize_model,
backbone+neck) vs bf16, on the single-stream chunk and the S-stream
batched ByteTrack step (the headline config).

Usage: python tools/prof/_prof_int8_ab.py [S]
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
from strongsort_yolo_tpu.ops.quant import quantize_model  # noqa: E402
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warp = np.eye(2, 3, dtype=np.float32)
warps = jnp.tile(jnp.asarray(warp)[None], (S, 1, 1))
det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=1000)
tracker = ByteTrackConfig(tracker_type="bytetrack", gmc_method="none")

base = Pipeline(det_cfg, tracker=tracker, track_slots=256)
B.calibrate_candidates(base, pool[0], 0.3, B.TARGET_DETS)


def run(quant):
    pipe = Pipeline(det_cfg, tracker=tracker, track_slots=256)
    if quant:
        pipe.params = quantize_model(base.params)[0]
        t0 = time.perf_counter()
        n = pipe.calibrate_int8([pool[0]])
        print(f"calibrated {n} convs in {time.perf_counter()-t0:.0f}s",
              flush=True)
    else:
        pipe.params = base.params
    bp = pipe.track_batch_prepare(S, (h, w))
    for _ in range(3):
        bp.states, dets, _o, _e = bp._steps.batch_step(
            pipe.params, bp.states, frames, warps
        )
    jax.block_until_ready(bp.states)
    nd = int(np.asarray(dets.count)[0])
    n = 25
    t0 = time.perf_counter()
    for _ in range(n):
        bp.states, _d, _o, _e = bp._steps.batch_step(
            pipe.params, bp.states, frames, warps
        )
    jax.block_until_ready(bp.states)
    dt = time.perf_counter() - t0
    print(
        f"int8={quant}: {n*S/dt:.1f} fps/chip ({dt/n*1e3:.2f} ms/dispatch, "
        f"S={S}, {nd} dets)",
        flush=True,
    )
    return n * S / dt


q = run(True)
f = run(False)
print(f"int8 delta: {100*(q/f-1):+.1f}%", flush=True)
