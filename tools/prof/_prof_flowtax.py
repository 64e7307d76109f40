"""Scratch: GMC (flow_tpu) tax at batch — batch_step_flow vs batch_step
fps on staged frames (VERDICT r3 ask #5: target <=10%).

Usage: python tools/prof/_prof_flowtax.py [S]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track import gmc_tpu
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))
det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=1000)

base = Pipeline(det_cfg, tracker=ByteTrackConfig(tracker_type="bytetrack",
                gmc_method="none"), track_slots=256)
B.calibrate_candidates(base, pool[0], 0.3, B.TARGET_DETS)

flow = Pipeline(det_cfg, tracker=ByteTrackConfig(tracker_type="botsort",
                gmc_method="flow_tpu"), track_slots=256)
flow.params = base.params


def timeit(fn, n=30):
    for _ in range(3):
        fn()
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return S * (n + 1) / (time.perf_counter() - t0)


bp = base.track_batch_prepare(S, (h, w))
def f_plain():
    bp.states, _d, o, _e = bp._steps.batch_step(base.params, bp.states, frames, warps)
    return o
fps_plain = timeit(f_plain)
print(f"S={S} no-GMC: {fps_plain:.1f} fps/chip", flush=True)

bf = flow.track_batch_prepare(S, (h, w))
pgs = gmc_tpu.frame_to_gray(frames)
hps = jnp.ones((S,), bool)
st = {"s": bf.states, "g": pgs}
def f_flow():
    st["s"], _d, o, _e, st["g"] = bf._steps.batch_step_flow(
        flow.params, st["s"], frames, st["g"], hps)
    return o
fps_flow = timeit(f_flow)
print(f"S={S} flow_tpu: {fps_flow:.1f} fps/chip (tax {100*(1-fps_flow/fps_plain):.1f}%)", flush=True)
