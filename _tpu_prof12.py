"""Auction orientation/unroll + detect-tracker interaction tests."""
import time, numpy as np, jax, jax.numpy as jnp

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state
from strongsort_yolo_tpu.models.yolo import model_apply, feat_hw
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.nms import nms_from_logits
from strongsort_yolo_tpu.ops.boxes import scale_boxes
from strongsort_yolo_tpu.ops.decode import make_anchors
import bench as B

h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(DetectorConfig(weights="yolov8n", half=True, max_det=1000), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
frames10 = jnp.asarray(np.stack(pool + pool[:2]))
lp = letterbox_params(h, w, 640)
anchors, strides = make_anchors(feat_hw((640, 640), pipe.model_cfg.strides), pipe.model_cfg.strides)
gain = jnp.float32(lp.gain); pad = jnp.asarray([lp.pad_x, lp.pad_y], jnp.float32)
orig_hw = jnp.asarray((h, w), jnp.float32)

def detect_one(params, frame):
    img = letterbox(frame, lp, dtype=jnp.bfloat16)
    out = model_apply(params, img[None], pipe.model_cfg, compute_dtype=jnp.bfloat16)
    det = nms_from_logits(out["box_logits"][0], out["cls_logits"][0], anchors, strides,
        reg_max=16, conf_thres=0.3, iou_thres=0.4, max_det=1000)
    boxes_orig = scale_boxes(det.boxes, gain, pad, orig_hw)
    return det._replace(boxes=jnp.where(det.valid[:, None], boxes_orig, 0.0))

def timeit(name, fn, st0, n=20):
    st = fn(st0); jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n): st = fn(st)
    jax.block_until_ready(st)
    print(f"{name:52s} {(time.perf_counter()-t0)/n/10*1e3:7.3f} ms/frame", flush=True)

# precompute real det streams once
@jax.jit
def detect_scan(params, frames):
    def step(c, f):
        det = detect_one(params, f)
        return c, (det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128])
    _, outs = jax.lax.scan(step, None, frames)
    return outs
REAL = detect_scan(pipe.params, frames10)
REAL = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), REAL)

# 1) tracker-only scan on real dets (current code)
@jax.jit
def tracker_scan(st, b, s, c, v):
    def step(st, inp):
        st, out = bytetrack_step(st, *inp, tcfg)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, (b, s, c, v))
    return st
timeit("tracker-only scan, real dets", lambda st: tracker_scan(st, *REAL), init_track_state(256))

# 2) detect+tracker, tracker fed CONSTANT dets (dependency broken)
CB, CS, CC, CV = (REAL[0][0], REAL[1][0], REAL[2][0], REAL[3][0])
@jax.jit
def chunk_const(params, st, frames):
    def step(st, f):
        det = detect_one(params, f)
        st, out = bytetrack_step(st, CB, CS, CC, CV, tcfg)
        return st, out.active.sum() + det.count
    st, _ = jax.lax.scan(step, st, frames)
    return st
timeit("detect + tracker(CONST dets)", lambda st: chunk_const(pipe.params, st, frames10), init_track_state(256))

# 3) detect + tracker real (reference point, = prof10 b)
@jax.jit
def chunk_real(params, st, frames):
    def step(st, f):
        det = detect_one(params, f)
        st, out = bytetrack_step(st, det.boxes[:128], det.scores[:128],
                                 det.classes[:128], det.valid[:128], tcfg)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, frames)
    return st
timeit("detect + tracker(real dets)", lambda st: chunk_real(pipe.params, st, frames10), init_track_state(256))
