"""Isolate the full-chunk overhead: scan-body variants."""
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
gain = jnp.float32(lp.gain)
pad = jnp.asarray([lp.pad_x, lp.pad_y], jnp.float32)
orig_hw = jnp.asarray((h, w), jnp.float32)

def detect_one(params, frame, max_det=1000):
    img = letterbox(frame, lp, dtype=jnp.bfloat16)
    out = model_apply(params, img[None], pipe.model_cfg, compute_dtype=jnp.bfloat16)
    det = nms_from_logits(out["box_logits"][0], out["cls_logits"][0], anchors, strides,
        reg_max=16, conf_thres=0.3, iou_thres=0.4, max_det=max_det)
    boxes_orig = scale_boxes(det.boxes, gain, pad, orig_hw)
    det = det._replace(boxes=jnp.where(det.valid[:, None], boxes_orig, 0.0))
    return det

def timeit(name, fn, st0, n=20):
    st = fn(st0)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n):
        st = fn(st)
    jax.block_until_ready(st)
    print(f"{name:52s} {(time.perf_counter()-t0)/n/10*1e3:7.3f} ms/frame", flush=True)

# (a) detect-only, chained dummy carry, stack dets
@jax.jit
def chunk_detect(params, carry, frames):
    def step(c, f):
        det = detect_one(params, f)
        return c + det.count, det
    c, dets = jax.lax.scan(step, carry, frames)
    return c
timeit("a) detect-only chunk (stack full det)", lambda c: chunk_detect(pipe.params, c, frames10), jnp.int32(0))

# (b) detect + tracker, stack ONLY track outputs
@jax.jit
def chunk_dt(params, st, frames):
    def step(st, f):
        det = detect_one(params, f)
        st, out = bytetrack_step(st, det.boxes[:128], det.scores[:128],
                                 det.classes[:128], det.valid[:128], tcfg)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, frames)
    return st
timeit("b) detect+tracker chunk (no det stacking)", lambda s: chunk_dt(pipe.params, s, frames10), init_track_state(256))

# (c) detect + tracker, stack det AND out (current track_chunk shape)
@jax.jit
def chunk_full(params, st, frames):
    def step(st, f):
        det = detect_one(params, f)
        st, out = bytetrack_step(st, det.boxes[:128], det.scores[:128],
                                 det.classes[:128], det.valid[:128], tcfg)
        return st, (det, out)
    st, outs = jax.lax.scan(step, st, frames)
    return st
timeit("c) detect+tracker chunk (stack det+out)", lambda s: chunk_full(pipe.params, s, frames10), init_track_state(256))

# (d) like b but max_det=128 end to end
@jax.jit
def chunk_dt128(params, st, frames):
    def step(st, f):
        det = detect_one(params, f, max_det=128)
        st, out = bytetrack_step(st, det.boxes, det.scores, det.classes, det.valid, tcfg)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, frames)
    return st
timeit("d) detect(max_det=128)+tracker chunk", lambda s: chunk_dt128(pipe.params, s, frames10), init_track_state(256))

# (e) tracker slots 128 instead of 256
tcfg2 = tcfg
@jax.jit
def chunk_dt_s128(params, st, frames):
    def step(st, f):
        det = detect_one(params, f)
        st, out = bytetrack_step(st, det.boxes[:128], det.scores[:128],
                                 det.classes[:128], det.valid[:128], tcfg2)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, frames)
    return st
timeit("e) detect+tracker(128 slots) chunk", lambda s: chunk_dt_s128(pipe.params, s, frames10), init_track_state(128))

# (f) the production track_chunk after the warp fix
steps = pipe._get_step((h, w))
warps10 = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (10, 1, 1))
def prod(st):
    st, o, e = steps.track_chunk(pipe.params, st, frames10, warps10)
    return st
timeit("f) production track_chunk (warp-skip)", prod, pipe.track_state)
