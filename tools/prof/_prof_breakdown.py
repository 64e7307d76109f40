"""Scratch: component breakdown of the batched track step on TPU.

Times, at batch S: letterbox only, model fwd only, +NMS, full track
body, and a scan-of-vmap chunk. All chained on state/output to defeat
dispatch pipelining.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
from strongsort_yolo_tpu.models.yolo import model_apply, feat_hw
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.decode import make_anchors
from strongsort_yolo_tpu.ops.nms import nms_from_logits

S = 32
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(
    DetectorConfig(weights="yolov8n", half=True, max_det=1000),
    tracker=tcfg, track_slots=256,
)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
cfg = pipe.model_cfg
size = 640
lp = letterbox_params(h, w, size)
anchors, strides = make_anchors(feat_hw((size, size), cfg.strides), cfg.strides)

frames_s = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
warps_s = jnp.tile(warp[None], (S, 1, 1))


def timeit(name, fn, arg, n=20):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    x = arg
    for _ in range(n):
        x = fn(x)  # chain where possible
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n
    print(f"{name:40s} {ms*1e3:8.3f} ms/tick  {ms*1e3/S:7.4f} ms/frame", flush=True)
    return ms


# 1. letterbox only (chain via dummy add to output shape mismatch -> no chain;
#    instead chain by feeding frames again, output consumed via sum into a carry)
@jax.jit
def lb_only(carry):
    imgs = jax.vmap(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))(frames_s)
    return carry + imgs.sum().astype(jnp.float32)

timeit("letterbox S", lb_only, jnp.float32(0))


@jax.jit
def model_only(carry):
    imgs = jax.vmap(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))(frames_s)
    out = model_apply(pipe.params, imgs, cfg, compute_dtype=jnp.bfloat16)
    return carry + out["cls_logits"].sum().astype(jnp.float32) + out["box_logits"].sum().astype(jnp.float32)

timeit("letterbox+model S", model_only, jnp.float32(0))


@jax.jit
def thru_nms(carry):
    imgs = jax.vmap(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))(frames_s)
    out = model_apply(pipe.params, imgs, cfg, compute_dtype=jnp.bfloat16)
    det = jax.vmap(
        lambda bl, cl: nms_from_logits(
            bl, cl, anchors, strides, reg_max=cfg.reg_max,
            conf_thres=0.3, iou_thres=0.4, max_det=1000,
        )
    )(out["box_logits"], out["cls_logits"])
    return carry + det.boxes.sum() + det.count.sum().astype(jnp.float32)

timeit("letterbox+model+NMS S", thru_nms, jnp.float32(0))

# full batch step (chained on states)
bp = pipe.track_batch_prepare(S, (h, w))

def full(states):
    states, det, out, _ = bp._steps.batch_step(pipe.params, states, frames_s, warps_s)
    return states

st = full(bp.states)
jax.block_until_ready(st)
t0 = time.perf_counter()
n = 20
for _ in range(n):
    st = full(st)
jax.block_until_ready(st)
ms = (time.perf_counter() - t0) / n
print(f"{'full batch_step S':40s} {ms*1e3:8.3f} ms/tick  {ms*1e3/S:7.4f} ms/frame", flush=True)

print("done", flush=True)
