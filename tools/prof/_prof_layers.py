"""Scratch: per-stage timing of the yolov8n forward at batch S on TPU.

Times cumulative prefixes of the forward (stem, +down1, +stage1, ...)
and reports the per-stage delta. Chained on a scalar carry.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, init_model, fuse_model, neck_apply, detect_head_apply,
)
from strongsort_yolo_tpu.models import common as C

S = 32
size = 640
cfg = YoloConfig(family="v8", scale="n", task="detect")
params = fuse_model(init_model(jax.random.PRNGKey(0), cfg))
dt = jnp.bfloat16

imgs = jnp.asarray(
    np.random.default_rng(0).uniform(0, 1, (S, size, size, 3)), dt
)

bb = params["backbone"]

STAGES = [
    ("stem 3->16 /2 (640->320)", lambda x: C.conv_apply(bb["stem"], x, stride=2)),
    ("down1 16->32 /2 (320->160)", lambda x: C.conv_apply(bb["down1"], x, stride=2)),
    ("stage1 c2f32 n1 (160)", lambda x: C.c2f_apply(bb["stage1"], x, shortcut=True)),
    ("down2 32->64 /2 (160->80)", lambda x: C.conv_apply(bb["down2"], x, stride=2)),
    ("stage2 c2f64 n2 (80)", lambda x: C.c2f_apply(bb["stage2"], x, shortcut=True)),
    ("down3 64->128 /2 (80->40)", lambda x: C.conv_apply(bb["down3"], x, stride=2)),
    ("stage3 c2f128 n2 (40)", lambda x: C.c2f_apply(bb["stage3"], x, shortcut=True)),
    ("down4 128->256 /2 (40->20)", lambda x: C.conv_apply(bb["down4"], x, stride=2)),
    ("stage4 c2f256 n1 (20)", lambda x: C.c2f_apply(bb["stage4"], x, shortcut=True)),
    ("sppf (20)", lambda x: C.sppf_apply(bb["sppf"], x)),
]


def run_prefix(n_stages):
    @jax.jit
    def f(carry):
        x = imgs + carry.astype(dt)
        outs = []
        for name, fn in STAGES[:n_stages]:
            x = fn(x)
            outs.append(x)
        return jnp.float32(x.sum())
    return f


def timeit(f, n=30):
    c = f(jnp.float32(0))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = f(c * 0)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / n * 1e3


prev = 0.0
for i in range(1, len(STAGES) + 1):
    ms = timeit(run_prefix(i))
    print(f"{STAGES[i-1][0]:34s} +{ms-prev:7.3f} ms  (cum {ms:7.3f})", flush=True)
    prev = ms


# full model including neck + head for reference
@jax.jit
def full(carry):
    x = imgs + carry.astype(dt)
    x = C.conv_apply(bb["stem"], x, stride=2)
    x = C.conv_apply(bb["down1"], x, stride=2)
    x = C.c2f_apply(bb["stage1"], x, shortcut=True)
    x = C.conv_apply(bb["down2"], x, stride=2)
    p3 = C.c2f_apply(bb["stage2"], x, shortcut=True)
    x = C.conv_apply(bb["down3"], p3, stride=2)
    p4 = C.c2f_apply(bb["stage3"], x, shortcut=True)
    x = C.conv_apply(bb["down4"], p4, stride=2)
    x = C.c2f_apply(bb["stage4"], x, shortcut=True)
    p5 = C.sppf_apply(bb["sppf"], x)
    n3, n4, n5 = neck_apply(cfg, params["neck"], (p3, p4, p5))
    b, c = detect_head_apply(params["detect"], (n3, n4, n5))
    return jnp.float32(b.sum() + c.sum())

ms = timeit(full)
print(f"{'FULL backbone+neck+head':34s}  {ms:7.3f} ms", flush=True)
print(f"neck+head = {ms - prev:.3f} ms", flush=True)
