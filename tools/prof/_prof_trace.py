"""Scratch: jax.profiler trace of the batched model forward; parse the
perfetto trace to rank device ops by total time."""
import glob
import gzip
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, init_model, fuse_model, model_apply,
)

S = 32
size = 640
cfg = YoloConfig(family="v8", scale="n", task="detect")
params = fuse_model(init_model(jax.random.PRNGKey(0), cfg))
imgs = jnp.asarray(
    np.random.default_rng(0).uniform(0, 1, (S, size, size, 3)), jnp.bfloat16
)


@jax.jit
def fwd(carry):
    out = model_apply(params, imgs + carry.astype(jnp.bfloat16), cfg,
                      compute_dtype=jnp.bfloat16)
    return jnp.float32(out["cls_logits"].sum() + out["box_logits"].sum())


c = fwd(jnp.float32(0))
jax.block_until_ready(c)
t0 = time.perf_counter()
for _ in range(20):
    c = fwd(c * 0)
jax.block_until_ready(c)
print(f"fwd: {(time.perf_counter()-t0)/20*1e3:.3f} ms/iter", flush=True)

outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    for _ in range(5):
        c = fwd(c * 0)
    jax.block_until_ready(c)

files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
if files:
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    # find device-side events: pid/tid names containing TPU / device
    names = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
            names[(e.get("pid"), None)] = e["args"].get("name", "")
    from collections import Counter, defaultdict
    agg = defaultdict(float)
    cnt = Counter()
    procnames = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procnames[e.get("pid")] = e["args"].get("name", "")
    for e in ev:
        pn = procnames.get(e.get("pid"), "")
        if "TPU" in pn or "tpu" in pn or "Device" in pn or "/device" in pn:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    print("process names:", set(procnames.values()), flush=True)
    total = sum(agg.values())
    print(f"total device us: {total:.0f}")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/5:10.1f} us/iter  x{cnt[name]//5:3d}  {name[:90]}")
