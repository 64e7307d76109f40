"""Scratch: trace batch_step_flow (S=16) and aggregate device op time
by source line to find why the in-step LK GMC runs at ~9 fps."""
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
from strongsort_yolo_tpu.track import gmc_tpu

S = 16
h, w = 1080, 1920
pipe = Pipeline(
    DetectorConfig(weights="yolov8n", half=True, max_det=1000),
    tracker=ByteTrackConfig(tracker_type="botsort", gmc_method="flow_tpu"),
    track_slots=256,
)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
bp = pipe.track_batch_prepare(S, (h, w))
frames_s = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
pgs = gmc_tpu.frame_to_gray(frames_s)
hps = jnp.ones((S,), bool)
step = bp._steps.batch_step_flow

txt = step.lower(
    pipe.params, bp.states, frames_s, pgs, hps
).compile().as_text()
meta = {}
pat = re.compile(
    r"%?([\w.\-]+) = (\S+?) .*?metadata=\{[^}]*?source_file=\"([^\"]+)\"[^}]*?source_line=(\d+)"
)
for line in txt.splitlines():
    m = pat.search(line)
    if m:
        name, shape, sf, sl = m.groups()
        meta[name] = (f"{os.path.basename(sf)}:{sl}", shape)

states = bp.states
for _ in range(3):
    states, d, o, e, pgs = step(pipe.params, states, frames_s, pgs, hps)
jax.block_until_ready(states)

outdir = "/tmp/jaxtrace_flow"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    for _ in range(3):
        states, d, o, e, pgs = step(pipe.params, states, frames_s, pgs, hps)
    jax.block_until_ready(states)

files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    tr = json.load(f)
procnames = {}
for e2 in tr.get("traceEvents", []):
    if e2.get("ph") == "M" and e2.get("name") == "process_name":
        procnames[e2.get("pid")] = e2["args"].get("name", "")
by_src = defaultdict(float)
by_op = defaultdict(float)
total = 0.0
for e2 in tr.get("traceEvents", []):
    if e2.get("ph") != "X":
        continue
    if "TPU" not in procnames.get(e2.get("pid"), ""):
        continue
    name = e2["name"]
    if name.startswith("jit_"):
        continue
    dur = e2.get("dur", 0)
    total += dur
    src, shape = meta.get(name, ("?", "?"))
    by_src[src] += dur
    by_op[(name, src, shape)] += dur

print(f"total device us/iter: {total/3:.0f}", flush=True)
print("\n== by source line ==")
for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{us/3:9.1f} us/iter  {src}")
print("\n== top ops ==")
for (name, src, shape), us in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{us/3:9.1f} us/iter  {name[:40]:42s} {src:28s} {shape[:60]}")
