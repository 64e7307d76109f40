"""Scratch: trace the FULL batched track step (S=32) and aggregate
device op time by HLO instruction -> source location."""
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(
    DetectorConfig(weights="yolov8n", half=True, max_det=1000),
    tracker=tcfg, track_slots=256,
)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
bp = pipe.track_batch_prepare(S, (h, w))
frames_s = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps_s = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))

step = bp._steps.batch_step

# HLO name -> (source, shape)
txt = step.lower(pipe.params, bp.states, frames_s, warps_s).compile().as_text()
open("/tmp/batch_hlo.txt", "w").write(txt)
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
    states, d, o, e = step(pipe.params, states, frames_s, warps_s)
jax.block_until_ready(states)

outdir = "/tmp/jaxtrace2"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    for _ in range(5):
        states, d, o, e = step(pipe.params, states, frames_s, warps_s)
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

print(f"total device us/iter: {total/5:.0f}", flush=True)
print("\n== by source line ==")
for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{us/5:9.1f} us/iter  {src}")
print("\n== top ops ==")
for (name, src, shape), us in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{us/5:9.1f} us/iter  {name[:40]:42s} {src:28s} {shape[:60]}")
