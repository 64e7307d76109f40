"""Scratch: device-time profile of any bench config's step program.

Aggregates TPU op time by HLO source line for one of:
  - the single-stream chunked track step (mode=chunk), or
  - the S-stream batched step (mode=batch),
for a given weights name / tracker.

Usage: python tools/prof/_prof_cfgtrace.py [weights] [mode] [S] [tracker]
  e.g. python tools/prof/_prof_cfgtrace.py yolov7 chunk
       python tools/prof/_prof_cfgtrace.py yolov8n batch 16 strongsort.yaml
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig  # noqa: E402

weights = sys.argv[1] if len(sys.argv) > 1 else "yolov7"
mode = sys.argv[2] if len(sys.argv) > 2 else "chunk"  # chunk|batch|flowbatch
S = int(sys.argv[3]) if len(sys.argv) > 3 else 16
if len(sys.argv) > 4:
    tracker = sys.argv[4]
elif mode == "flowbatch":
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="flow_tpu")
else:
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="none")

h, w = 1080, 1920
pipe = Pipeline(
    DetectorConfig(weights=weights, half=True, max_det=1000),
    tracker=tracker,
    track_slots=256,
)
pool = B.make_frames(h, w)
if pipe._is_v5 or pipe._is_v7:
    B.calibrate_anchor_based(pipe, pool[0], 0.3, B.TARGET_DETS)
else:
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
steps = pipe._get_step((h, w))
warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))

if mode == "chunk":
    chunk = 10
    frames = jnp.asarray(np.stack(pool + pool[:2]))
    warps = jnp.tile(warp[None], (chunk, 1, 1))
    step = steps.track_chunk
    state = pipe.track_state
    args = lambda st: (pipe.params, st, frames, warps)
    per_iter = chunk  # frames per dispatch
elif mode == "flowbatch":
    from strongsort_yolo_tpu.track import gmc_tpu

    bp = pipe.track_batch_prepare(S, (h, w))
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    pgs = gmc_tpu.frame_to_gray(frames)
    hps = jnp.ones((S,), bool)
    step = bp._steps.batch_step_flow
    state = bp.states
    args = lambda st: (pipe.params, st, frames, pgs, hps)
    per_iter = S
elif mode == "packbatch":
    # round-5 packed cross-stream embed at a given total-slot bucket
    # (argv[5], default 64 slots/stream): profile the packed program
    # the auto ladder dispatches in steady state
    G = int(sys.argv[5]) if len(sys.argv) > 5 else S * 64
    bp = pipe.track_batch_prepare(S, (h, w))
    steps_p = pipe._get_step((h, w), reid_pack_slots=G)
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    warps = jnp.tile(warp[None], (S, 1, 1))
    step = steps_p.batch_step
    state = bp.states
    args = lambda st: (pipe.params, st, frames, warps)
    per_iter = S
else:
    bp = pipe.track_batch_prepare(S, (h, w))
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    warps = jnp.tile(warp[None], (S, 1, 1))
    step = bp._steps.batch_step
    state = bp.states
    args = lambda st: (pipe.params, st, frames, warps)
    per_iter = S

txt = step.lower(*args(state)).compile().as_text()
meta = {}
pat = re.compile(
    r"%?([\w.\-]+) = (\S+?) .*?metadata=\{[^}]*?source_file=\"([^\"]+)\""
    r"[^}]*?source_line=(\d+)"
)
for line in txt.splitlines():
    m = pat.search(line)
    if m:
        name, shape, sf, sl = m.groups()
        meta[name] = (f"{os.path.basename(sf)}:{sl}", shape)

for _ in range(3):
    out = step(*args(state))
    state = out[0]
jax.block_until_ready(state)

outdir = "/tmp/jaxtrace_cfg"
os.system(f"rm -rf {outdir}")
N = 5
with jax.profiler.trace(outdir):
    for _ in range(N):
        out = step(*args(state))
        state = out[0]
    jax.block_until_ready(state)

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

print(
    f"{weights} {mode}: total device {total/N:.0f} us/dispatch, "
    f"{total/N/per_iter:.1f} us/frame",
    flush=True,
)
print("\n== by source line ==")
for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{us/N:9.1f} us/disp  {src}")
print("\n== top ops ==")
for (name, src, shape), us in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{us/N:9.1f} us/disp  {name[:40]:42s} {src:28s} {shape[:60]}")
