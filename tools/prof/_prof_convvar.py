"""Scratch: conv-emitter variance probe on the full S-stream step
(roofline-audit follow-up — VERDICT r4 #5's "pick the 1318-us
multiply_add_fusion, force the fast emitter's layout, measure").

The r4/r5 roofline audits show same-shape C2f convs running at
23-86 TF/s in-step — the spread is XLA's per-fusion layout/emitter
choice, not the shapes. Public JAX exposes no per-instruction layout
forcing, so the probe flips formulation knobs that change what the
emitter sees (strongsort_yolo_tpu/models/common.py SSYT_CONVVAR):

  mm1x1   — every eligible 1x1 conv emitted as an explicit
            (N*H*W,Cin)x(Cin,Cout) dot: matmul layout assignment
            instead of the conv emitter's pick. (The C2f cv1/cv2
            1x1s carry ~40% of the step's conv FLOPs.)
  barrier — optimization_barrier between each conv and its BN/SiLU
            epilogue: splits the multiply_add fusions, isolating
            whether epilogue fusion forces the slow conv layouts.

In-step A/B, interleaved timed blocks in ONE process (the only honest
harness through the v5e tunnel — NOTES.md measurement rules). Each
variant gets its own Pipeline (fresh jit closures), traced while the
module global is set to it.

Usage: python tools/prof/_prof_convvar.py [S] [blocks]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig  # noqa: E402
from strongsort_yolo_tpu.models import common  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 20  # dispatches per timed block

h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))

VARIANTS = ["", "mm1x1", "barrier"]


def build(variant):
    common._CONVVAR = variant
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", half=True, max_det=1000),
        tracker=ByteTrackConfig(tracker_type="botsort", gmc_method="none"),
        track_slots=256,
    )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w))
    step = bp._steps.batch_step
    states = bp.states
    t0 = time.perf_counter()
    for _ in range(3):  # trace+compile happens here, flag still set
        states, d, o, e = step(pipe.params, states, frames, warps)
    jax.block_until_ready(states)
    common._CONVVAR = ""
    print(f"[{variant or 'baseline'}] warm in {time.perf_counter()-t0:.1f}s"
          f" dets={int(np.asarray(e['n_dets']).sum()) if isinstance(e, dict) and 'n_dets' in e else '?'}",
          flush=True)
    return pipe, step, states


runs = {v: build(v) for v in VARIANTS}
times = {v: [] for v in VARIANTS}
for blk in range(BLOCKS):
    for v in VARIANTS:
        pipe, step, states = runs[v]
        t0 = time.perf_counter()
        for _ in range(N):
            states, d, o, e = step(pipe.params, states, frames, warps)
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        runs[v] = (pipe, step, states)
        times[v].append(dt / N)
        print(f"blk{blk} {v or 'baseline':8s}: {dt/N*1e3:.2f} ms/tick "
              f"({N*S/dt:.1f} fps/chip)", flush=True)

print("\n=== summary (mean of blocks, interleaved) ===")
base = sum(times[""]) / len(times[""])
for v in VARIANTS:
    m = sum(times[v]) / len(times[v])
    print(f"{v or 'baseline':8s}: {m*1e3:.2f} ms/tick  {S/m:.1f} fps/chip  "
          f"({base/m:.3f}x vs baseline)", flush=True)
