"""Scratch: banded-crop Pallas kernel on hardware.

Timing protocol (NOTES.md): the relay/XLA elides repeated identical
dispatches (a 2048-crop call 'measured' 0.03 ms), so the kernel is
chained R times inside ONE jit with per-iteration box perturbation +
an optimization_barrier carry — Pallas calls are opaque to XLA, so the
chain times honestly (same harness as _prof_nms.py). The pyramid+prep
(XLA linalg) are timed only as part of the full StrongSORT step
(_prof_reid_packed / _prof_strongsort) — chained-linalg numbers lie.

Usage: python tools/prof/_prof_bandedcrop.py [S] [M] [R]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
M = int(sys.argv[2]) if len(sys.argv) > 2 else 128
R = int(sys.argv[3]) if len(sys.argv) > 3 else 50

from strongsort_yolo_tpu.ops.crops import (
    banded_prep, build_pyramid, pyramid_dims, _pad_dims)
from strongsort_yolo_tpu.ops.pallas.crop_kernel import banded_crop_planar, banded_crop

h, w = 1080, 1920
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 1, (S, h, w, 3)), jnp.bfloat16)
boxes = np.zeros((S, M, 4), np.float32)
for s in range(S):
    for m in range(M):
        x1 = rng.uniform(0, w - 300); y1 = rng.uniform(0, h - 400)
        boxes[s, m] = (x1, y1, x1 + rng.uniform(40, 200), y1 + rng.uniform(80, 380))
boxes = jnp.asarray(boxes)

dims = pyramid_dims(h, w)
pads = _pad_dims(dims)

def staged(imgs):
    levels = build_pyramid(imgs)
    return [
        jnp.pad(jnp.transpose(lv, (0, 3, 1, 2)),
                ((0, 0), (0, 0), (0, hp - ph), (0, wp - pw)))
        for lv, (ph, pw), (hp, wp) in zip(levels, dims, pads)
    ]

planar = jax.jit(staged)(imgs)
jax.block_until_ready(planar)

@jax.jit
def chain(planar, boxes):
    def body(carry, i):
        bx = boxes + carry  # per-iter perturbation, data-dependent
        scal, ints = jax.vmap(lambda b: banded_prep(b, (h, w), dims, (128, 64)))(bx)
        out = banded_crop_planar(
            planar, scal.reshape(S * M, 6), ints.reshape(S * M, 3), (128, 64))
        out = jax.lax.optimization_barrier(out)
        return out[0, 0, 0, 0].astype(jnp.float32) * 1e-9, None
    c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
    return c

out = jax.block_until_ready(chain(planar, boxes))
ts = []
for k in range(1, 4):
    bk = boxes + np.float32(k)  # distinct top-level input: no relay cache
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(planar, bk))
    ts.append((time.perf_counter() - t0) / R)
print(f"banded kernel (+prep) chained: {min(ts)*1e3:.3f} ms/iter "
      f"({S}x{M} crops, R={R}, runs {[f'{t*1e3:.3f}' for t in ts]})",
      flush=True)

# pyramid staging cost (one dispatch, coarse — tunnel floor ~1ms):
staged_j = jax.jit(staged)
jax.block_until_ready(staged_j(imgs))
t0 = time.perf_counter()
for i in range(1, 11):
    planar2 = staged_j(imgs + jnp.bfloat16(i * 1e-3))
jax.block_until_ready(planar2)
print(f"pyramid staging (direct, incl ~1ms dispatch floor): "
      f"{(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)

# hardware correctness spot check vs interpret-mode oracle run on CPU
got = jax.block_until_ready(jax.jit(banded_crop)(imgs[:2], boxes[:2, :8]))
print("hw sample ok:", np.asarray(got).shape, float(np.abs(np.asarray(got)).mean()), flush=True)
