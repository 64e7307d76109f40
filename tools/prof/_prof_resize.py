"""Scratch: letterbox resize formulation shootout #2 (round 4).

The roofline audit (tools/prof/_prof_roofline.py) showed the fused
resize chain (letterbox.py mega-fusion, raw u8 frame -> (360,640,3)
bf16) at 2551 us/step S=64 — 3x its own bound (c=3 sublane/lane
padding in the dot emitter). Round-2/3 shootouts falsified strided
slices and block-sel einsums; the one formulation NEVER tried is
integer-scale decimation as a STRIDED CONVOLUTION (different emitter
class entirely):

  cv2.INTER_LINEAR at exact integer scale k = depthwise conv,
  kernel = outer(sel_y, sel_x) (single-tap for odd k), stride (k,k).

Candidates (all also fold /255 + BGR flip into the conv weights where
marked):
  dense    : current resize_bilinear_matmul (baseline)
  dw       : depthwise conv (feature_group_count=3), stride 3
  mix      : full conv (3->3 identity mix), stride 3
  mix8     : full conv 3->8 lanes (flip+scale folded, stem consumes 8)
  patch    : s2d-flavored: conv 3->27? no — kernel 3x3 s3 full-mix

Timing: direct dispatches with varying inputs (chained-scan harness
eliminates pure-linalg candidates — NOTES round-3 lesson).

Usage: python tools/prof/_prof_resize.py [S]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, W = 1080, 1920
OH, OW = 360, 640

rng = np.random.default_rng(0)
frames = [
    jnp.asarray(rng.integers(0, 255, (S, H, W, 3), np.uint8)) for _ in range(4)
]
jax.block_until_ready(frames)


def timeit(fn, label, n=12):
    outs = [fn(f) for f in frames]  # compile + warm
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(frames[i % 4])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1e3:8.3f} ms/step  ({dt*1e6/S:6.1f} us/frame)",
          flush=True)
    return out, dt


@jax.jit
def dense(f):
    x = f.astype(jnp.bfloat16)
    x = x[..., ::-1] * jnp.bfloat16(1 / 255)  # BGR flip + scale (as pipeline)
    return resize_bilinear_matmul(x, OH, OW)


# integer-scale decimation: out(y,x,c) = in(3y+1, 3x+1, c)
# (cv2 half-pixel: (i+0.5)*3-0.5 = 3i+1, exact). Conv with 1x1 kernel
# can't reach offset (1,1) under stride 3 without padding tricks, so
# use a 3x3 kernel whose only nonzero tap is (1,1) — 'SAME'-free:
# padding=0, stride 3 covers rows 0..1079 in windows [3y, 3y+2]; tap
# (1,1) selects 3y+1. Flip+scale fold into the kernel values.
def _dw_kernel(dtype):
    # depthwise: (3, 3, 1, 3) with feature_group_count=3 — identity per
    # channel, flip handled by output channel order
    k = np.zeros((3, 3, 1, 3), np.float32)
    for c in range(3):
        k[1, 1, 0, c] = 1 / 255
    return jnp.asarray(k, dtype)


def _mix_kernel(dtype, c_out=3):
    # full mix: (3, 3, 3, c_out); BGR->RGB flip folded
    k = np.zeros((3, 3, 3, c_out), np.float32)
    for c in range(3):
        k[1, 1, 2 - c, c] = 1 / 255
    return jnp.asarray(k, dtype)


@jax.jit
def dw(f):
    x = f.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, _dw_kernel(jnp.bfloat16), (3, 3), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
    )
    return y[..., ::-1]  # flip after (depthwise can't reorder)


@jax.jit
def mix(f):
    x = f.astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x, _mix_kernel(jnp.bfloat16), (3, 3), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.jit
def mix8(f):
    x = f.astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x, _mix_kernel(jnp.bfloat16, c_out=8), (3, 3), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


ref, t0_ = timeit(dense, "dense matmul (baseline)")
for fn, lab in [(dw, "depthwise conv s3"), (mix, "full-mix conv s3 (3ch)"),
                (mix8, "full-mix conv s3 (8ch)")]:
    out, dt = timeit(fn, lab)
    o = out[..., :3]
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"    max|err| vs dense: {err:.5f}  speedup {t0_/dt:.2f}x",
          flush=True)
