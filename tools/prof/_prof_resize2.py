"""Scratch: letterbox decimation-resize shootout, round 5.

Round-3's Pallas kernel lost to strided-row DMA (5.5 GB/s — see
ops/pallas/resize_kernel.py header); its postmortem prescribed
"full-row blocks + in-VMEM sublane selection". decimate_resize_contig
is that kernel. This driver times it against the dense matmul form
standalone (chained in-jit, VARIED inputs per iteration — the relay
elides repeated identical dispatches, NOTES.md round-4), at bench
geometry (B, 1080, 1920, 3) u8 -> (B, 360, 640, 3) bf16.

Usage: python tools/prof/_prof_resize2.py [B] [iters]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from strongsort_yolo_tpu.ops.letterbox import (  # noqa: E402
    resize_bilinear_matmul,
)
from strongsort_yolo_tpu.ops.pallas.resize_kernel import (  # noqa: E402
    decimate_resize_contig,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.integers(0, 256, (B, 1080, 1920, 3), np.uint8))
      for _ in range(3)]


def chain(fn, r):
    @functools.partial(jax.jit, static_argnames=())
    def run(x):
        def body(c, _):
            # vary the input per iteration: flip one byte via add — the
            # relay elides repeated identical dispatches
            c = (c + jnp.uint8(1))
            y = fn(c)
            # consume the output so nothing DCEs
            s = jnp.sum(y.astype(jnp.float32))
            return c, s

        _, ss = jax.lax.scan(body, x, None, length=r)
        return ss

    return run


def time_fn(name, fn):
    # The relay elides REPEATED IDENTICAL top-level dispatches (NOTES
    # round-4), so every timed call gets a DIFFERENT top-level input,
    # and the per-iter cost is the (R4 - R1) difference of two chain
    # lengths (cancels the per-dispatch floor).
    run1, run4 = chain(fn, R), chain(fn, 4 * R)
    jax.block_until_ready(run1(xs[0]))  # compile
    jax.block_until_ready(run4(xs[0]))
    t0 = time.perf_counter()
    jax.block_until_ready(run1(xs[1]))
    t1 = time.perf_counter()
    jax.block_until_ready(run4(xs[2]))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (3 * R)
    print(f"{name}: {dt*1e3:.3f} ms/iter (B={B}) "
          f"[R1 {1e3*(t1-t0):.1f} ms, R4 {1e3*(t2-t1):.1f} ms]",
          flush=True)
    return dt


if __name__ == "__main__":
    time_fn("dense matmul (current)",
            lambda x: resize_bilinear_matmul(
                x.astype(jnp.bfloat16), 360, 640))
    time_fn("pallas contig kernel",
            lambda x: decimate_resize_contig(x, 360, 640))
