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
x0 = jnp.asarray(rng.integers(0, 256, (B, 1080, 1920, 3), np.uint8))


def chain(fn):
    @jax.jit
    def run(x):
        def body(c, _):
            # vary the input per iteration: flip one byte via add — the
            # relay elides repeated identical dispatches
            c = (c + jnp.uint8(1))
            y = fn(c)
            # consume the output so nothing DCEs
            s = jnp.sum(y.astype(jnp.float32))
            return c, s

        _, ss = jax.lax.scan(body, x, None, length=R)
        return ss

    return run


def time_fn(name, fn):
    run = chain(fn)
    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R
    print(f"{name}: {dt*1e3:.3f} ms/iter (B={B})", flush=True)
    return dt


if __name__ == "__main__":
    time_fn("dense matmul (current)",
            lambda x: resize_bilinear_matmul(
                x.astype(jnp.bfloat16), 360, 640))
    time_fn("pallas contig kernel",
            lambda x: decimate_resize_contig(x, 360, 640))
