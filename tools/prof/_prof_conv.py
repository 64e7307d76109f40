"""Scratch: per-shape A/B of the Pallas fused conv vs the XLA conv.

Runs on the real TPU. Shapes = the narrow-channel stages the S=32 step
profile indicts (see ops/pallas/conv_kernel.py docstring). For each
shape: XLA conv+bias+SiLU time, Pallas kernel time, max abs diff.

Usage: python tools/prof/_prof_conv.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.models import common
import conv_kernel  # moved to tools/prof (archived negative result)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 32

# (h, w, c_in, c_out, k, act) — the profiled offenders at S=32.
SHAPES = [
    (80, 80, 32, 32, 3, True),    # td2 C2f bottleneck
    (80, 80, 64, 64, 3, True),    # reg tower
    (80, 80, 64, 80, 3, True),    # cls tower entry
    (80, 80, 80, 80, 3, True),    # cls tower
    (80, 80, 64, 64, 1, True),    # C2f cv1
    (80, 80, 96, 64, 1, True),    # C2f cv2
    (80, 80, 192, 64, 1, True),   # neck cv1 post-concat
    (80, 80, 80, 80, 1, False),   # head 1x1 bias, no act
    (40, 40, 64, 64, 3, True),    # P4-level tower convs
    (40, 40, 128, 128, 1, True),
]


R = 20  # chained in-jit iterations (amortizes ~1 ms tunnel dispatch)


def bench(fn, x, n=6):
    """fn applied R times inside ONE jit with optimization barriers
    between iterations (defeats CSE), timed over n dispatches."""

    @jax.jit
    def chained(xx):
        tot = jnp.zeros((), jnp.float32)
        for _ in range(R):
            y = fn(xx)
            tot = tot + y[0, 0, 0, 0].astype(jnp.float32)
            xx = jax.lax.optimization_barrier(xx)
        return tot

    chained(x).block_until_ready()
    chained(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = chained(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / (n * R) * 1e6  # us


def main():
    print("backend:", jax.default_backend(), " S =", S)
    key = jax.random.PRNGKey(0)
    for h, w, ci, co, k, act in SHAPES:
        x = jax.random.normal(key, (S, h, w, ci)).astype(jnp.bfloat16)
        wgt = (jax.random.normal(key, (k, k, ci, co)) * 0.05).astype(
            jnp.float32
        )
        b = jax.random.normal(key, (co,)) * 0.1
        p = {"w": wgt, "b": b}

        # (PALLAS_CONV routing removed from common.py; XLA path is default)
        xla = lambda xx: common.conv_apply(p, xx, act=act)
        t_xla = bench(xla, x)

        w2 = wgt.reshape(k * k * ci, co)
        pk = lambda xx: conv_kernel.pallas_conv_act(xx, w2, b, k=k, act=act)
        t_pal = bench(pk, x)

        d = float(
            jnp.max(
                jnp.abs(
                    xla(x).astype(jnp.float32) - pk(x).astype(jnp.float32)
                )
            )
        )
        gflop = 2 * k * k * ci * co * S * h * w / 1e9
        print(
            f"{h}x{w} {ci:>3}->{co:<3} k{k} act={int(act)}: "
            f"XLA {t_xla:7.1f} us ({gflop/t_xla*1e3:6.1f} TF/s)  "
            f"Pallas {t_pal:7.1f} us ({gflop/t_pal*1e3:6.1f} TF/s)  "
            f"x{t_xla/t_pal:4.1f}  maxdiff {d:.4f}"
        )


if __name__ == "__main__":
    main()
