"""A/B: fused OSNet stage kernels vs the XLA block graph (round 5).

Standalone OSNet forward at the serving shapes (packed s2d crops,
bf16, bucket-sized batches). Interleaved timed blocks to cancel v5e
drift. Usage: python tools/prof/_prof_osnet_fused.py [G ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from strongsort_yolo_tpu.models import osnet as O  # noqa: E402

GS = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]


def main():
    params = O.init_osnet(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    rng = np.random.default_rng(0)

    for g in GS:
        # VARY the operand per timed call — the v5e tunnel elides
        # repeat dispatches with equal args (NOTES round-4 pitfall)
        pool = [
            jnp.asarray(rng.uniform(0, 1, (g, 64, 32, 12)), jnp.bfloat16)
            for _ in range(4)
        ]

        def run(fused):
            fn = jax.jit(lambda p, c: O.osnet_apply(
                p, c, compute_dtype=jnp.bfloat16, packed_input=True,
                channel_order="bgr", fused=fused))
            out = fn(params, pool[0])
            jax.block_until_ready(out)
            return fn

        fa = run(False)
        fb = run(True)
        # interleaved blocks
        ta = tb = 0.0
        n = 24
        for _ in range(6):
            t0 = time.perf_counter()
            for i in range(n):
                o = fa(params, pool[i % 4])
            jax.block_until_ready(o)
            ta += time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(n):
                o = fb(params, pool[i % 4])
            jax.block_until_ready(o)
            tb += time.perf_counter() - t0
        us_a = ta / (6 * n) * 1e6
        us_b = tb / (6 * n) * 1e6
        print(f"G={g}: xla {us_a:.0f} us  fused {us_b:.0f} us  "
              f"({us_a / us_b:.2f}x)")
        # parity spot check
        ra = np.asarray(fa(params, pool[0]), np.float32)
        rb = np.asarray(fb(params, pool[0]), np.float32)
        cos = (ra * rb).sum(-1)
        print(f"   cosine min {cos.min():.5f} mean {cos.mean():.5f}")


if __name__ == "__main__":
    main()
