"""Scratch: int8 viability probe on the v5e through XLA.

v5e int8 MXU peak is 2x bf16 (NOTES/VERDICT r3 ask #2). Before
building a PTQ path, measure what XLA actually emits for:
  - k=3 convs at the detector's hot shapes, int8 x int8 -> int32
  - the same as bf16 (baseline)
  - dot_general int8 (matmul form, OSNet-ish and im2col-ish shapes)
Chained in ONE jit per candidate (R iterations, input perturbed per
iter, optimization_barrier carry) — the relay elides repeated
identical dispatches and DCEs unchained linalg (NOTES round-3/4).

Usage: python tools/prof/_prof_int8.py [R]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

R = int(sys.argv[1]) if len(sys.argv) > 1 else 200

def timed_chain(name, f, x, gflop):
    lo, hi = 10, 10 + R

    def mk(r):
        @jax.jit
        def chain(x):
            def body(c, _):
                y = f(x + c.astype(x.dtype))
                y = jax.lax.optimization_barrier(y)
                # data-dependent carry keeps iterations live
                return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(r))
            return c
        return chain

    clo, chi = mk(lo), mk(hi)
    jax.block_until_ready(clo(x)); jax.block_until_ready(chi(x))
    tls, ths = [], []
    for k in (1, 2, 3):  # distinct inputs (relay caches equal args);
        t0 = time.perf_counter(); jax.block_until_ready(clo(x + k)); tls.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(chi(x + k)); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(tls)) / R
    print(f"{name:44s} {per*1e3:8.3f} ms/iter  {gflop/per/1e3:8.1f} TF/s(eq)",
          flush=True)
    return per

rng = np.random.default_rng(0)

# detector hot conv: (16, 80, 80, 64) x k3 -> 64
for S, hw, cin, cout in [(16, 80, 64, 64), (16, 40, 128, 128), (16, 80, 32, 32)]:
    shape = (S, hw, hw, cin)
    gflop = 2 * 9 * cin * cout * S * hw * hw / 1e9
    wf = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)), jnp.bfloat16)
    xf = jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)
    conv = lambda x, w=wf: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timed_chain(f"conv k3 {shape} bf16", conv, xf, gflop)

    wi = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
    xi = jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
    convi = lambda x, w=wi: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    try:
        timed_chain(f"conv k3 {shape} int8->int32", convi, xi, gflop)
    except Exception as e:
        print(f"conv int8 {shape}: FAILED {type(e).__name__}: {e}", flush=True)

# matmul forms (im2col-ish + OSNet 1x1-ish)
for m, k, n in [(102400, 576, 64), (1048576, 64, 64), (8192, 1152, 128)]:
    gflop = 2 * m * k * n / 1e9
    af = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    bf = jnp.asarray(rng.normal(0, 0.1, (k, n)), jnp.bfloat16)
    dot = lambda a, b=bf: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())))
    timed_chain(f"dot ({m},{k})x({k},{n}) bf16", dot, af, gflop)
    ai = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    doti = lambda a, b=bi: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    try:
        timed_chain(f"dot ({m},{k})x({k},{n}) int8->int32", doti, ai, gflop)
    except Exception as e:
        print(f"dot int8: FAILED {type(e).__name__}: {e}", flush=True)
