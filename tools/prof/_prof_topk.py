"""Scratch: top-k lowering shootout for the NMS candidate select.

The roofline audit showed approx_max_k on (64, 8400) f32 lowering to a
FULL SORT (430 us/step S=64) plus slow downstream gathers (374+374+233
us). Candidates:

  approx_f32 : current — jax.lax.approx_max_k(f32)
  approx_bf16: same, bf16 keys (source is bf16; ordering identical)
  topk_f32   : jax.lax.top_k(f32) — may lower to the TPU TopK/
               PartialReduce custom call instead of sort
  topk_bf16  : jax.lax.top_k(bf16)

plus gather formulations consuming the winner's idx (two row-gathers
vs one fused table gather vs one-hot matmul).

Harness: chained lax.scan with per-iteration data perturbation (the
relay elides repeated identical top-level dispatches AND XLA DCEs
unconsumed pure ops — NOTES round-3/4 lessons). sort/gather are opaque
enough to survive the chain; results are RELATIVE rankings.

Usage: python tools/prof/_prof_topk.py [S] [R]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
R = int(sys.argv[2]) if len(sys.argv) > 2 else 20
A, K = 8400, 512

rng = np.random.default_rng(0)
logits0 = jnp.asarray(rng.normal(size=(S, A)).astype(np.float32) * 3)
cls_l = jnp.asarray(
    rng.normal(size=(S, A, 80)).astype(np.float32)
).astype(jnp.bfloat16)
box_l = jnp.asarray(
    rng.normal(size=(S, A, 64)).astype(np.float32)
).astype(jnp.bfloat16)
tbl = jnp.concatenate([cls_l, box_l], axis=-1)
jax.block_until_ready((logits0, cls_l, box_l, tbl))


def chain(body, label, n_inner=R):
    """body(x) -> scalar-ish feedback; chained R times inside one jit
    with input perturbed by the running feedback (true dependence)."""

    @jax.jit
    def run(x0):
        def step(carry, i):
            x = logits0 + carry + i.astype(jnp.float32) * 1e-6
            fb = body(x)
            return fb * 1e-9, None

        carry, _ = jax.lax.scan(step, x0, jnp.arange(n_inner))
        return carry

    out = run(jnp.float32(0.0))
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        out = run(jnp.float32(r) * 1e-7)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / n_inner
    print(f"{label:26s} {dt*1e6:9.1f} us/iter", flush=True)
    return dt


def f_approx_f32(x):
    v, i = jax.lax.approx_max_k(x, K)
    return jnp.sum(v[:, 0]) + jnp.sum(i[:, -1].astype(jnp.float32))


def f_approx_bf16(x):
    v, i = jax.lax.approx_max_k(x.astype(jnp.bfloat16), K)
    return (jnp.sum(v[:, 0].astype(jnp.float32))
            + jnp.sum(i[:, -1].astype(jnp.float32)))


def f_topk_f32(x):
    v, i = jax.lax.top_k(x, K)
    return jnp.sum(v[:, 0]) + jnp.sum(i[:, -1].astype(jnp.float32))


def f_topk_bf16(x):
    v, i = jax.lax.top_k(x.astype(jnp.bfloat16), K)
    return (jnp.sum(v[:, 0].astype(jnp.float32))
            + jnp.sum(i[:, -1].astype(jnp.float32)))


def g_two(x):
    _, i = jax.lax.approx_max_k(x, K)
    c = jnp.take_along_axis(cls_l, i[..., None], axis=1)
    b = jnp.take_along_axis(box_l, i[..., None], axis=1)
    return (jnp.sum(c[:, 0, 0].astype(jnp.float32))
            + jnp.sum(b[:, -1, -1].astype(jnp.float32)))


def g_fused(x):
    _, i = jax.lax.approx_max_k(x, K)
    g = jnp.take_along_axis(tbl, i[..., None], axis=1)
    return (jnp.sum(g[:, 0, 0].astype(jnp.float32))
            + jnp.sum(g[:, -1, -1].astype(jnp.float32)))


def g_onehot(x):
    _, i = jax.lax.approx_max_k(x, K)
    oh = (i[:, :, None] == jnp.arange(A)[None, None, :]).astype(jnp.bfloat16)
    g = jnp.einsum("ska,sac->skc", oh, tbl)
    return (jnp.sum(g[:, 0, 0].astype(jnp.float32))
            + jnp.sum(g[:, -1, -1].astype(jnp.float32)))


t_base = chain(f_approx_f32, "approx_f32 (current)")
for f, lab in [(f_approx_bf16, "approx_bf16"), (f_topk_f32, "topk_f32"),
               (f_topk_bf16, "topk_bf16")]:
    dt = chain(f, lab)
    print(f"    speedup {t_base/dt:.2f}x", flush=True)

print("-- gathers (include one approx_f32 topk each) --", flush=True)
for f, lab in [(g_two, "two row-gathers"), (g_fused, "fused table gather"),
               (g_onehot, "one-hot matmul gather")]:
    chain(f, lab)

# correctness: index SETS equal across key dtypes (same bf16 source)
xb = logits0.astype(jnp.bfloat16).astype(jnp.float32)
_, i1 = jax.lax.approx_max_k(xb, K)
_, i2 = jax.lax.top_k(xb, K)
_, i3 = jax.lax.approx_max_k(xb.astype(jnp.bfloat16), K)
s1, s2, s3 = (np.sort(np.asarray(v), -1) for v in (i1, i2, i3))
print("index sets approx_f32==topk_f32:", bool((s1 == s2).all()),
      " ==approx_bf16:", bool((s1 == s3).all()), flush=True)
