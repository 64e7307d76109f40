"""Scratch: does space-to-depth packing (HxWxC -> H/2 x W/2 x 4C) make
the small-channel CSP stages faster on this TPU?

Each measurement is ONE dispatch: lax.fori_loop of N chained block
applications inside jit (output renormalized to input shape in-jit).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

S = 32
N_INNER = 20
rng = jax.random.PRNGKey(0)
dt = jnp.bfloat16


def conv(x, w, stride=1):
    k = w.shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def silu(x):
    return x * jax.nn.sigmoid(x)


def mk(k, ci, co, key):
    return (jax.random.normal(key, (k, k, ci, co)) * 0.05).astype(dt)


def bench(name, body, x):
    """body: x -> y (any shape). Chain via scalar feedback in-jit."""

    @jax.jit
    def loop(x):
        def it(i, x):
            y = body(x)
            s = (y.astype(jnp.float32).mean() * 0 + 1).astype(dt)
            return x * s

        return jax.lax.fori_loop(0, N_INNER, it, x)

    y = loop(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = loop(y)
    jax.block_until_ready(y)
    ms = (time.perf_counter() - t0) / reps / N_INNER
    print(f"{name:46s} {ms*1e3:8.3f} ms", flush=True)


def c2f_body(hw, c, n, ci=None, pack=1):
    """c2f-shaped block; pack=p emulates s2d(p): spatial/p, channels*p^2."""
    p2 = pack * pack
    ci = (ci or c) * p2
    c_ = c * p2
    cm = c_ // 2
    hw = (hw[0] // pack, hw[1] // pack)
    ks = jax.random.split(rng, 2 + 2 * n)
    cv1 = mk(1, ci, 2 * cm, ks[0])
    cv2 = mk(1, (2 + n) * cm, c_, ks[1])
    bots = [(mk(3, cm, cm, ks[2 + 2 * i]), mk(3, cm, cm, ks[3 + 2 * i]))
            for i in range(n)]

    def f(x):
        y = silu(conv(x, cv1))
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for w1, w2 in bots:
            t = silu(conv(outs[-1], w1))
            t = silu(conv(t, w2))
            outs.append(outs[-1] + t)
        out = silu(conv(jnp.concatenate(outs, -1), cv2))
        # renormalize to input shape for chaining
        return out[..., :ci] if out.shape[-1] >= ci else jnp.tile(
            out, (1, 1, 1, ci // out.shape[-1]))

    x = jax.random.normal(jax.random.PRNGKey(1), (S, *hw, ci)).astype(dt)
    return f, x


for pack in (1, 2):
    tag = f"pack{pack}"
    f, x = c2f_body((160, 160), 32, 1, pack=pack)
    bench(f"stage1 c2f 160x160x32 {tag} -> {x.shape[1:]}", f, x)
for pack in (1, 2):
    tag = f"pack{pack}"
    f, x = c2f_body((80, 80), 64, 2, pack=pack)
    bench(f"stage2 c2f 80x80x64   {tag} -> {x.shape[1:]}", f, x)


def down_body(hw, ci, co, pack=1):
    p2 = pack * pack
    hw = (hw[0] // pack, hw[1] // pack)
    w = mk(3, ci * p2, co * p2, rng)

    def f(x):
        y = silu(conv(x, w, 2))
        return jnp.tile(y, (1, 2, 2, 1))[..., : ci * p2]

    x = jax.random.normal(jax.random.PRNGKey(1), (S, *hw, ci * p2)).astype(dt)
    return f, x


for pack in (1, 2):
    f, x = down_body((320, 320), 16, 32, pack=pack)
    bench(f"down1 k3s2 16->32 @320 pack{pack} -> {x.shape[1:]}", f, x)

# stem: 3->16 @640 vs packed 12->64 @320
w1 = mk(3, 3, 16, rng)


def stem_unpacked(x):
    y = silu(conv(x, w1, 2))
    return jnp.tile(y, (1, 2, 2, 1))[..., :3]


x = jax.random.normal(jax.random.PRNGKey(1), (S, 640, 640, 3)).astype(dt)
bench("stem k3s2 3->16 @640 pack1", stem_unpacked, x)

w2 = mk(3, 12, 64, rng)


def stem_packed(x):
    y = silu(conv(x, w2, 2))
    return jnp.tile(y, (1, 2, 2, 1))[..., :12]


x = jax.random.normal(jax.random.PRNGKey(1), (S, 320, 320, 12)).astype(dt)
bench("stem k3s2 12->64 @320 pack2", stem_packed, x)


# boundary costs
def s2d_body(x):
    b, h, w_, c = x.shape
    y = x.reshape(b, h // 2, 2, w_ // 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_ // 2, 4 * c)
    return jnp.tile(y, (1, 2, 2, 1))[..., :c]


x = jax.random.normal(jax.random.PRNGKey(1), (S, 640, 640, 4)).astype(dt)
bench("s2d 640x640x4 (+tile-back overhead)", s2d_body, x)
