"""Scratch: conv-kernel formulation shootout on the real TPU.

Variants per shape (k=3 only — k=1 is already at parity):
  xla      — conv_general_dilated + bias + SiLU (XLA emitter)
  taps     — current kernel: 9 shifted narrow dots (conv_kernel.py)
  im2col   — 9 shifted planes lane-concatenated -> ONE (rows, 9C)x(9C,Co) dot
  dy3      — dx-concat (rows, 3C) base, 3 dy-rolled dots
  dots     — 9 dots of the UNSHIFTED plane (wrong numerics; isolates MXU
             cost of the narrow-contraction formulation)
  dot1     — one (rows, 9C) dot of a zero-padded X9 (isolates MXU cost of
             the wide formulation, no roll/mask/concat overhead)

Usage: python tools/prof/_prof_conv2.py [batch]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strongsort_yolo_tpu.models import common
import conv_kernel  # moved to tools/prof (archived negative result)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 32

SHAPES = [
    (80, 80, 32, 32, 3),
    (80, 80, 64, 64, 3),
    (80, 80, 64, 80, 3),
    (80, 80, 80, 80, 3),
    (40, 40, 64, 64, 3),
]

R = 20


def _coords(rows, w, h):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    yq = jax.lax.div(r, jnp.int32(w))
    xc = r - yq * jnp.int32(w)
    yc = jax.lax.rem(yq, jnp.int32(h))
    return xc, yc


def _planes9(x2d, w, h):
    rows = x2d.shape[0]
    xc, yc = _coords(rows, w, h)
    x_m = jnp.where(xc >= 1, jnp.roll(x2d, 1, axis=0), 0)
    x_p = jnp.where(xc <= w - 2, jnp.roll(x2d, -1, axis=0), 0)
    out = []
    for dy in (-1, 0, 1):
        for base in (x_m, x2d, x_p):
            shifted = base if dy == 0 else jnp.roll(base, -dy * w, axis=0)
            if dy == -1:
                shifted = jnp.where(yc >= 1, shifted, 0)
            elif dy == 1:
                shifted = jnp.where(yc <= h - 2, shifted, 0)
            out.append(shifted)
    return out


def _kernel_im2col(x_ref, w_ref, b_ref, out_ref, *, h, w, act, n_img):
    c_in = x_ref.shape[-1]
    rows = n_img * h * w
    x2d = x_ref[...].reshape(rows, c_in)
    x9 = jnp.concatenate(_planes9(x2d, w, h), axis=1)
    acc = jax.lax.dot_general(
        x9, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = acc + b_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.astype(out_ref.dtype).reshape(out_ref.shape)


def _kernel_dy3(x_ref, w_ref, b_ref, out_ref, *, h, w, act, n_img):
    c_in = x_ref.shape[-1]
    c_out = out_ref.shape[-1]
    rows = n_img * h * w
    x2d = x_ref[...].reshape(rows, c_in)
    xc, yc = _coords(rows, w, h)
    x_m = jnp.where(xc >= 1, jnp.roll(x2d, 1, axis=0), 0)
    x_p = jnp.where(xc <= w - 2, jnp.roll(x2d, -1, axis=0), 0)
    x3 = jnp.concatenate([x_m, x2d, x_p], axis=1)  # (rows, 3C)
    acc = jnp.zeros((rows, c_out), jnp.float32)
    for i, dy in enumerate((-1, 0, 1)):
        shifted = x3 if dy == 0 else jnp.roll(x3, -dy * w, axis=0)
        if dy == -1:
            shifted = jnp.where(yc >= 1, shifted, 0)
        elif dy == 1:
            shifted = jnp.where(yc <= h - 2, shifted, 0)
        acc = acc + jax.lax.dot_general(
            shifted,
            w_ref[i * 3 * c_in : (i + 1) * 3 * c_in, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc + b_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.astype(out_ref.dtype).reshape(out_ref.shape)


def _kernel_dots(x_ref, w_ref, b_ref, out_ref, *, h, w, act, n_img):
    """WRONG numerics: 9 dots of the unshifted plane (MXU-cost probe)."""
    c_in = x_ref.shape[-1]
    c_out = out_ref.shape[-1]
    rows = n_img * h * w
    x2d = x_ref[...].reshape(rows, c_in)
    acc = jnp.zeros((rows, c_out), jnp.float32)
    for si in range(9):
        acc = acc + jax.lax.dot_general(
            x2d,
            w_ref[si * c_in : (si + 1) * c_in, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc + b_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.astype(out_ref.dtype).reshape(out_ref.shape)


def _kernel_dot1(x_ref, w_ref, b_ref, out_ref, *, h, w, act, n_img):
    """WRONG numerics: tile the plane 9x along lanes, one wide dot."""
    c_in = x_ref.shape[-1]
    rows = n_img * h * w
    x2d = x_ref[...].reshape(rows, c_in)
    x9 = jnp.concatenate([x2d] * 9, axis=1)
    acc = jax.lax.dot_general(
        x9, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = acc + b_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.astype(out_ref.dtype).reshape(out_ref.shape)


def call(kern, x, w2, b, n_img, c_out, act):
    n, h, wdt, c_in = x.shape
    kernel = functools.partial(kern, h=h, w=wdt, act=act, n_img=n_img)
    return pl.pallas_call(
        kernel,
        grid=(n // n_img,),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec((n_img, h, wdt, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_img, h, wdt, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w2.astype(x.dtype), b.reshape(1, -1).astype(jnp.float32))


def bench(fn, x, n=6):
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
    return (time.perf_counter() - t0) / (n * R) * 1e6


def main():
    print("backend:", jax.default_backend(), " S =", S, flush=True)
    key = jax.random.PRNGKey(0)
    for h, w, ci, co, k in SHAPES:
        x = jax.random.normal(key, (S, h, w, ci)).astype(jnp.bfloat16)
        wgt = (jax.random.normal(key, (k, k, ci, co)) * 0.05).astype(jnp.float32)
        b = jax.random.normal(key, (co,)) * 0.1
        w2 = wgt.reshape(k * k * ci, co)
        n_img = conv_kernel._images_per_block(S, h, w, ci, co)
        gflop = 2 * k * k * ci * co * S * h * w / 1e9

        # (PALLAS_CONV routing removed from common.py; XLA path is default)
        p = {"w": wgt, "b": b}
        res = {}
        res["xla"] = bench(lambda xx: common.conv_apply(p, xx, act=True), x)
        res["taps"] = bench(
            lambda xx: conv_kernel.pallas_conv_act(xx, w2, b, k=3, act=True), x)
        for name, kern in [("im2col", _kernel_im2col), ("dy3", _kernel_dy3),
                           ("dots", _kernel_dots), ("dot1", _kernel_dot1)]:
            res[name] = bench(
                lambda xx, kk=kern: call(kk, xx, w2, b, n_img, co, True), x)

        ref = common.conv_apply(p, x, act=True).astype(jnp.float32)
        d = float(jnp.max(jnp.abs(
            ref - call(_kernel_im2col, x, w2, b, n_img, co, True
                       ).astype(jnp.float32))))
        line = f"{h}x{w} {ci:>3}->{co:<3} nimg={n_img}: " + "  ".join(
            f"{nm} {t:6.0f}us({gflop/t*1e3:5.1f}TF)" for nm, t in res.items()
        ) + f"  im2col_maxdiff {d:.4f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
