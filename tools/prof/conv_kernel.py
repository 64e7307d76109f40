"""Fused conv + bias + SiLU Pallas kernel for small-channel stages.

MEASURED NEGATIVE RESULT — kept as the tested artifact, routing
disabled by default. Motivation was the S=32 step profile
(tools/prof/_prof_trace2.py): XLA's ``EmitAllBatchInSublanes`` emitter
appeared to run the small-channel 80x80 stages (P3 neck C2f, detect
towers, C in {32, 64, 80}) at 2.5-12% of v5e bf16 peak. The
formulation shootout on real hardware (tools/prof/_prof_conv.py,
_prof_conv2.py, S=32, 2026-08-17) falsified the kernel approach:

  shape (k=3)     XLA      taps     im2col   dy3      dot1*
  80x80  32->32   627us    902      874      790      497
  80x80  64->64   483us    919      892      942      634
  80x80  64->80   540us    921      885      915      564
  80x80  80->80   556us    768      853      841      452
  40x40  64->64   333us    433      377      469      318
  (*dot1 = wrong-numerics MXU-cost floor probe: one (rows, 9C) dot
   with no shifts/masks — the best POSSIBLE Pallas time)

Standalone XLA already reaches 31-42 TF/s on the wide k=3 shapes; on
narrow ones (32->32) every MXU formulation is output-lane-bound
(c_out=32 of 128 lanes = 25% ceiling), so even the overhead-free dot1
probe only ties XLA. k=1 shapes are at parity (both HBM-bound). The
in-step "3-6x off roofline" gap is therefore a property of layout
assignment inside the fused step program, not of XLA's conv emitter —
a Pallas takeover cannot beat it from outside the program.

Design (stride-1, groups-1, 'same'-padded k in {1, 3} — the shapes the
profile indicts; everything else stays on XLA):

- grid over images (several images per block when the plane is small);
  each block holds the full (rows, C_in) activation plane in VMEM, so
  HBM sees exactly one contiguous read of x and one write of y;
- the 3x3 conv is 9 shifted MXU dots accumulated in f32: the (dy, dx)
  tap is a static roll of the flattened (H*W, C) plane by -(dy*W + dx)
  rows (static slices + concat — not gathers, which scalarize inside
  large programs, and not ``pltpu.roll``, whose dynamic_rotate only
  handles 32-bit data), with the rows that wrapped across the image
  border masked to zero (same-padding semantics). Rolling a
  multi-image block wraps rows into the *neighbouring* image, but
  those are exactly the border rows the mask already kills, so images
  per block is purely a VMEM/occupancy knob;
- the epilogue (bias add + SiLU) runs on the f32 accumulator before
  the single cast back to the compute dtype — one rounding step, where
  the XLA path rounds between conv and epilogue.

``conv_act`` wraps the kernel in a custom VJP whose backward pass is
derived from the XLA formulation, so differentiating callers (the
trainer reaches conv2d_bias_apply) stay correct without a handwritten
transpose kernel. Reference parity: this implements the same Conv2d
(+folded BN +SiLU) the reference's ultralytics backbone runs on CUDA
(invoked from /root/reference/yolo_multi_model.py:41 via model.track);
numerics are validated against the XLA path in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shifts in row-major tap order matching HWIO weight layout: the tap
# (ky, kx) of a 3x3 kernel reads input pixel (y + ky - 1, x + kx - 1).
_TAPS3 = tuple(
    (ky - 1, kx - 1) for ky in range(3) for kx in range(3)
)


def _conv_kernel(
    x_ref, w_ref, b_ref, out_ref, *, h, w, k, act, n_img
):
    """One block: n_img full images, flattened to (n_img*h*w, c_in).

    The tap loop is pure SSA on purpose: serializing the taps through
    reused VMEM scratch refs (to bound liveness) miscompiled on real
    hardware — taps raced the in-flight MXU reads of the shared buffer
    and 7 of 9 taps came back corrupted, while the SSA form is exact.
    The cost is peak VMEM of ~10 lane-padded plane temporaries, paid
    for with a raised vmem limit and the n_img sizing in
    ``_images_per_block``.
    """
    c_in = x_ref.shape[-1]
    c_out = out_ref.shape[-1]
    rows = n_img * h * w
    x2d = x_ref[...].reshape(rows, c_in)

    if k == 1:
        acc = jax.lax.dot_general(
            x2d,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # Row/col coordinate of each flattened row, within its image.
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        yq = jax.lax.div(r, jnp.int32(w))
        xc = r - yq * jnp.int32(w)
        yc = jax.lax.rem(yq, jnp.int32(h))
        # Tap (dy, dx) reads pixel (y+dy, x+dx): a roll of the
        # flattened plane by -(dy*w + dx) rows. Rolls are static
        # slice+concat (Mosaic's dynamic_rotate only handles 32-bit
        # data, so pltpu.roll is out for bf16). The +-1-row (dx)
        # rolls land off the 16-sublane bf16 tile grid and cost a
        # full relayout shuffle, so they are hoisted: two masked
        # dx-bases are built once and the per-tap dy rolls (+-w rows,
        # w a multiple of 16) stay tile-aligned.
        x_m = jnp.where(xc >= 1, jnp.roll(x2d, 1, axis=0), 0)
        x_p = jnp.where(xc <= w - 2, jnp.roll(x2d, -1, axis=0), 0)
        bases = {-1: x_m, 0: x2d, 1: x_p}
        acc = jnp.zeros((rows, c_out), jnp.float32)
        for si, (dy, dx) in enumerate(_TAPS3):
            base = bases[dx]
            # The column mask rolls along with the data (dy*w moves
            # whole image rows, preserving x), so only the row mask
            # remains per tap; it also kills the rows a multi-image
            # roll wrapped across an image (or block) boundary.
            shifted = base if dy == 0 else jnp.roll(base, -dy * w, axis=0)
            if dy == -1:
                shifted = jnp.where(yc >= 1, shifted, 0)
            elif dy == 1:
                shifted = jnp.where(yc <= h - 2, shifted, 0)
            acc = acc + jax.lax.dot_general(
                shifted,
                w_ref[si * c_in : (si + 1) * c_in, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    y = acc + b_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.astype(out_ref.dtype).reshape(out_ref.shape)


def _lanes(c: int) -> int:
    return -(-c // 128) * 128  # VMEM lane padding for sub-128 channels


def _block_bytes(n_img: int, h: int, w: int, c_in: int, c_out: int) -> int:
    """Peak VMEM estimate for the SSA tap loop: the 9 shifted+masked
    tap temporaries can all be live (plus x, double-buffered blocks,
    and the f32 accumulator), all lane-padded."""
    rows = n_img * h * w
    return rows * (24 * _lanes(c_in) + 10 * _lanes(c_out))


def _images_per_block(n: int, h: int, w: int, c_in: int, c_out: int) -> int:
    """Largest block (divisor of n, <= 8) whose working set fits VMEM."""
    budget = 72 * 1024 * 1024
    best = 1
    for cand in (2, 4, 8):
        if n % cand == 0 and _block_bytes(cand, h, w, c_in, c_out) <= budget:
            best = cand
    return best


@functools.partial(
    jax.jit, static_argnames=("k", "act", "interpret")
)
def pallas_conv_act(
    x: jnp.ndarray,  # (N, H, W, C_in), compute dtype
    w: jnp.ndarray,  # (k*k*C_in, C_out) — HWIO flattened over (ky, kx, ci)
    b: jnp.ndarray,  # (C_out,) f32
    *,
    k: int,
    act: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """'same' stride-1 conv + bias + (optional) SiLU. -> (N, H, W, C_out)."""
    n, h, wdt, c_in = x.shape
    c_out = w.shape[1]
    assert w.shape[0] == k * k * c_in
    n_img = _images_per_block(n, h, wdt, c_in, c_out)
    b2d = b.reshape(1, c_out).astype(jnp.float32)
    kernel = functools.partial(
        _conv_kernel, h=h, w=wdt, k=k, act=act, n_img=n_img
    )
    flops = 2 * k * k * c_in * c_out * n * h * wdt + (4 * n * h * wdt * c_out)
    out = pl.pallas_call(
        kernel,
        grid=(n // n_img,),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (n_img, h, wdt, c_in),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_img, h, wdt, c_out),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * h * wdt * (c_in + c_out) * 2,
            transcendentals=n * h * wdt * c_out if act else 0,
        ),
        interpret=interpret,
    )(x, w.astype(x.dtype), b2d)
    return out


def _conv_ref(x, w, b, k, act):
    """XLA reference of the same fused op (backward-pass delegate)."""
    c_in = x.shape[-1]
    c_out = w.shape[1]
    w4 = w.reshape(k, k, c_in, c_out).astype(x.dtype)
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        w4,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.astype(jnp.float32) + b.astype(jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _conv_act_vjp(k: int, act: bool, interpret: bool):
    """Differentiable wrapper: Pallas forward, XLA-derived backward.

    Lets callers (the detect-head towers) stay trainable — the trainer
    differentiates through conv2d_bias_apply — while inference gets the
    kernel. The backward pass re-derives grads from the XLA reference
    formulation, so training numerics never depend on the kernel.
    """

    @jax.custom_vjp
    def f(x, w, b):
        return pallas_conv_act(x, w, b, k=k, act=act, interpret=interpret)

    def fwd(x, w, b):
        return f(x, w, b), (x, w, b)

    def bwd(res, g):
        x, w, b = res
        _, vjp = jax.vjp(lambda *a: _conv_ref(*a, k, act), x, w, b)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def conv_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    k: int,
    act: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Public entry: differentiable fused conv+bias(+SiLU) via Pallas."""
    return _conv_act_vjp(k, act, interpret)(x, w, b)


def eligible(
    x_shape: tuple[int, ...],
    k: int,
    stride: int,
    groups: int,
    dilation: int,
) -> bool:
    """Shapes this kernel takes over from XLA (see module docstring)."""
    if k not in (1, 3) or stride != 1 or groups != 1 or dilation != 1:
        return False
    n, h, w, c_in = x_shape
    if (h * w) % 8 != 0 or h < 3 or w < 3:
        return False
    # Only worth it where XLA's batched-conv emitter is starved: the
    # large-spatial, narrow-channel stages. Wide convs (c_in >= 256 or
    # small planes) already run near roofline on XLA.
    if h * w < 1600 or c_in > 192:
        return False
    # Whole plane must fit comfortably in VMEM even at n_img=1.
    if _block_bytes(1, h, w, c_in, 128) > 72 * 1024 * 1024:
        return False
    return True
