"""Scratch: crop-einsum formulation shootout (NOTES perf backlog —
the StrongSORT embed's crop gather+resize is ~30% of the S=16 batched
step at 5.9 ms/dispatch, ~8x off the bf16 MAC roofline).

Hypothesis: the dense interp einsums place C=3 in the 128-lane minor
dim (42x lane padding on the contraction operands). Variants keep the
channel axis out of the lanes / fold it into the batch.

Usage: python tools/prof/_prof_crops.py [M] [S]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from strongsort_yolo_tpu.ops.crops import (
    _tap_matrices, crop_and_resize, crop_and_resize_packed,
)
from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

M = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H, W = 1080, 1920
OH, OW = 128, 64
DT = jnp.bfloat16

rng = np.random.default_rng(0)
frames = jnp.asarray(
    rng.uniform(0, 1, (S, H, W, 3)).astype(np.float32), DT
)
bx = rng.uniform(0, 1, (S, M, 4)).astype(np.float32)
boxes = np.stack(
    [
        bx[..., 0] * (W - 200),
        bx[..., 1] * (H - 400),
        bx[..., 0] * (W - 200) + 40 + bx[..., 2] * 160,
        bx[..., 1] * (H - 400) + 80 + bx[..., 3] * 320,
    ],
    axis=-1,
)
boxes = jnp.asarray(boxes)


def taps(img, b):
    h, w = img.shape[:2]
    sh, sw = h // 2, w // 2
    src = resize_bilinear_matmul(img, sh, sw)
    x1, y1, x2, y2 = (b[:, i].astype(jnp.float32) for i in range(4))
    rw = _tap_matrices(y1 * 0.5, jnp.maximum(y2 - y1, 1e-3) * 0.5, OH, sh, DT)
    cw = _tap_matrices(x1 * 0.5, jnp.maximum(x2 - x1, 1e-3) * 0.5, OW, sw, DT)
    return src, rw, cw


def v_baseline(img, b):
    """Current production form (cols-first, C minor throughout)."""
    src, rw, cw = taps(img, b)
    tmp = jnp.einsum("mow,hwc->mhoc", cw, src)
    return jnp.einsum("mrh,mhoc->mroc", rw, tmp)


def v_packed(img, b):
    return crop_and_resize_packed(img, b, (OH, OW))


def v_chan_batch(img, b):
    """Channel as an outer batch dim: every contraction has lane dim
    ow (64) or oh (128), never C=3. One final transpose to NHWC."""
    src, rw, cw = taps(img, b)
    srcT = src.transpose(2, 0, 1)  # (C, sh, sw)
    tmp = jnp.einsum("mow,chw->mcho", cw, srcT)  # (M, C, sh, ow)
    out = jnp.einsum("mrh,mcho->mcro", rw, tmp)  # (M, C, oh, ow)
    return out.transpose(0, 2, 3, 1)


def v_chan_batch_rows_first(img, b):
    src, rw, cw = taps(img, b)
    srcT = src.transpose(2, 0, 1)  # (C, sh, sw)
    tmp = jnp.einsum("mrh,chw->mcrw", rw, srcT)  # (M, C, oh, sw)
    out = jnp.einsum("mow,mcrw->mcro", cw, tmp)  # (M, C, oh, ow)
    return out.transpose(0, 2, 3, 1)


def v_flatcols(img, b):
    """Fold C into the column-tap lhs (cw ⊗ I3): contraction operands
    are (ow*3, sw*3) x (sh, sw*3) — lane dim sw*3/ow*3, C never minor
    alone."""
    src, rw, cw = taps(img, b)
    sh, sw = src.shape[:2]
    eye = jnp.eye(3, dtype=DT)
    cw3 = (cw[:, :, None, :, None] * eye[None, None, :, None, :]).reshape(
        M, OW * 3, sw * 3
    )
    flat = src.reshape(sh, sw * 3)  # (sh, sw*3)
    tmp = jnp.einsum("mof,hf->mho", cw3, flat)  # (M, sh, ow*3)
    out = jnp.einsum("mrh,mho->mro", rw, tmp)  # (M, oh, ow*3)
    return out.reshape(M, OH, OW, 3)


def v_windowed(img, b):
    """Banded form: per crop, slice an aligned 256x256 source window
    around the box (dynamic_slice -> big contiguous gather) and
    contract only inside it. ~4x fewer MACs than dense at ds2; EXACT
    only for boxes fitting the window (the shootout boxes do) — a
    production version would mask-blend a ds4 pass for larger boxes."""
    src, rw, cw = taps(img, b)
    sh, sw = src.shape[:2]
    WIN = 256
    x1, y1 = b[:, 0] * 0.5, b[:, 1] * 0.5

    def one(rwm, cwm, bx1, by1):
        # align starts down to 8 (sublane) / 128 (lane) multiples
        ys = jnp.clip(
            (by1.astype(jnp.int32) // 8) * 8, 0, max(sh - WIN, 0)
        )
        xs = jnp.clip(
            (bx1.astype(jnp.int32) // 128) * 128, 0, max(sw - WIN, 0)
        )
        win = jax.lax.dynamic_slice(src, (ys, xs, 0), (WIN, WIN, 3))
        rww = jax.lax.dynamic_slice(rwm, (0, ys), (OH, WIN))
        cww = jax.lax.dynamic_slice(cwm, (0, xs), (OW, WIN))
        tmp = jnp.einsum("ow,hwc->hoc", cww, win)  # (WIN, ow, C)
        return jnp.einsum("rh,hoc->roc", rww, tmp)

    return jax.vmap(one)(rw, cw, x1, y1)


def v_windowed_unaligned(img, b):
    """Same banded form but with UNALIGNED window starts (XLA
    dynamic_slice takes any offset; alignment only matters for Pallas
    refs) — half the alignment slack, so smaller windows would fit."""
    src, rw, cw = taps(img, b)
    sh, sw = src.shape[:2]
    WIN = 256
    x1, y1 = b[:, 0] * 0.5, b[:, 1] * 0.5

    def one(rwm, cwm, bx1, by1):
        ys = jnp.clip(by1.astype(jnp.int32) - 2, 0, max(sh - WIN, 0))
        xs = jnp.clip(bx1.astype(jnp.int32) - 2, 0, max(sw - WIN, 0))
        win = jax.lax.dynamic_slice(src, (ys, xs, 0), (WIN, WIN, 3))
        rww = jax.lax.dynamic_slice(rwm, (0, ys), (OH, WIN))
        cww = jax.lax.dynamic_slice(cwm, (0, xs), (OW, WIN))
        tmp = jnp.einsum("ow,hwc->hoc", cww, win)
        return jnp.einsum("rh,hoc->roc", rww, tmp)

    return jax.vmap(one)(rw, cw, x1, y1)


VARIANTS = {
    "baseline": v_baseline,
    "packed": v_packed,
    "chan_batch": v_chan_batch,
    "chan_rows1st": v_chan_batch_rows_first,
    "flatcols": v_flatcols,
    "windowed": v_windowed,
    "windowed_unal": v_windowed_unaligned,
}


def bench(name, fn):
    @jax.jit
    def run(fr, bs):
        def one(img, b):
            o = fn(img, b)
            return o.astype(DT)

        return jax.vmap(one)(fr, bs)

    out = run(frames, boxes)
    jax.block_until_ready(out)
    # Direct dispatches. The chained-scan harness (see git history)
    # was defeated by XLA for the dense baseline even with a squared
    # full-output reduction (timed 0.004 ms vs a ~1.3 ms bf16-MAC
    # roofline) — the ~1 ms tunnel dispatch floor is the honest tax
    # and is small against the 5-65 ms variant signals here.
    t0 = time.perf_counter()
    for _ in range(20):
        out = run(frames, boxes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:>14}: {dt*1e3:7.3f} ms/dispatch (S={S}, M={M})", flush=True)
    return out


ref = None
for name, fn in VARIANTS.items():
    out = bench(name, fn)
    if name == "packed":
        from strongsort_yolo_tpu.ops.pack import depth_to_space

        out = jax.vmap(depth_to_space)(out.reshape(S * M, OH // 2, OW // 2, 12)).reshape(
            S, M, OH, OW, 3
        )
    if ref is None:
        ref = np.asarray(out, np.float32)
    else:
        err = np.max(np.abs(np.asarray(out, np.float32) - ref))
        print(f"               max|Δ| vs baseline = {err:.5f}")
