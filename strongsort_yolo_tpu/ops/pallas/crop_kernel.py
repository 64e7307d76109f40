"""Banded pyramid crop-resample kernel — the ReID embed tax killer.

The dense crop einsums (ops/crops.crop_and_resize) contract every crop
against the FULL ds2 frame: ~29 GFLOP/frame at 1080p/M=128, measured
5.9 ms of the 19.8 ms S=16 StrongSORT step (NOTES.md round-3 profile).
Per output pixel only 4 source pixels matter; the waste is ~2000x.

This kernel samples each crop from a fixed (BAND_H, BAND_W) band of a
per-crop pyramid level (ops/crops.banded_prep — level 0 is the ds2
image, so the semantics match the dense path exactly for every box
that fits a band; bigger boxes sample a 2x-coarser level, which is
BETTER-antialiased than 2-tapping ds2). Why the XLA attempts failed
and this works (NOTES.md crop shootout, 2026-08-18):

- XLA windowed/banded forms need per-crop dynamic_slice, which
  vmapped lowers to scalarized copies (66 ms measured). In Mosaic a
  dynamic slice with TILE-ALIGNED offsets (rows % 8, lanes % 128 —
  exactly what banded_prep emits) is a native vector load.
- The band feeds the MXU directly as a (C*BAND_H, BAND_W) operand of
  a per-crop matmul; the two-tap interpolation matrices are built
  IN-KERNEL from 6 scalars per crop (VPU comparisons against iota),
  so no (M, ow, W) tap tensors ever round-trip HBM.

Per crop: col dot (C*256, 512)x(512, 64) + C row dots (128, 256)x
(256, 64) = ~63 MFLOP vs ~226 MFLOP dense — plus the band read is
786 KB vs the full frame's 6.2 MB per crop-channel matmul.

Intermediate rounding matches ops/crops.crop_and_resize_pyramid (the
jit-able stacked-einsum form of the SAME semantic, used as the
non-TPU path and the equality oracle): columns first, intermediate
stored in the compute dtype, f32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strongsort_yolo_tpu.ops.crops import (
    BAND_H,
    BAND_W,
    _pad_dims,
    banded_prep,
    build_pyramid,
    pyramid_dims,
)


def _tap_and_sample(ints_ref, scal_ref, stack_ref, out_ref, *, base, g,
                    oh, ow, c):
    """Shared kernel body: build the two-tap interpolation matrices for
    the ``g`` crops of this grid step in one vectorized VPU chain, then
    sample each crop's band from ``stack_ref`` with two MXU dots.
    ``base`` is the first crop's flat index (for the SMEM int fields);
    ``scal_ref``/``out_ref`` are already blocked to this step's crops.
    See :func:`_crop_kernel` for the field layout."""
    dt = out_ref.dtype

    def col(i):
        return scal_ref[:, i].reshape(g, 1, 1)

    # row taps for all g crops: (g, oh, BAND_H)
    pos = col(0) + jax.lax.broadcasted_iota(
        jnp.int32, (g, oh, 1), 1
    ).astype(jnp.float32) * col(1)
    rel = jnp.clip(pos, 0.0, col(4) - 1.0) - col(6)
    grid_r = jax.lax.broadcasted_iota(jnp.int32, (g, oh, BAND_H), 2).astype(
        jnp.float32
    )
    roww3 = jnp.maximum(0.0, 1.0 - jnp.abs(grid_r - rel)).astype(dt)

    # col taps for all g crops, built TRANSPOSED: (g, BAND_W, ow)
    posx = col(2) + jax.lax.broadcasted_iota(
        jnp.int32, (g, 1, ow), 2
    ).astype(jnp.float32) * col(3)
    relx = jnp.clip(posx, 0.0, col(5) - 1.0) - col(7)
    grid_x = jax.lax.broadcasted_iota(jnp.int32, (g, BAND_W, ow), 1).astype(
        jnp.float32
    )
    colw3 = jnp.maximum(0.0, 1.0 - jnp.abs(grid_x - relx)).astype(dt)

    for gi in range(g):
        idx = base + gi
        y0 = pl.multiple_of(ints_ref[0, idx], 8)
        x0 = pl.multiple_of(ints_ref[1, idx], 128)
        band = stack_ref[0, :, pl.ds(y0, BAND_H), pl.ds(x0, BAND_W)]
        band2 = band.reshape(c * BAND_H, BAND_W)
        tmp = jnp.dot(band2, colw3[gi], preferred_element_type=jnp.float32)
        tmp = tmp.astype(dt).reshape(c, BAND_H, ow)
        for ch in range(c):
            out_ref[gi, ch] = jnp.dot(
                roww3[gi], tmp[ch], preferred_element_type=jnp.float32
            ).astype(dt)


def _crop_kernel(ints_ref, scal_ref, stack_ref, out_ref, *, g_crops, oh,
                 ow, c, m_blocks):
    """One grid step samples ``g_crops`` crops of one frame.

    ints_ref (2, B*M) i32 is scalar-prefetch SMEM (field-major — a
    (B*M, k) layout pads every row to lane width and overflows the 1MB
    SMEM at S=16/M=128): [y0_abs, x0]. The pyramid levels arrive as
    ONE vertically stacked planar array (1, C, sumHp, maxWp) and
    y0_abs = level_row_offset + y0 — every level's pad height is a
    multiple of 8, so y0_abs keeps the 8-alignment the dynamic slice
    needs, and the per-crop level select costs ZERO control flow
    (an earlier per-crop ``lax.switch`` over separate level refs was a
    correctness-equal alternative).

    scal_ref is a VMEM-blocked (g_crops, 8) f32 input: [y_base,
    y_step, x_base, x_step, h_l, w_l, y0_abs - row_off... (see
    wrapper: field 6 is the tap-relative row origin), x0] —
    vector-readable so the interpolation matrices for ALL g_crops
    crops build in ONE 3-D VPU chain instead of g_crops scalar chains.

    Tap formula: weight(i) = max(0, 1 - |i - clip(pos, 0, len-1)|) —
    algebraically identical to the clipped two-indicator form of
    ops/crops._tap_matrices / _rel_taps (including edge accumulation:
    both put weight 1 on the boundary pixel when pos clips), at half
    the VPU ops.
    """
    s = pl.program_id(0)
    mb = pl.program_id(1)
    base = (s * m_blocks + mb) * g_crops
    _tap_and_sample(ints_ref, scal_ref, stack_ref, out_ref, base=base,
                    g=g_crops, oh=oh, ow=ow, c=c)


def _crop_kernel_flat(ints_ref, scal_ref, stack_ref, out_ref, *, g_crops,
                      oh, ow, c):
    """Packed-batch variant: ONE flat grid over G//g_crops blocks of
    crops; the source FRAME is selected per block by the stack
    BlockSpec's index map reading ints_ref[2] (scalar prefetch), so a
    single kernel samples crops of many frames — each block's crops all
    belong to one frame (the packer pads per-stream counts to g_crops
    multiples to guarantee it)."""
    base = pl.program_id(0) * g_crops
    _tap_and_sample(ints_ref, scal_ref, stack_ref, out_ref, base=base,
                    g=g_crops, oh=oh, ow=ow, c=c)


def banded_crop_planar(
    levels_planar: list[jnp.ndarray],  # L x (B, C, Hp, Wp), band-padded
    scal: jnp.ndarray,                 # (B*M, 6) f32 (banded_prep rows)
    ints: jnp.ndarray,                 # (B*M, 3) i32 (banded_prep rows)
    out_hw: tuple[int, int],
    *,
    g_crops: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B*M, C, oh, ow) planar crops in the levels' dtype."""
    b, c = levels_planar[0].shape[:2]
    bm = scal.shape[0]
    m = bm // b
    oh, ow = out_hw
    g = min(g_crops, m)
    while m % g:
        g -= 1
    m_blocks = m // g

    # stack the levels vertically into ONE planar array; the per-crop
    # level select becomes an 8-aligned row offset (no control flow)
    row_off = np.cumsum(
        [0] + [lv.shape[2] for lv in levels_planar[:-1]]
    ).astype(np.int32)
    max_w = max(lv.shape[3] for lv in levels_planar)
    stack = jnp.concatenate(
        [
            jnp.pad(lv, ((0, 0), (0, 0), (0, 0), (0, max_w - lv.shape[3])))
            for lv in levels_planar
        ],
        axis=2,
    )

    # 8-field f32 per-crop row for the vectorized in-kernel tap build:
    # banded_prep's 6 fields + LEVEL-RELATIVE y0/x0 as floats (tap
    # indices are band-relative within the level)
    scal8 = jnp.concatenate([scal, ints[:, :2].astype(jnp.float32)], axis=1)
    y0_abs = ints[:, 0] + jnp.asarray(row_off)[ints[:, 2]]
    ints2 = jnp.stack([y0_abs, ints[:, 1]], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, m_blocks),
        in_specs=[
            pl.BlockSpec(
                (g, 8),
                (lambda s, mb, *_, mbk=m_blocks: (s * mbk + mb, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c, stack.shape[2], stack.shape[3]),
                (lambda s, mb, *_: (s, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, c, oh, ow),
            (lambda s, mb, *_, mbk=m_blocks: (s * mbk + mb, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _crop_kernel, g_crops=g, oh=oh, ow=ow, c=c, m_blocks=m_blocks,
    )
    vmem_bytes = (
        2 * int(np.prod(stack.shape[1:])) * stack.dtype.itemsize
        + 4 * g * c * oh * ow * stack.dtype.itemsize
        + 2**22
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bm, c, oh, ow), levels_planar[0].dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 2**20), 120 * 2**20),
        ),
        interpret=interpret,
    )(ints2.T, scal8, stack)


def banded_crop(
    images: jnp.ndarray,  # (B, H, W, C) float — SOURCE frames
    boxes: jnp.ndarray,   # (B, M, 4) xyxy in source pixels
    out_hw: tuple[int, int] = (128, 64),
    *,
    downscale: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, M, oh, ow, C) f32 crops — banded-pyramid semantics
    (== ops/crops.crop_and_resize_pyramid per frame; == the classic
    crop_and_resize for every box whose ds2 span fits a band)."""
    b, h, w, c = images.shape
    m = boxes.shape[1]
    dims = pyramid_dims(h, w, downscale)
    pads = _pad_dims(dims)
    levels = build_pyramid(images, downscale)
    planar = [
        jnp.pad(
            jnp.transpose(lv, (0, 3, 1, 2)),
            ((0, 0), (0, 0), (0, hp - ph), (0, wp - pw)),
        )
        for lv, (ph, pw), (hp, wp) in zip(levels, dims, pads)
    ]
    scal, ints = jax.vmap(
        lambda bx: banded_prep(bx, (h, w), dims, out_hw)
    )(boxes)
    out = banded_crop_planar(
        planar,
        scal.reshape(b * m, 6),
        ints.reshape(b * m, 3),
        out_hw,
        interpret=interpret,
    )
    oh, ow = out_hw
    return (
        out.reshape(b, m, c, oh, ow)
        .transpose(0, 1, 3, 4, 2)
        .astype(jnp.float32)
    )


def _planar_stack(images: jnp.ndarray, downscale: int):
    """(B, H, W, C) -> vertically stacked band-padded planar pyramid
    (B, C, sumHp, maxWp) + per-level row offsets (np.ndarray)."""
    b, h, w, c = images.shape
    dims = pyramid_dims(h, w, downscale)
    pads = _pad_dims(dims)
    levels = build_pyramid(images, downscale)
    max_w = max(wp for _, wp in pads)
    planar = [
        jnp.pad(
            jnp.transpose(lv, (0, 3, 1, 2)),
            ((0, 0), (0, 0), (0, hp - ph), (0, max_w - pw)),
        )
        for lv, (ph, pw), (hp, wp) in zip(levels, dims, pads)
    ]
    row_off = np.cumsum(
        [0] + [lv.shape[2] for lv in planar[:-1]]
    ).astype(np.int32)
    return jnp.concatenate(planar, axis=2), row_off, dims


def banded_crop_packed(
    images: jnp.ndarray,       # (S, H, W, C) float — SOURCE frames
    boxes_g: jnp.ndarray,      # (G, 4) xyxy in source pixels, PACKED
    slot_stream: jnp.ndarray,  # (G,) i32 — source frame of each slot
    out_hw: tuple[int, int] = (128, 64),
    *,
    downscale: int = 2,
    g_crops: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed cross-stream crop sampling: ONE kernel over G crop slots
    shared by all S frames -> (G, oh, ow, C) f32.

    This is the embed-tax fix for the batched StrongSORT S-curve: the
    fixed-width form samples S*topk slots regardless of load, while the
    packed form's G tracks the REAL total det count (the caller packs
    valid dets contiguously, padding each stream's count to a g_crops
    multiple). REQUIREMENT: every aligned block of ``g_crops`` slots
    maps to a single frame (slot_stream constant within a block) — the
    block's pyramid is DMA'd once per block, and Pallas skips the
    re-fetch when consecutive blocks index the same frame, so the
    stream-major packing costs ~S pyramid loads total, same as the
    per-frame grid. Crop semantics per slot are identical to
    :func:`banded_crop` (same prep, same taps, same dots).
    """
    s, h, w, c = images.shape
    G = boxes_g.shape[0]
    if G % g_crops:
        raise ValueError(f"G={G} must be a multiple of g_crops={g_crops}")
    oh, ow = out_hw
    stack, row_off, dims = _planar_stack(images, downscale)
    scal, ints = banded_prep(boxes_g, (h, w), dims, out_hw)  # (G,6),(G,3)
    scal8 = jnp.concatenate([scal, ints[:, :2].astype(jnp.float32)], axis=1)
    y0_abs = ints[:, 0] + jnp.asarray(row_off)[ints[:, 2]]
    ints3 = jnp.stack(
        [y0_abs, ints[:, 1], slot_stream.astype(jnp.int32)], axis=0
    )  # (3, G) field-major SMEM

    n_blocks = G // g_crops
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (g_crops, 8),
                (lambda i, *_: (i, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c, stack.shape[2], stack.shape[3]),
                # data-dependent frame select: the block's first slot's
                # stream id (scalar prefetch row 2) picks which frame's
                # pyramid stack this step sees
                (lambda i, ints_ref, gc=g_crops: (ints_ref[2, i * gc],
                                                  0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (g_crops, c, oh, ow),
            (lambda i, *_: (i, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _crop_kernel_flat, g_crops=g_crops, oh=oh, ow=ow, c=c,
    )
    vmem_bytes = (
        2 * int(np.prod(stack.shape[1:])) * stack.dtype.itemsize
        + 4 * g_crops * c * oh * ow * stack.dtype.itemsize
        + 2**22
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, c, oh, ow), stack.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 2**20), 120 * 2**20),
        ),
        interpret=interpret,
    )(ints3, scal8, stack)
    return out.transpose(0, 2, 3, 1).astype(jnp.float32)
