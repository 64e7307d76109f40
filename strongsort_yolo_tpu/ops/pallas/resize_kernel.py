"""Pure-decimation letterbox resize as a Pallas kernel.

** MEASURED NEGATIVE RESULT — NOT WIRED INTO THE PIPELINE. **
On the v5e the strided-row input DMA dominates: a PURE COPY with this
blocking (no compute at all) already costs 12.2 ms at S=32/1080p
(~5.5 GB/s — the DMA degenerates to per-row strided runs), while the
dense matmul resize reads the frame contiguously and measures 1.28 ms
in-step. Variants tried: bf16 selection dot, int8 MXU dot, xor-cast;
all ~12.4 ms. Kept (with its bit-exactness test) as the record of the
approach so future rounds don't re-walk it; see NOTES.md round-3
lessons. If revisited: the fix must keep HBM reads contiguous (e.g.
full-row blocks + in-VMEM sublane selection), not index-mapped strides.

Original design rationale:

The packed detect path feeds the model a letterbox-scale frame
(pipeline.model_forward). For the common video geometries the
cv2.INTER_LINEAR resize is PURE DECIMATION (1920x1080 -> 640x360
samples exactly every 3rd pixel — ops/letterbox._decimation_stride),
yet the dense matmul formulation that replaced it in round 1 computes
the full (new, src) interpolation contraction: ~7 GFLOP/frame of
99.7%-zero work, measured 1.28 ms of the 11.1 ms S=32 step (round-3
device profile). XLA alternatives were measured worse (strided slices
scalarize, block-selection einsums relayout — NOTES.md); this kernel
was the attempted TPU-native answer:

- ROW decimation is free: the frame is viewed as
  (B, new_h, sy, W*3) — a layout-preserving reshape — and the kernel's
  BlockSpec index map picks sub-row ``off_y`` of every row group, so
  the strided HBM reads are just block DMAs.
- COLUMN decimation is a constant banded SELECTION MATMUL on the MXU:
  384 output lanes (128 pixels x 3 channels) consume exactly
  384*sx input lanes, so lane-tiles of the selection matrix repeat
  with no t-dependence and the whole matrix is a small VMEM-resident
  constant. ~sx*0.77 GFLOP/frame at 1080p instead of 7.

Output is BIT-EXACT vs ops/letterbox.resize_bilinear_matmul for these
geometries (both sample the same single-tap pixels; uint8 values are
exact in bfloat16) — asserted in tests/test_letterbox.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strongsort_yolo_tpu.ops.letterbox import _decimation_stride

# output lanes per grid step: 128 pixels x 3 channels
_OUT_BLOCK = 384


def decimation_plan(src_h: int, src_w: int, new_h: int, new_w: int):
    """(off_y, sy, off_x, sx) if the resize is pure decimation AND the
    kernel's blocking applies, else None."""
    dec_y = _decimation_stride(new_h, src_h)
    dec_x = _decimation_stride(new_w, src_w)
    if dec_y is None or dec_x is None:
        return None
    off_y, sy = dec_y
    off_x, sx = dec_x
    if src_h != new_h * sy:  # row-group view needs an exact split
        return None
    if (new_w * 3) % _OUT_BLOCK or (src_w * 3) % (_OUT_BLOCK * sx):
        return None
    return off_y, sy, off_x, sx


def _select_matrix(sx: int, off_x: int, dtype) -> jnp.ndarray:
    """(384*sx, 384) one-hot column-selection matrix: output lane
    m = 3*j + c (pixel j, channel c) reads input lane
    3*sx*j + 3*off_x + c."""
    m = jnp.arange(_OUT_BLOCK)
    j, c = m // 3, m % 3
    src = 3 * sx * j + 3 * off_x + c  # (384,)
    rows = jnp.arange(_OUT_BLOCK * sx)[:, None]
    return (rows == src[None, :]).astype(dtype)


def _kernel(x_ref, s_ref, o_ref):
    # x_ref: (1, R, 384*sx) uint8; s_ref: (384*sx, 384); o: (1, R, 384)
    # Mosaic has no direct uint8 -> bfloat16 cast; hop through int32
    x = x_ref[0].astype(jnp.int32).astype(s_ref.dtype)
    o_ref[0] = jax.lax.dot(x, s_ref[:], preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _kernel_contig(x_ref, s_ref, o_ref, *, off_y, sy, rows_out, n_q,
                   in_block):
    """Round-5 revisit (the fix the round-3 postmortem prescribes):
    read the WHOLE frame contiguously, select rows IN-VMEM, then the
    banded column-selection dots. x_ref: (1, H, W*3) u8 — one full
    frame, contiguous HBM DMA; s_ref: (in_block, 384) selection
    constant; o_ref: (1, rows_out, new_w*3)."""
    # static per-output-row reads off the VMEM ref (NOT an index-mapped
    # strided HBM block — that was the 5.5 GB/s failure); each is a
    # (W*3,) u8 lane vector at a static sublane offset
    rows = [x_ref[0, off_y + sy * r] for r in range(rows_out)]
    v = jnp.stack(rows)
    # cast AFTER the sy-fold row cut (3x less data); no direct u8->bf16
    v = v.astype(jnp.int32).astype(o_ref.dtype)
    for q in range(n_q):
        o_ref[0, :, q * _OUT_BLOCK:(q + 1) * _OUT_BLOCK] = jax.lax.dot(
            v[:, q * in_block:(q + 1) * in_block],
            s_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("new_h", "new_w", "dtype",
                                             "interpret"))
def decimate_resize_contig(
    frames_u8: jnp.ndarray,  # (B, src_h, src_w, 3) uint8
    new_h: int,
    new_w: int,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Contiguous-read variant of :func:`decimate_resize` -> (B, new_h,
    new_w, 3) ``dtype``, raw value range, bit-exact vs the dense matmul
    resize for pure-decimation geometries (same single-tap pixels).

    Differences vs the measured-negative round-3 kernel: the input
    block is one FULL frame (one contiguous multi-MB DMA per grid step
    instead of 1152-byte strided runs at 5.5 GB/s), row decimation is
    static sublane reads off the VMEM ref, and the column selection
    stays the banded one-hot MXU dot. HBM cost = read the u8 frame once
    + write the (new_h, new_w, 3) output once — the letterbox
    mega-fusion's roofline, without the dense (dst, src) contraction
    FLOPs (VERDICT r4 #2)."""
    b, src_h, src_w, _c = frames_u8.shape
    plan = decimation_plan(src_h, src_w, new_h, new_w)
    assert plan is not None, (src_h, src_w, new_h, new_w)
    off_y, sy, off_x, sx = plan

    x = frames_u8.reshape(b, src_h, src_w * 3)
    sel = _select_matrix(sx, off_x, dtype)
    in_block = _OUT_BLOCK * sx
    n_q = (new_w * 3) // _OUT_BLOCK
    kernel = functools.partial(
        _kernel_contig, off_y=off_y, sy=sy, rows_out=new_h, n_q=n_q,
        in_block=in_block,
    )
    vmem = (2 * src_h * src_w * 3        # in (u8, double-buffered)
            + 4 * new_h * src_w * 3 * 2  # row-cut value + dot operands
            + 4 * new_h * new_w * 3 * 2  # out
            + 2 ** 22)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, src_h, src_w * 3),
                lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (in_block, _OUT_BLOCK),
                lambda bi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, new_h, new_w * 3),
            lambda bi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, new_h, new_w * 3), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem, 32 * 2**20), 120 * 2**20),
        ),
        interpret=interpret,
    )(x, sel)
    return out.reshape(b, new_h, new_w, 3)


def _kernel_planar(x_ref, s_ref, o_ref, *, off_y, sy, rows_out, nc):
    """Planar variant: x_ref (1, C, H, W) u8 — one frame in the
    layout the staged batch already has on TPU ((0,3,1,2): B-major,
    channel-planar), so the input DMA needs NO relayout copy. Row
    decimation = static sublane reads per channel; column decimation =
    one one-hot MXU dot per channel."""
    for c in range(nc):
        rows = [x_ref[0, c, off_y + sy * r] for r in range(rows_out)]
        v = jnp.stack(rows).astype(jnp.int32).astype(o_ref.dtype)
        o_ref[0, c] = jax.lax.dot(
            v, s_ref[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("new_h", "new_w", "dtype",
                                             "interpret"))
def decimate_resize_planar(
    frames_u8: jnp.ndarray,  # (B, src_h, src_w, 3) uint8
    new_h: int,
    new_w: int,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channel-planar variant of :func:`decimate_resize_contig`
    -> (B, new_h, new_w, 3) ``dtype``, raw range, bit-exact vs the
    dense matmul resize for pure-decimation geometries.

    The round-5 contiguous-read kernel measured 1.34 ms of kernel time
    but XLA guarded it with ~3.5 ms of layout copies: its row-major
    (B, H, W*3) operand interleaves channels, while the staged frame
    batch lives in layout (0, 3, 1, 2) — B-major, channel-PLANAR. This
    kernel takes the planar view (``transpose(0, 3, 1, 2)`` — a pure
    bitcast of the existing bytes) so the operand needs no copy, and
    emits planar output whose ``transpose(0, 2, 3, 1)`` back is again
    layout-free for a (0, 3, 1, 2)-consumer."""
    b, src_h, src_w, nc = frames_u8.shape
    plan = decimation_plan(src_h, src_w, new_h, new_w)
    assert plan is not None, (src_h, src_w, new_h, new_w)
    off_y, sy, off_x, sx = plan

    x = frames_u8.transpose(0, 3, 1, 2)  # (B, C, H, W): bitcast on TPU
    # (new_w, ) output cols read input col sx*j + off_x: one-hot
    j = jnp.arange(new_w)
    src = sx * j + off_x
    sel = (jnp.arange(src_w)[:, None] == src[None, :]).astype(dtype)

    kernel = functools.partial(
        _kernel_planar, off_y=off_y, sy=sy, rows_out=new_h, nc=nc,
    )
    vmem = (2 * src_h * src_w * nc      # in (u8, double-buffered)
            + 4 * new_h * src_w * 4     # row-cut ints + value
            + 4 * new_h * new_w * nc * 2
            + 2 ** 22)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, nc, src_h, src_w),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (src_w, new_w),
                lambda bi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nc, new_h, new_w),
            lambda bi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nc, new_h, new_w), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem, 32 * 2**20), 120 * 2**20),
        ),
        interpret=interpret,
    )(x, sel)
    return out.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("new_h", "new_w", "dtype",
                                             "interpret"))
def decimate_resize(
    frames_u8: jnp.ndarray,  # (B, src_h, src_w, 3) uint8 (or any int/float)
    new_h: int,
    new_w: int,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, new_h, new_w, 3) ``dtype``, raw value range. Caller must
    have checked ``decimation_plan`` is not None."""
    b, src_h, src_w, _c = frames_u8.shape
    plan = decimation_plan(src_h, src_w, new_h, new_w)
    assert plan is not None, (src_h, src_w, new_h, new_w)
    off_y, sy, off_x, sx = plan

    # the sy row-group dim folds into the lane axis: sub-row off_y of
    # row group r occupies lane block [off_y*src_w*3, (off_y+1)*src_w*3)
    # — an integer number of in_blocks (checked by decimation_plan), so
    # the strided row selection is just a block-index offset
    x = frames_u8.reshape(b, new_h, sy * src_w * 3)
    sel = _select_matrix(sx, off_x, dtype)

    # full row dim per block: uint8 sublane tiling wants 32-row
    # multiples, which new_h generally isn't — "equal to the overall
    # dim" is always legal, and one (new_h, 1152) u8 block is ~400 KB
    rows = new_h
    in_block = _OUT_BLOCK * sx
    w_off = off_y * (src_w * 3) // in_block
    grid = (b, new_h // rows, (new_w * 3) // _OUT_BLOCK)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, in_block),
                lambda bi, r, w: (bi, r, w_off + w),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (in_block, _OUT_BLOCK),
                lambda bi, r, w: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, _OUT_BLOCK),
            lambda bi, r, w: (bi, r, w),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, new_h, new_w * 3), dtype),
        interpret=interpret,
    )(x, sel)
    return out.reshape(b, new_h, new_w, 3)
