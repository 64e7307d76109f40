"""Letterbox preprocessing as XLA ops.

Re-creates the preprocessing the reference gets from ultralytics
(`data/augment.LetterBox` + `engine/predictor.preprocess`, entered via
/root/reference/yolo_multi_model.py:41,:173 — SURVEY.md D2):

  resize keeping aspect ratio into ``imgsz`` × ``imgsz``, pad the rest
  with gray 114 (centered, stride-32 aligned), BGR→RGB, /255, and cast
  to the compute dtype.

TPU-first differences from the reference path:
- the whole transform is jnp inside the jitted step — no cv2.resize on
  the host, no HWC→CHW transpose (we keep NHWC, the layout XLA:TPU
  prefers for convolutions);
- geometry (gain/pad) is computed once per static source resolution in
  Python (``letterbox_params``), so the traced function has zero
  data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LetterboxParams(NamedTuple):
    """Static letterbox geometry for a (src_h, src_w) -> size mapping."""

    gain: float  # scale factor applied to the source frame
    pad_x: float  # left padding in model-input pixels
    pad_y: float  # top padding in model-input pixels
    new_w: int  # resized (pre-pad) width
    new_h: int  # resized (pre-pad) height
    size: int  # final square model input size


def letterbox_params(src_h: int, src_w: int, size: int = 640) -> LetterboxParams:
    """Compute static letterbox geometry (python ints — trace-time only)."""
    gain = min(size / src_h, size / src_w)
    new_w = int(round(src_w * gain))
    new_h = int(round(src_h * gain))
    pad_x = (size - new_w) / 2.0
    pad_y = (size - new_h) / 2.0
    return LetterboxParams(gain, pad_x, pad_y, new_w, new_h, size)


def _interp_matrix(dst: int, src: int) -> jnp.ndarray:
    """(dst, src) bilinear interpolation matrix, half-pixel centers,
    edge-clamped — the cv2.INTER_LINEAR sampling scheme as a dense
    operator. Two such matmuls ARE the resize; on TPU this runs on the
    MXU an order of magnitude faster than the gather formulation."""
    import numpy as np

    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    lo = np.floor(pos)
    w_hi = np.clip(pos - lo, 0.0, 1.0)
    lo_c = np.clip(lo, 0, src - 1).astype(int)
    hi_c = np.clip(lo + 1, 0, src - 1).astype(int)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), lo_c] += 1.0 - w_hi
    m[np.arange(dst), hi_c] += w_hi
    return jnp.asarray(m)


def _decimation_stride(dst: int, src: int) -> tuple[int, int] | None:
    """If cv2.INTER_LINEAR sampling dst<-src is PURE DECIMATION —
    every output sample lands exactly on an input pixel with uniform
    stride — return (offset, stride), else None.

    This happens whenever src = k*dst for integer k (the half-pixel
    source position (y+0.5)k - 0.5 is integral iff k is odd... not
    quite: it is k*y + (k-1)/2, integral for odd k; for even k the
    fraction is exactly 0.5 and cv2 blends two pixels). Checked
    numerically so the rule never needs to be trusted."""
    import numpy as np

    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    lo = np.floor(pos)
    w_hi = pos - lo
    if not (np.abs(w_hi) < 1e-9).all():
        return None
    idx = np.clip(lo, 0, src - 1).astype(int)
    if dst == 1:
        return None
    strides = np.diff(idx)
    if (strides == strides[0]).all() and strides[0] > 0:
        return int(idx[0]), int(strides[0])
    return None


def _block_sel(dst: int, src: int):
    """For integer downscale factors src = s*dst, INTER_LINEAR output
    sample y draws only from input block [s*y, s*(y+1)) with weights
    CONSTANT across y — return that length-s weight vector (numpy), or
    None. Turns the resize into a reshape + tiny-K contraction that
    reads the frame once, sequentially (vs the (dst, src) dense
    operator's 500x redundant FLOPs, or strided slices that scalarize
    on TPU tiled layouts)."""
    import numpy as np

    if dst <= 0 or src % dst or src == dst == 1:
        return None
    s = src // dst
    pos = (np.arange(dst) + 0.5) * s - 0.5
    lo = np.floor(pos).astype(int)
    w_hi = pos - lo
    k_lo = lo - s * np.arange(dst)
    if not (k_lo == k_lo[0]).all() or not (np.abs(w_hi - w_hi[0]) < 1e-9).all():
        return None
    if k_lo[0] < 0 or k_lo[0] > s - 1:
        return None
    hi_needed = w_hi[0] > 1e-9
    if hi_needed and k_lo[0] + 1 > s - 1:
        return None
    sel = np.zeros((s,), np.float32)
    sel[k_lo[0]] = 1.0 - w_hi[0]
    if hi_needed:
        sel[k_lo[0] + 1] = w_hi[0]
    return sel


def resize_bilinear_matmul(
    x: jnp.ndarray, new_h: int, new_w: int, *, precision=None
) -> jnp.ndarray:
    """Bilinear resize as contractions (separable kernel).

    x: (..., H, W, C) float. Matches jax.image.resize(method='linear',
    antialias=False) / cv2.INTER_LINEAR sampling.

    Uses the dense (dst, src) interpolation-matrix contraction on the
    MXU for every geometry. Two cheaper-on-paper forms were measured
    SLOWER on the v5e at 1080p batch 32 and reverted (git history):
    - strided slices for pure-decimation factors: scalarized copies on
      HBM-tiled layouts, and the split op chain stops XLA fusing the
      BGR-flip/cast into the contraction;
    - block-selection einsums (reshape axis to (dst, s) and contract a
      length-s vector, 500x fewer FLOPs): lowered to multiply-reduce
      fusions with transposed output layouts plus ~1.7ms of relayout
      copies. The dense operator runs at ~130 TFLOP/s fused with the
      cast/flip — redundant FLOPs the MXU shrugs off.
    ``_block_sel`` is kept for ops/stem_fuse.py's analysis.
    """
    h, w = x.shape[-3], x.shape[-2]
    if new_h != h:
        ry = _interp_matrix(new_h, h).astype(x.dtype)
        x = jnp.einsum("yh,...hwc->...ywc", ry, x, precision=precision)
    if new_w != w:
        rx = _interp_matrix(new_w, w).astype(x.dtype)
        x = jnp.einsum("xw,...ywc->...yxc", rx, x, precision=precision)
    return x


def resize_bilinear_matmul_planar(
    x: jnp.ndarray, new_h: int, new_w: int, *, dtype=None
) -> jnp.ndarray:
    """Same contraction as :func:`resize_bilinear_matmul`, but computed
    CHANNEL-PLANAR: (B, H, W, C) -> transpose to (B, C, H, W) -> two
    clean (H, W)-minor einsums -> transpose back.

    On TPU the staged uint8 frame batch already lives in layout
    (0, 3, 1, 2) — B-major, channel-planar — so both transposes are
    free bitcasts, while the NHWC-form dense resize forced the dot
    emitter through a c=3 minor dim that pads sublanes 3/8 (the
    round-4 roofline audit's single largest line: the letterbox
    mega-fusion at 66 TF/s, 2551 us vs an 862 us bound at S=64).
    Bit-identical math: the interpolation matrices are the same;
    only the loop order changes."""
    if dtype is not None:
        x = x.astype(dtype if dtype == jnp.bfloat16 else jnp.float32)
    h, w = x.shape[-3], x.shape[-2]
    p = x.transpose(0, 3, 1, 2) if x.ndim == 4 else x.transpose(2, 0, 1)
    if new_h != h:
        ry = _interp_matrix(new_h, h).astype(p.dtype)
        p = jnp.einsum("yh,...hw->...yw", ry, p)
    if new_w != w:
        rx = _interp_matrix(new_w, w).astype(p.dtype)
        p = jnp.einsum("xw,...yw->...yx", rx, p)
    return p.transpose(0, 2, 3, 1) if x.ndim == 4 else p.transpose(1, 2, 0)


def letterbox(
    frame: jnp.ndarray,
    params: LetterboxParams,
    *,
    bgr_to_rgb: bool = True,
    dtype: jnp.dtype = jnp.float32,
    pad_value: float = 114.0,
    method: str = "matmul",  # "matmul" (MXU) | "gather" (jax.image)
) -> jnp.ndarray:
    """Letterbox one frame or a batch of frames.

    frame: (..., H, W, 3) uint8 (or float). Returns
    (..., size, size, 3) ``dtype`` in [0, 1], NHWC.
    """
    # uint8 pixel values are exact in bfloat16 (8-bit mantissa), so the
    # interpolation can run at the compute dtype directly
    x = frame.astype(dtype if dtype == jnp.bfloat16 else jnp.float32)

    batch_shape = x.shape[:-3]
    # cv2.INTER_LINEAR sampling for parity with ultralytics' LetterBox
    # (SURVEY.md D2); the matmul formulation keeps the hot path on the
    # MXU instead of a gather.
    if method == "matmul":
        resized = resize_bilinear_matmul(x, params.new_h, params.new_w)
    else:
        resized = jax.image.resize(
            x,
            (*batch_shape, params.new_h, params.new_w, 3),
            method="linear",
            antialias=False,
        )
    if bgr_to_rgb:
        # channel flip commutes with the h/w resize (exact); doing it
        # AFTER touches ~9x less data at 1080p->640 (the pre-resize
        # flip materialized a full-res copy — _prof_cfgtrace yolov7)
        resized = resized[..., ::-1]

    top = int(round(params.pad_y - 0.1))
    left = int(round(params.pad_x - 0.1))
    bottom = params.size - params.new_h - top
    right = params.size - params.new_w - left
    pad_width = [(0, 0)] * len(batch_shape) + [(top, bottom), (left, right), (0, 0)]
    padded = jnp.pad(resized, pad_width, constant_values=pad_value)
    return (padded / 255.0).astype(dtype)
