"""Space-to-depth packed execution for the high-resolution CNN prefix.

Why this exists (TPU hardware, not reference translation): the early
YOLO stages run 3x3/1x1 convs at 160x160/80x80 with 16-64 channels.
On the MXU (128x128 systolic array) such small channel counts leave
most lanes idle, and XLA falls back to spatially-tiled conv layouts
with layout-conversion copies around every op — profiling the v8n
forward at batch 32 showed the 160x160 stage alone running at
~2 TFLOP/s (<1% of v5e bf16 peak) with ~25% of model time in pure
`copy` HLOs.

The fix is the classic TPU space-to-depth transform (used by MLPerf
ResNet TPU submissions): run the prefix at HALF the spatial resolution
with 4x the channels. Every conv's weights are re-indexed EXACTLY —
same math, same outputs (up to bf16 summation order) — so pretrained
checkpoints work unchanged:

    x' [I, J, c*4 + oy*2 + ox] = x[2I + oy, 2J + ox, c]

The (channel-major, position-minor) packing order means channel
splits/concats of whole feature maps (C2f/C3k2 blocks) map to plain
splits/concats of packed channels — block code runs unchanged, only
the conv weights are transformed.

Weight transform (3x3 'same' conv, stride s in {1, 2}): a packed
output position (py, px) of packed-output pixel (I, J) is original
pixel (s2I + ... ). Solving the index algebra, the packed conv is
again a 3x3 'same' conv with stride s over packed tensors, with

    W'[B, Bx, c*4 + oy*2+ox, co*4 + py*2+px] = W[dy, dx, c, co]
        where dy = 2(B-1) + oy + 1 - s*py   (taken when 0 <= dy <= 2,
              dx = 2(Bx-1) + ox + 1 - s*px   else the tap is zero)

1x1 convs become block-structured 4Cx4Co pointwise convs (W ⊗ I4 in
the packing order). Biases/BN vectors repeat 4x per channel.

Everything here is shape-static jnp; the transforms are a few
microseconds of device work per step on <1 MB weight tensors, so they
run inside the jitted step and the parameter pytree (porting,
training, checkpointing) never changes layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from typing import Any

Params = dict[str, Any]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), channel-major packing:
    out[..., I, J, c*4 + oy*2 + ox] = x[..., 2I+oy, 2J+ox, c]."""
    *b, h, w, c = x.shape
    x = x.reshape(*b, h // 2, 2, w // 2, 2, c)
    # (..., H/2, W/2, C, oy, ox)
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 1, nd - 4, nd - 2)
    x = x.transpose(perm)
    return x.reshape(*b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*b, h, w, c, 2, 2)
    # -> (..., H, oy, W, ox, C)
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 2, nd - 4, nd - 1, nd - 3)
    x = x.transpose(perm)
    return x.reshape(*b, h * 2, w * 2, c)


def _pack_maps(stride: int) -> np.ndarray:
    """(3, 2, 2) -> original dy for packed tap B, input sub-pos oy,
    output sub-pos py; -1 where the tap is zero."""
    m = np.full((3, 2, 2), -1, np.int64)
    for B in range(3):
        for oy in range(2):
            for py in range(2):
                dy = 2 * (B - 1) + oy + 1 - stride * py
                if 0 <= dy <= 2:
                    m[B, oy, py] = dy
    return m


def pack_conv3_weight(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(3, 3, ci, co) -> (3, 3, 4ci, 4co) exact packed-space weights
    for a 'same'-padded 3x3 conv of stride 1 or 2.

    One gather + mask-multiply over a trace-time-constant index map,
    so the transform costs ~nothing inside the jitted step."""
    assert w.shape[0] == 3 and w.shape[1] == 3, w.shape
    assert stride in (1, 2)
    ci, co = w.shape[2], w.shape[3]
    my = _pack_maps(stride)
    tap = np.zeros((3, 3, 4, 4), np.int64)
    valid = np.zeros((3, 3, 4, 4), np.float32)
    for B in range(3):
        for Bx in range(3):
            for oy in range(2):
                for ox in range(2):
                    for py in range(2):
                        for px in range(2):
                            dy, dx = my[B, oy, py], my[Bx, ox, px]
                            if dy >= 0 and dx >= 0:
                                tap[B, Bx, oy * 2 + ox, py * 2 + px] = dy * 3 + dx
                                valid[B, Bx, oy * 2 + ox, py * 2 + px] = 1.0
    w9 = w.reshape(9, ci, co)
    g = w9[jnp.asarray(tap)]  # (3, 3, 4, 4, ci, co)
    g = g * jnp.asarray(valid, w.dtype)[..., None, None]
    g = g.transpose(0, 1, 4, 2, 5, 3)  # (B, Bx, ci, pi, co, po)
    return g.reshape(3, 3, 4 * ci, 4 * co)


def pack_pointwise_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, ci, co) -> (1, 1, 4ci, 4co): apply W independently at
    each of the 4 packed positions (W ⊗ I4 in packing order)."""
    assert w.shape[0] == 1 and w.shape[1] == 1, w.shape
    ci, co = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    out = w[0, 0][:, None, :, None] * eye[None, :, None, :]
    return out.reshape(1, 1, 4 * ci, 4 * co)


def pack_channel_vector(v: jnp.ndarray) -> jnp.ndarray:
    """(co,) bias/BN vector -> (4co,) in packing order (repeat 4x)."""
    return jnp.repeat(v, 4)


def pack_conv_params(p: Params, *, stride: int = 1) -> Params:
    """Pack one conv param dict (fused 'w'/'b' or conv+BN form)."""
    w = p["w"]
    if w.shape[0] == 1:
        pw = pack_pointwise_weight(w)
    elif w.shape[0] == 3:
        pw = pack_conv3_weight(w, stride)
    else:  # pragma: no cover - no other kernel sizes in the packed prefix
        raise ValueError(f"cannot pack kernel size {w.shape[0]}")
    out = {"w": pw}
    for key in ("b", "bn_scale", "bn_bias", "bn_mean", "bn_var"):
        if key in p:
            out[key] = pack_channel_vector(p[key])
    return out


def _pack_block(node: Any, *, stride_keys: dict[int, int] | None = None) -> Any:
    """Recursively pack every conv dict in a block pytree (all convs in
    CSP blocks are stride 1)."""
    if isinstance(node, dict):
        if "w" in node and node["w"].ndim == 4:
            return pack_conv_params(node, stride=1)
        return {k: _pack_block(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_pack_block(v) for v in node]
    return node


def fuse_stem_s2d(p: Params, *, stride: int = 2) -> Params:
    """Fold the input space-to-depth INTO the stem conv.

    The packed stem is a 3x3/s conv over ``space_to_depth(x)``; by the
    same index algebra as :func:`pack_conv3_weight` that composition is
    exactly ONE 6x6 conv of stride 2s on the raw (unpacked) frame:

        conv3x3_s(s2d(x), W') == conv6x6_s(2s)_pad2(x, W'')
        W''[2B+oy, 2Bx+ox, c, q] = W'[B, Bx, c*4 + oy*2 + ox, q]

    (s=2 for the v8/v11 stem -> apply stride=4; s=1 for the v7 stem0
    -> apply stride=2; pad=2 either way.)

    On TPU ``space_to_depth`` lowers to a transpose (a pure HBM copy of
    the whole frame); this removes it from the hot path entirely while
    keeping the packed prefix's MXU-friendly 4x channels.
    """
    w = p["w"]
    assert w.shape[0] == 3 and w.shape[1] == 3, w.shape
    ci, co = w.shape[2], w.shape[3]
    wp = pack_conv3_weight(w, stride=stride)     # (3, 3, 4ci, 4co)
    wp = wp.reshape(3, 3, ci, 2, 2, 4 * co)      # [B, Bx, c, oy, ox, q]
    wp = wp.transpose(0, 3, 1, 4, 2, 5)          # [B, oy, Bx, ox, c, q]
    out = {"w": wp.reshape(6, 6, ci, 4 * co)}
    for key in ("b", "bn_scale", "bn_bias", "bn_mean", "bn_var"):
        if key in p:
            out[key] = pack_channel_vector(p[key])
    return out


def pack_transition_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) stride-2 'same' conv -> (2, 2, 4ci, co): consume
    a PACKED input and produce the UNPACKED stride-2 output directly
    (the packed->unpacked hand-off at a downsample layer).

    Index algebra: output (i, j) of the original conv reads original
    rows 2i-1..2i+1, which live in packed rows {i-1, i}:

        W'[u, v, c*4 + oy*2 + ox, co] = W[dy, dx, c, co]
        dy = 2u + oy - 1   (valid when 0 <= dy <= 2; (u,oy)=(0,0) is a
                            zero tap), dx likewise from (v, ox)

    Apply as a 2x2 conv, stride 1, padding (1, 0) on both spatial
    axes, over the packed tensor.
    """
    assert w.shape[0] == 3 and w.shape[1] == 3, w.shape
    ci, co = w.shape[2], w.shape[3]
    tap = np.zeros((2, 2, 4, 1), np.int64)
    valid = np.zeros((2, 2, 4, 1), np.float32)
    for u in range(2):
        for v in range(2):
            for oy in range(2):
                for ox in range(2):
                    dy = 2 * u + oy - 1
                    dx = 2 * v + ox - 1
                    if 0 <= dy <= 2 and 0 <= dx <= 2:
                        tap[u, v, oy * 2 + ox, 0] = dy * 3 + dx
                        valid[u, v, oy * 2 + ox, 0] = 1.0
    w9 = w.reshape(9, ci, co)
    g = w9[jnp.asarray(tap[..., 0])]  # (2, 2, 4, ci, co)
    g = g * jnp.asarray(valid, w.dtype)[..., None]
    g = g.transpose(0, 1, 3, 2, 4)  # (u, v, ci, pos, co)
    return g.reshape(2, 2, 4 * ci, co)


def pack_transition_params(p: Params) -> Params:
    """Transition form of a stride-2 conv param dict (channel vectors
    are NOT packed: the output is unpacked)."""
    out = {"w": pack_transition_weight(p["w"])}
    for key in ("b", "bn_scale", "bn_bias", "bn_mean", "bn_var"):
        if key in p:
            out[key] = p[key]
    return out


def pack_p3_path(params: Params, cfg) -> Params | None:
    """Packed-space params for the P3-resolution neck/head path.

    The backbone's packed prefix ends at P3 (80x80 for 640 input),
    but the PAN neck's td2 stage and the P3 head towers run at the
    same MXU-starved 80x80/32-96-channel shapes — profiling showed
    their unfused SiLU epilogues among the most expensive HLOs of the
    batched step. This keeps P3 packed end-to-end: td2 and the level-0
    detect towers run at 40x40 with 4x channels; ``down3``/``bu1_conv``
    consume the packed tensor via the transition form; the nearest
    upsample2x(t4) in packed space is a plain channel 4x-repeat.

    v8-family detect only (v11's depthwise cls towers would need a
    grouped-conv pack; seg/pose extra branches keep the plain path).
    Returns None when not applicable.

    MEASUREMENT NOTE (v5e, S=32 batched step): net NEGATIVE — the td2
    epilogue savings were outweighed by the packed-space glue
    (``repeat4`` lowered as a 530us channel-expand copy, the head
    outputs' depth_to_space grew to 770us at 4x channels, and the
    packed 1x1 out-convs ran slower than the unpacked 80x80 ones).
    12.2 -> 14.4 ms/step. Kept as an exact, tested transform for
    hardware where the trade flips; the pipeline does NOT enable it
    (pipeline.py passes packed_p3=None).
    """
    if cfg.family != "v8" or cfg.task != "detect":
        return None
    det = params["detect"]
    return {
        "down3t": pack_transition_params(params["backbone"]["down3"]),
        "td2": _pack_block(params["neck"]["td2"]),
        "bu1t": pack_transition_params(params["neck"]["bu1_conv"]),
        "box0": _pack_block(det["box"][0]),
        "cls0": _pack_block(det["cls"][0]),
    }


def repeat4(x: jnp.ndarray) -> jnp.ndarray:
    """Packed-space nearest upsample2x: packed(up2x(z)) at the same
    spatial dims as z is just each channel repeated 4x (all four
    packed positions of an output 2x2 share the source pixel)."""
    return jnp.repeat(x, 4, axis=-1)


def pack_stem7_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, ci, co) stride-2 'same' (pad 3) conv -> (4, 4, 4ci, co):
    consume a :func:`space_to_depth`-packed input and emit the
    UNPACKED stride-2 output directly (transition form of a 7x7/2
    stem — OSNet's, models/osnet.py).

    Index algebra: output row i of the original conv reads original
    rows 2i-3..2i+3, which live in packed rows i-2..i+1:

        W'[u, v, c*4 + oy*2 + ox, co] = W[2u + oy - 1, 2v + ox - 1, c, co]
        (zero tap where the original index leaves 0..6)

    Apply as a 4x4 conv, stride 1, padding (2, 1) on both spatial
    axes, over the packed tensor.

    Why: the raw OSNet stem is a 3-channel 7x7 conv on (M, 128, 64, 3)
    crops — MXU-starved (3 of 128 lanes) and preceded by a measured
    ~460us/dispatch layout copy of the crop tensor at S=16 (NOTES.md
    perf backlog). The packed form runs on (M, 64, 32, 12) crops that
    ops/crops.crop_and_resize_packed emits directly from its resize
    einsums, so the unpacked crop tensor never exists.
    """
    assert w.shape[0] == 7 and w.shape[1] == 7, w.shape
    ci, co = w.shape[2], w.shape[3]
    tap = np.zeros((4, 4, 4), np.int64)
    valid = np.zeros((4, 4, 4), np.float32)
    for u in range(4):
        for v in range(4):
            for oy in range(2):
                for ox in range(2):
                    dy = 2 * u + oy - 1
                    dx = 2 * v + ox - 1
                    if 0 <= dy <= 6 and 0 <= dx <= 6:
                        tap[u, v, oy * 2 + ox] = dy * 7 + dx
                        valid[u, v, oy * 2 + ox] = 1.0
    w49 = w.reshape(49, ci, co)
    g = w49[jnp.asarray(tap)]  # (4, 4, 4, ci, co)
    g = g * jnp.asarray(valid, w.dtype)[..., None, None]
    g = g.transpose(0, 1, 3, 2, 4)  # (u, v, ci, pos, co)
    return g.reshape(4, 4, 4 * ci, co)


def pack_v7_prefix(p: Params) -> Params:
    """Pack the yolov7 stem: the layers running at the full 640/320
    planes with 32-64 channels, where the round-3 device profile shows
    XLA spending ~620 us/frame on pure layout-conversion copies of the
    640x640x32 tensor alone (NOTES.md).

    Original: stem0 3->32 k3 s1 @640, stem1 32->64 k3 s2, stem2 64->64
    k3 s1 @320, down2 64->128 k3 s2 -> @160. Packed: one 6x6/s2 conv
    on the raw letterboxed frame (s2d folded into stem0), stem1/stem2
    at half spatial with 4x channels, and down2 in transition form
    consuming the packed tensor and emitting the UNPACKED @160 output
    — elan2 onward runs unchanged. Exact re-indexing, same math.
    """
    return {
        "stem6": fuse_stem_s2d(p["stem0"], stride=1),
        "stem1": pack_conv_params(p["stem1"], stride=2),
        "stem2": pack_conv_params(p["stem2"], stride=1),
        "down2t": pack_transition_params(p["down2"]),
    }


def pack_backbone_prefix(bb: Params) -> Params:
    """Pack the stem..stage2 prefix of a v8/v11 backbone param dict.

    Returns packed copies of stem/down1/stage1/down2/stage2 — the
    layers that run at 160x160/80x80 original resolution where the
    MXU-starved shapes live. (down/stem convs are stride 2; every conv
    inside the CSP stage blocks is stride 1.) The stem is emitted as
    ``stem6`` — the s2d-fused 6x6/s4 form consuming the raw frame
    (:func:`fuse_stem_s2d`), so no explicit space_to_depth runs.
    """
    return {
        "stem6": fuse_stem_s2d(bb["stem"]),
        "down1": pack_conv_params(bb["down1"], stride=2),
        "stage1": _pack_block(bb["stage1"]),
        "down2": pack_conv_params(bb["down2"], stride=2),
        "stage2": _pack_block(bb["stage2"]),
    }
