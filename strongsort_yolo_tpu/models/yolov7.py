"""YOLOv7 detector backend (SURVEY.md H8: "v7: E-ELAN + RepConv,
anchor-based" — BASELINE config #2's second detector).

Architecture per the YOLOv7 paper/yaml (base model):

- backbone: stacked E-ELAN computation blocks (4 parallel taps off a
  dual 1x1 stem, concat, 1x1 merge) with MP down-transitions
  (maxpool+1x1 ∥ 1x1+3x3/2, concat);
- head: SPPCSPC pyramid block, PAN top-down/bottom-up with ELAN-W
  (6-tap) blocks, RepConv pre-detect convs, anchor-based Detect at
  strides 8/16/32 with the v7 anchor priors.

RepConv is implemented in its training form (3x3 + 1x1 parallel
branches, each conv+BN) with ``fuse_repconv`` folding both into one
3x3 conv for inference — the reparameterization that porting
(SURVEY.md §7 hard part #4) must honor.

NHWC functional blocks; decode shares the v5 anchor-based formula
(sigmoid xy/wh transform) with v7's own anchor table.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models import common as C

Params = dict[str, Any]

V7_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


@dataclasses.dataclass(frozen=True)
class Yolov7Config:
    nc: int = 80
    strides: tuple[int, ...] = (8, 16, 32)
    task: str = "detect"

    @property
    def na(self) -> int:
        return 3


# --- blocks ----------------------------------------------------------------


def init_elan(key, c_in, c_mid, c_out, n_inner: int = 4, taps=(-1, -3, -5, -6)):
    """E-ELAN: two 1x1 stems + chain of 3x3 convs, concat tapped
    outputs, 1x1 merge. Backbone form: 4 inner convs, taps at every
    second conv + both stems."""
    ks = jax.random.split(key, n_inner + 3)
    return {
        "cv1": C.init_conv(ks[0], c_in, c_mid, 1),
        "cv2": C.init_conv(ks[1], c_in, c_mid, 1),
        "inner": [
            C.init_conv(ks[2 + i], c_mid, c_mid, 3) for i in range(n_inner)
        ],
        "merge": C.init_conv(
            ks[-1], c_mid * (2 + n_inner // 2), c_out, 1
        ),
        "_taps": None,  # backbone: concat stems + every 2nd inner
    }


def elan_apply(p, x):
    a = C.conv_apply(p["cv1"], x)
    b = C.conv_apply(p["cv2"], x)
    outs = [a, b]
    y = b
    for i, cp in enumerate(p["inner"]):
        y = C.conv_apply(cp, y)
        if i % 2 == 1:  # tap after every pair of 3x3 convs
            outs.append(y)
    return C.conv_apply(p["merge"], jnp.concatenate(outs[::-1], axis=-1))


def init_elan_w(key, c_in, c_mid, c_out):
    """ELAN-W (head form): taps after EVERY inner conv; inner convs
    halve to c_mid//2 after the first."""
    ks = jax.random.split(key, 7)
    half = c_mid // 2
    return {
        "cv1": C.init_conv(ks[0], c_in, c_mid, 1),
        "cv2": C.init_conv(ks[1], c_in, c_mid, 1),
        "inner": [
            C.init_conv(ks[2], c_mid, half, 3),
            C.init_conv(ks[3], half, half, 3),
            C.init_conv(ks[4], half, half, 3),
            C.init_conv(ks[5], half, half, 3),
        ],
        "merge": C.init_conv(ks[6], c_mid * 2 + half * 4, c_out, 1),
    }


def elan_w_apply(p, x):
    a = C.conv_apply(p["cv1"], x)
    b = C.conv_apply(p["cv2"], x)
    outs = [a, b]
    y = b
    for cp in p["inner"]:
        y = C.conv_apply(cp, y)
        outs.append(y)
    return C.conv_apply(p["merge"], jnp.concatenate(outs[::-1], axis=-1))


def init_mp(key, c_in, c_half):
    """MP down-transition: maxpool2+1x1 ∥ 1x1+3x3/2 -> concat (2*c_half)."""
    ks = jax.random.split(key, 3)
    return {
        "cv1": C.init_conv(ks[0], c_in, c_half, 1),
        "cv2": C.init_conv(ks[1], c_in, c_half, 1),
        "cv3": C.init_conv(ks[2], c_half, c_half, 3),
    }


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def mp_apply(p, x):
    a = C.conv_apply(p["cv1"], _maxpool2(x))
    b = C.conv_apply(p["cv3"], C.conv_apply(p["cv2"], x), stride=2)
    # conv path first, pooled path second — the official yolov7.yaml
    # Concat order ([-1, -3]: strided-conv output, then post-pool conv),
    # which the .pt porting map (porting._V7_IDX) relies on
    return jnp.concatenate([b, a], axis=-1)


def init_sppcspc(key, c_in, c_out):
    ks = jax.random.split(key, 7)
    c_ = c_out  # hidden = 2 * c_out * 0.5
    return {
        "cv1": C.init_conv(ks[0], c_in, c_, 1),
        "cv2": C.init_conv(ks[1], c_in, c_, 1),
        "cv3": C.init_conv(ks[2], c_, c_, 3),
        "cv4": C.init_conv(ks[3], c_, c_, 1),
        "cv5": C.init_conv(ks[4], 4 * c_, c_, 1),
        "cv6": C.init_conv(ks[5], c_, c_, 3),
        "cv7": C.init_conv(ks[6], 2 * c_, c_out, 1),
    }


def _maxpool_same(x, k):
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def sppcspc_apply(p, x):
    y = C.conv_apply(p["cv4"], C.conv_apply(p["cv3"], C.conv_apply(p["cv1"], x)))
    pools = [y, _maxpool_same(y, 5), _maxpool_same(y, 9), _maxpool_same(y, 13)]
    y = C.conv_apply(p["cv6"], C.conv_apply(p["cv5"], jnp.concatenate(pools, -1)))
    b = C.conv_apply(p["cv2"], x)
    return C.conv_apply(p["cv7"], jnp.concatenate([y, b], axis=-1))


def init_repconv(key, c_in, c_out):
    """RepConv training form: 3x3 conv+BN ∥ 1x1 conv+BN (identity BN
    branch omitted since c_in != c_out at every v7 use site)."""
    k1, k2 = jax.random.split(key)
    return {
        "dense": C.init_conv(k1, c_in, c_out, 3),
        "one": C.init_conv(k2, c_in, c_out, 1),
    }


def repconv_apply(p, x, *, stride: int = 1):
    if "fused" in p:
        return C.conv_apply(p["fused"], x, stride=stride)
    a = C.conv_apply(p["dense"], x, stride=stride, act=False)
    b = C.conv_apply(p["one"], x, stride=stride, act=False)
    return C.silu(a + b)


def fuse_repconv(p: Params, eps: float = 1e-3) -> Params:
    """Fold the 3x3 and (zero-padded) 1x1 branches into ONE 3x3 conv —
    the v7 deploy reparameterization."""
    dense = C.fuse_conv_bn(p["dense"], eps)
    one = C.fuse_conv_bn(p["one"], eps)
    w1 = jnp.pad(one["w"], ((1, 1), (1, 1), (0, 0), (0, 0)))
    return {"fused": {"w": dense["w"] + w1, "b": dense["b"] + one["b"]}}


# --- model -----------------------------------------------------------------


def init_yolov7(key: jax.Array, cfg: Yolov7Config = Yolov7Config()) -> Params:
    ks = jax.random.split(key, 32)
    p: Params = {
        "stem0": C.init_conv(ks[0], 3, 32, 3),
        "stem1": C.init_conv(ks[1], 32, 64, 3),
        "stem2": C.init_conv(ks[2], 64, 64, 3),
        "down2": C.init_conv(ks[3], 64, 128, 3),
        "elan2": init_elan(ks[4], 128, 64, 256),
        "mp3": init_mp(ks[5], 256, 128),
        "elan3": init_elan(ks[6], 256, 128, 512),  # P3 out 512
        "mp4": init_mp(ks[7], 512, 256),
        "elan4": init_elan(ks[8], 512, 256, 1024),  # P4 out 1024
        "mp5": init_mp(ks[9], 1024, 512),
        "elan5": init_elan(ks[10], 1024, 256, 1024),  # P5 out 1024
        # head
        "sppcspc": init_sppcspc(ks[11], 1024, 512),
        "lat4": C.init_conv(ks[12], 512, 256, 1),
        "route4": C.init_conv(ks[13], 1024, 256, 1),
        "elan_h4": init_elan_w(ks[14], 512, 256, 256),
        "lat3": C.init_conv(ks[15], 256, 128, 1),
        "route3": C.init_conv(ks[16], 512, 128, 1),
        "elan_h3": init_elan_w(ks[17], 256, 128, 128),  # P3 head 128
        "mp_h4": init_mp(ks[18], 128, 128),
        "elan_h4b": init_elan_w(ks[19], 512, 256, 256),  # P4 head 256
        "mp_h5": init_mp(ks[20], 256, 256),
        "elan_h5": init_elan_w(ks[21], 1024, 512, 512),  # P5 head 512
        "rep3": init_repconv(ks[22], 128, 256),
        "rep4": init_repconv(ks[23], 256, 512),
        "rep5": init_repconv(ks[24], 512, 1024),
        "detect": {
            "m": [
                C.init_conv2d_bias(ks[25], 256, cfg.na * (5 + cfg.nc), 1),
                C.init_conv2d_bias(ks[26], 512, cfg.na * (5 + cfg.nc), 1),
                C.init_conv2d_bias(ks[27], 1024, cfg.na * (5 + cfg.nc), 1),
            ]
        },
    }
    return p


def yolov7_apply(
    params: Params,
    x: jnp.ndarray,
    cfg: Yolov7Config = Yolov7Config(),
    *,
    compute_dtype=jnp.float32,
    packed_prefix: Params | None = None,
) -> dict[str, jnp.ndarray]:
    """-> {"boxes" (B, A, 4) xyxy input pixels, "scores" (B, A, nc)}.

    packed_prefix: precomputed ``ops.pack.pack_v7_prefix(params)`` —
    runs the full-res stem space-to-depth packed (exact weight
    re-indexing; see pack_v7_prefix) and rejoins the plain path at
    elan2's unpacked @/4 input.
    """
    p = params
    x = x.astype(compute_dtype)
    if packed_prefix is not None:
        pp = packed_prefix
        y = C.conv_apply(pp["stem6"], x, stride=2, pad=2)
        y = C.conv_apply(pp["stem1"], y, stride=2)
        y = C.conv_apply(pp["stem2"], y)
        y = C.conv_apply(pp["down2t"], y, pad=(1, 0))
    else:
        y = C.conv_apply(p["stem0"], x)
        y = C.conv_apply(p["stem1"], y, stride=2)
        y = C.conv_apply(p["stem2"], y)
        y = C.conv_apply(p["down2"], y, stride=2)
    y = elan_apply(p["elan2"], y)
    y = mp_apply(p["mp3"], y)
    p3 = elan_apply(p["elan3"], y)  # /8, 512
    y = mp_apply(p["mp4"], p3)
    p4 = elan_apply(p["elan4"], y)  # /16, 1024
    y = mp_apply(p["mp5"], p4)
    p5 = elan_apply(p["elan5"], y)  # /32, 1024

    spp = sppcspc_apply(p["sppcspc"], p5)  # 512
    up4 = C.upsample2x(C.conv_apply(p["lat4"], spp))  # 256
    r4 = C.conv_apply(p["route4"], p4)  # 256
    h4 = elan_w_apply(p["elan_h4"], jnp.concatenate([r4, up4], -1))  # 256
    up3 = C.upsample2x(C.conv_apply(p["lat3"], h4))  # 128
    r3 = C.conv_apply(p["route3"], p3)  # 128
    h3 = elan_w_apply(p["elan_h3"], jnp.concatenate([r3, up3], -1))  # 128
    d4 = mp_apply(p["mp_h4"], h3)  # 256
    h4b = elan_w_apply(p["elan_h4b"], jnp.concatenate([d4, h4], -1))  # 256
    d5 = mp_apply(p["mp_h5"], h4b)  # 512
    h5 = elan_w_apply(p["elan_h5"], jnp.concatenate([d5, spp], -1))  # 512

    feats = (
        repconv_apply(p["rep3"], h3),
        repconv_apply(p["rep4"], h4b),
        repconv_apply(p["rep5"], h5),
    )
    boxes_all, scores_all = [], []
    for i, f in enumerate(feats):
        n, h, w, _ = f.shape
        s = cfg.strides[i]
        raw = C.conv2d_bias_apply(p["detect"]["m"][i], f)
        # sigmoid in the compute dtype; cast to f32 ONLY the 4 box
        # channels (grid offsets up to 80 would eat bf16 mantissa) —
        # f32-casting the whole (n,h,w,3,85) tensor cost ~2 ms/step of
        # layout copies at S=16 (tools/prof/_prof_cfgtrace yolov7)
        sig = jax.nn.sigmoid(raw.reshape(n, h, w, cfg.na, 5 + cfg.nc))
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]
        anchor = jnp.asarray(V7_ANCHORS[i], jnp.float32)[None, None, None]
        xy = (sig[..., :2].astype(jnp.float32) * 2.0 - 0.5 + grid) * s
        wh = (sig[..., 2:4].astype(jnp.float32) * 2.0) ** 2 * anchor
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1).reshape(n, -1, 4)
        scores = (
            (sig[..., 4:5] * sig[..., 5:])
            .astype(jnp.float32)
            .reshape(n, -1, cfg.nc)
        )
        boxes_all.append(boxes)
        scores_all.append(scores)
    return {
        "boxes": jnp.concatenate(boxes_all, 1),
        "scores": jnp.concatenate(scores_all, 1),
    }


def fuse_yolov7(params: Params) -> Params:
    """Deploy form: RepConvs reparameterized, all BNs folded."""
    from strongsort_yolo_tpu.models.yolo import fuse_model

    p = dict(params)
    for k in ("rep3", "rep4", "rep5"):
        p[k] = fuse_repconv(p[k])
    return fuse_model(p)
