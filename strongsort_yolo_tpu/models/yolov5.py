"""YOLOv5 detector backend (SURVEY.md H8; BASELINE config #2).

The reference's commented model alternates include ``yolov5n.pt``
(/root/reference/yolo_multi_model.py:15). Two head variants exist in
the wild and both are provided:

- ``v5``  — the classic anchor-based Detect: per level one 1x1 conv to
  ``3 * (5 + nc)`` channels, decoded with the COCO anchor priors
  (sigmoid xy/wh transform, obj * cls scores);
- ``v5u`` — the ultralytics re-release: same C3 backbone + v5 PAN neck
  but the anchor-free DFL head of v8 (what ``YOLO('yolov5n.pt')``
  actually loads in the reference era).

Layout: stem 6x6/2 conv, C3 stages (3-6-9-3 depth base), SPPF; neck
with pre-upsample 1x1 convs (unlike v8's). NHWC functional blocks from
models/common.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models import common as C
from strongsort_yolo_tpu.models.yolo import _branch_apply, _init_branch

Params = dict[str, Any]

V5_SCALES = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}

# COCO anchor priors, (w, h) pixels at 640, per level P3/P4/P5
V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


@dataclasses.dataclass(frozen=True)
class Yolov5Config:
    scale: str = "n"
    nc: int = 80
    anchor_free: bool = False  # True = "u" variant (v8 DFL head)
    reg_max: int = 16
    strides: tuple[int, ...] = (8, 16, 32)
    task: str = "detect"  # v5 backend is detection-only

    def ch(self, c: int) -> int:
        _, w = V5_SCALES[self.scale]
        return max(int(round(c * w / 8)) * 8, 8)

    def depth(self, n: int) -> int:
        d, _ = V5_SCALES[self.scale]
        return max(round(n * d), 1)

    @property
    def na(self) -> int:
        return len(V5_ANCHORS[0])

    @property
    def head_ch(self):
        return (self.ch(256), self.ch(512), self.ch(1024))


def build_v5(name: str) -> Yolov5Config:
    """'yolov5n' / 'yolov5su' etc. -> config."""
    base = name.lower().removesuffix(".pt").removeprefix("yolov5")
    anchor_free = base.endswith("u")
    scale = base.removesuffix("u")
    if scale not in "nsmlx" or len(scale) != 1:
        raise ValueError(f"unknown yolov5 scale: {name}")
    return Yolov5Config(scale=scale, anchor_free=anchor_free)


def init_yolov5(key: jax.Array, cfg: Yolov5Config) -> Params:
    ch = cfg.ch
    d = cfg.depth
    ks = jax.random.split(key, 24)
    p: Params = {
        "stem": C.init_conv(ks[0], 3, ch(64), 6),
        "down1": C.init_conv(ks[1], ch(64), ch(128), 3),
        "stage1": C.init_c3(ks[2], ch(128), ch(128), d(3)),
        "down2": C.init_conv(ks[3], ch(128), ch(256), 3),
        "stage2": C.init_c3(ks[4], ch(256), ch(256), d(6)),
        "down3": C.init_conv(ks[5], ch(256), ch(512), 3),
        "stage3": C.init_c3(ks[6], ch(512), ch(512), d(9)),
        "down4": C.init_conv(ks[7], ch(512), ch(1024), 3),
        "stage4": C.init_c3(ks[8], ch(1024), ch(1024), d(3)),
        "sppf": C.init_sppf(ks[9], ch(1024), ch(1024)),
        # neck
        "lat5": C.init_conv(ks[10], ch(1024), ch(512), 1),
        "td1": C.init_c3(ks[11], ch(1024), ch(512), d(3)),
        "lat4": C.init_conv(ks[12], ch(512), ch(256), 1),
        "td2": C.init_c3(ks[13], ch(512), ch(256), d(3)),
        "bu1_conv": C.init_conv(ks[14], ch(256), ch(256), 3),
        "bu1": C.init_c3(ks[15], ch(512), ch(512), d(3)),
        "bu2_conv": C.init_conv(ks[16], ch(512), ch(512), 3),
        "bu2": C.init_c3(ks[17], ch(1024), ch(1024), d(3)),
    }
    hc = cfg.head_ch
    if cfg.anchor_free:
        c2 = max(16, hc[0] // 4, cfg.reg_max * 4)
        c3 = max(hc[0], min(cfg.nc, 100))
        p["detect"] = {
            "box": [
                _init_branch(ks[18 + i], hc[i], c2, 4 * cfg.reg_max)
                for i in range(3)
            ],
            "cls": [
                _init_branch(ks[21 + i], hc[i], c3, cfg.nc)
                for i in range(3)
            ],
        }
    else:
        no = cfg.na * (5 + cfg.nc)
        p["detect"] = {
            "m": [
                C.init_conv2d_bias(ks[18 + i], hc[i], no, 1)
                for i in range(3)
            ]
        }
    return p


def yolov5_features(p: Params, x: jnp.ndarray, cfg: Yolov5Config):
    """Backbone + neck -> (n3, n4, n5)."""
    x = C.conv_apply(p["stem"], x, stride=2, pad=2)  # 6x6/2 p2 stem
    x = C.conv_apply(p["down1"], x, stride=2)
    x = C.c3_apply(p["stage1"], x, shortcut=True)
    x = C.conv_apply(p["down2"], x, stride=2)
    p3 = C.c3_apply(p["stage2"], x, shortcut=True)
    x = C.conv_apply(p["down3"], p3, stride=2)
    p4 = C.c3_apply(p["stage3"], x, shortcut=True)
    x = C.conv_apply(p["down4"], p4, stride=2)
    x = C.c3_apply(p["stage4"], x, shortcut=True)
    p5 = C.sppf_apply(p["sppf"], x)

    l5 = C.conv_apply(p["lat5"], p5)
    x = jnp.concatenate([C.upsample2x(l5), p4], axis=-1)
    t4 = C.c3_apply(p["td1"], x, shortcut=False)
    l4 = C.conv_apply(p["lat4"], t4)
    x = jnp.concatenate([C.upsample2x(l4), p3], axis=-1)
    n3 = C.c3_apply(p["td2"], x, shortcut=False)
    x = jnp.concatenate([C.conv_apply(p["bu1_conv"], n3, stride=2), l4], -1)
    n4 = C.c3_apply(p["bu1"], x, shortcut=False)
    x = jnp.concatenate([C.conv_apply(p["bu2_conv"], n4, stride=2), l5], -1)
    n5 = C.c3_apply(p["bu2"], x, shortcut=False)
    return n3, n4, n5


def yolov5_apply(
    params: Params,
    x: jnp.ndarray,
    cfg: Yolov5Config,
    *,
    compute_dtype=jnp.float32,
) -> dict[str, jnp.ndarray]:
    """Full forward.

    anchor_free: returns {"box_logits", "cls_logits"} (v8 contract —
    decoded downstream with ops/decode.py).
    anchor-based: returns {"boxes" (B, A, 4) xyxy in input pixels,
    "scores" (B, A, nc)} fully decoded (sigmoid + anchor transform) —
    SURVEY.md D3's "anchor-based for v5".
    """
    x = x.astype(compute_dtype)
    feats = yolov5_features(params, x, cfg)
    if cfg.anchor_free:
        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            b = _branch_apply(params["detect"]["box"][i], f)
            c = _branch_apply(params["detect"]["cls"][i], f)
            n = f.shape[0]
            box_out.append(b.reshape(n, -1, b.shape[-1]))
            cls_out.append(c.reshape(n, -1, c.shape[-1]))
        return {
            "box_logits": jnp.concatenate(box_out, 1).astype(jnp.float32),
            "cls_logits": jnp.concatenate(cls_out, 1).astype(jnp.float32),
        }

    boxes_all, scores_all = [], []
    for i, f in enumerate(feats):
        n, h, w, _ = f.shape
        s = cfg.strides[i]
        raw = C.conv2d_bias_apply(params["detect"]["m"][i], f)
        raw = raw.reshape(n, h, w, cfg.na, 5 + cfg.nc).astype(jnp.float32)
        sig = jax.nn.sigmoid(raw)
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1,h,w,1,2)
        anchor = jnp.asarray(V5_ANCHORS[i], jnp.float32)[None, None, None]
        xy = (sig[..., :2] * 2.0 - 0.5 + grid) * s
        wh = (sig[..., 2:4] * 2.0) ** 2 * anchor
        x1y1 = xy - wh / 2
        x2y2 = xy + wh / 2
        boxes = jnp.concatenate([x1y1, x2y2], -1).reshape(n, -1, 4)
        scores = (sig[..., 4:5] * sig[..., 5:]).reshape(n, -1, cfg.nc)
        boxes_all.append(boxes)
        scores_all.append(scores)
    return {
        "boxes": jnp.concatenate(boxes_all, 1),
        "scores": jnp.concatenate(scores_all, 1),
    }
