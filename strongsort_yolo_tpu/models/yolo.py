"""YOLOv8 / YOLO11 detection, segmentation and pose models in JAX.

Covers the model families the reference selects at
/root/reference/yolo_multi_model.py:14-17 (yolov8n-seg, yolov5n,
yolo11n, yolo11n-pose) minus v5, which lives in models/yolov5.py
(anchor-based head). Architectures follow the public spec (SURVEY.md
D3/D4/D5): C2f (v8) / C3k2+C2PSA (v11) CSP backbones, SPPF, PAN neck,
anchor-free decoupled heads with DFL reg_max=16 at strides 8/16/32.

The forward is one pure function over an NHWC batch; all shapes are
static so the whole detect→decode path jits once per input size. Head
outputs are returned raw (logits); decode + NMS compose downstream in
pipeline.py so Pallas fusion can grab the whole postprocess.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax

from strongsort_yolo_tpu.ops import runtime
import jax.numpy as jnp

from strongsort_yolo_tpu.models import common as C

Params = dict[str, Any]

# family -> scale -> (depth_mult, width_mult, max_channels)
SCALES = {
    "v8": {
        "n": (0.33, 0.25, 1024),
        "s": (0.33, 0.50, 1024),
        "m": (0.67, 0.75, 768),
        "l": (1.00, 1.00, 512),
        "x": (1.00, 1.25, 512),
    },
    "v11": {
        "n": (0.50, 0.25, 1024),
        "s": (0.50, 0.50, 1024),
        "m": (0.50, 1.00, 512),
        "l": (1.00, 1.00, 512),
        "x": (1.00, 1.50, 512),
    },
}


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    family: str = "v8"  # "v8" | "v11"
    scale: str = "n"  # n/s/m/l/x
    task: str = "detect"  # detect | segment | pose
    nc: int = 80
    reg_max: int = 16
    nm: int = 32  # mask coefficients (segment)
    npr: int = 256  # proto channels before width scaling (segment)
    kpt: tuple[int, int] = (17, 3)  # keypoints (pose)
    strides: tuple[int, ...] = (8, 16, 32)

    def ch(self, c: int) -> int:
        """Apply width multiple + max-channel cap, rounded to 8."""
        _, w, maxc = SCALES[self.family][self.scale]
        return max(int(round(min(c, maxc) * w / 8)) * 8, 8)

    def depth(self, n: int) -> int:
        d, _, _ = SCALES[self.family][self.scale]
        return max(round(n * d), 1)

    @property
    def nk(self) -> int:
        return self.kpt[0] * self.kpt[1]

    @property
    def head_ch(self) -> tuple[int, int, int]:
        """(P3, P4, P5) channel counts feeding the heads."""
        return (self.ch(256), self.ch(512), self.ch(1024))


def build_model(name: str) -> YoloConfig:
    """Parse a reference-style model name, e.g. 'yolov8n-seg', 'yolo11n-pose'.

    Mirrors how the reference picks models by checkpoint filename
    (yolo_multi_model.py:14-17) — task inferred from the suffix.
    """
    base = name.lower().removesuffix(".pt")
    task = "detect"
    if base.endswith("-seg"):
        task, base = "segment", base.removesuffix("-seg")
    elif base.endswith("-pose"):
        task, base = "pose", base.removesuffix("-pose")
    if base.startswith("yolov8"):
        family, scale = "v8", base.removeprefix("yolov8")
    elif base.startswith("yolo11") or base.startswith("yolov11"):
        family = "v11"
        scale = base.removeprefix("yolov11").removeprefix("yolo11")
    elif base.startswith("yolov5"):
        raise ValueError("yolov5 models are built via models.yolov5")
    else:
        raise ValueError(f"unknown model name: {name}")
    if scale not in "nsmlx" or len(scale) != 1:
        raise ValueError(f"unknown scale in model name: {name}")
    return YoloConfig(family=family, scale=scale, task=task)


# ---------------------------------------------------------------------------
# Backbone + neck
# ---------------------------------------------------------------------------


def _init_stage_block(key, cfg: YoloConfig, c_in, c_out, n, *, c3k_flag, e=0.5):
    """C2f for v8, C3k2 for v11 — the per-family CSP unit."""
    if cfg.family == "v8":
        return C.init_c2f(key, c_in, c_out, n, e=e)
    return C.init_c3k2(key, c_in, c_out, n, c3k=c3k_flag, e=e)


def _stage_block_apply(cfg: YoloConfig, p, x, *, shortcut):
    if cfg.family == "v8":
        return C.c2f_apply(p, x, shortcut=shortcut)
    return C.c3k2_apply(p, x, shortcut=shortcut)


def _c3k_default(cfg: YoloConfig) -> bool:
    # v11 yaml: C3k2 uses plain bottlenecks on n/s, C3k units on m/l/x.
    return cfg.scale in ("m", "l", "x")


def init_backbone(key: jax.Array, cfg: YoloConfig) -> Params:
    ch = cfg.ch
    if cfg.family == "v8":
        reps = (cfg.depth(3), cfg.depth(6), cfg.depth(6), cfg.depth(3))
    else:
        reps = (cfg.depth(2), cfg.depth(2), cfg.depth(2), cfg.depth(2))
    ks = jax.random.split(key, 12)
    p: Params = {
        "stem": C.init_conv(ks[0], 3, ch(64), 3),
        "down1": C.init_conv(ks[1], ch(64), ch(128), 3),
        "stage1": _init_stage_block(
            ks[2], cfg, ch(128), ch(256) if cfg.family == "v11" else ch(128),
            reps[0], c3k_flag=_c3k_default(cfg),
            e=0.25 if cfg.family == "v11" else 0.5,
        ),
        "down2": C.init_conv(
            ks[3], ch(256) if cfg.family == "v11" else ch(128), ch(256), 3
        ),
        "stage2": _init_stage_block(
            ks[4], cfg, ch(256), ch(512) if cfg.family == "v11" else ch(256),
            reps[1], c3k_flag=_c3k_default(cfg),
            e=0.25 if cfg.family == "v11" else 0.5,
        ),
        "down3": C.init_conv(
            ks[5], ch(512) if cfg.family == "v11" else ch(256), ch(512), 3
        ),
        "stage3": _init_stage_block(
            ks[6], cfg, ch(512), ch(512), reps[2],
            c3k_flag=True if cfg.family == "v11" else _c3k_default(cfg),
        ),
        "down4": C.init_conv(ks[7], ch(512), ch(1024), 3),
        "stage4": _init_stage_block(
            ks[8], cfg, ch(1024), ch(1024), reps[3],
            c3k_flag=True if cfg.family == "v11" else _c3k_default(cfg),
        ),
        "sppf": C.init_sppf(ks[9], ch(1024), ch(1024)),
    }
    if cfg.family == "v11":
        p["c2psa"] = C.init_c2psa(ks[10], ch(1024), cfg.depth(2))
    return p


def backbone_apply(
    cfg: YoloConfig, p: Params, x: jnp.ndarray, *, pack: bool = False,
    packed_prefix: Params | None = None,
    stem_out: jnp.ndarray | None = None,
    packed_p3: Params | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NHWC image -> (P3, P4, P5) pyramid features.

    pack=True runs the stem..stage2 prefix space-to-depth packed
    (half spatial, 4x channels, exact weight transform — ops/pack.py):
    the 160x160/80x80 small-channel stages otherwise starve the MXU
    and thrash layouts. Requires H and W divisible by 4.

    packed_prefix: precomputed ``pack_backbone_prefix(p)`` — pass it
    when calling inside a ``lax.scan``/``vmap`` body so the weight
    transform is hoisted out of the loop (implies pack=True).

    stem_out: precomputed packed stem output (from
    ops/stem_fuse.fused_stem_apply — letterbox folded into the stem);
    when given, ``x`` is ignored and the prefix continues from down1.

    packed_p3: ops/pack.pack_p3_path params — P3 is returned PACKED
    (40x40x4C) and down3 consumes it via the transition conv; the
    neck/head must then also receive packed_p3.
    """
    if pack or packed_prefix is not None or stem_out is not None:
        from strongsort_yolo_tpu.ops.pack import (
            depth_to_space, pack_backbone_prefix, space_to_depth,
        )

        pp = packed_prefix if packed_prefix is not None else pack_backbone_prefix(p)
        if stem_out is not None:
            y = stem_out
        elif "stem6" in pp:
            # s2d folded into the stem: one 6x6/s4 conv on the raw
            # frame (ops/pack.fuse_stem_s2d) — no transpose copy.
            y = C.conv_apply(pp["stem6"], x, stride=4, pad=2)
        else:
            y = space_to_depth(x)
            y = C.conv_apply(pp["stem"], y, stride=2)
        y = C.conv_apply(pp["down1"], y, stride=2)
        y = _stage_block_apply(cfg, pp["stage1"], y, shortcut=True)
        y = C.conv_apply(pp["down2"], y, stride=2)
        y = _stage_block_apply(cfg, pp["stage2"], y, shortcut=True)
        if packed_p3 is not None:
            x = C.conv_apply(packed_p3["down3t"], y, pad=(1, 0))
            p4 = _stage_block_apply(cfg, p["stage3"], x, shortcut=True)
            x = C.conv_apply(p["down4"], p4, stride=2)
            x = _stage_block_apply(cfg, p["stage4"], x, shortcut=True)
            p5 = C.sppf_apply(p["sppf"], x)
            return y, p4, p5  # p3 stays packed
        p3 = depth_to_space(y)
    else:
        x = C.conv_apply(p["stem"], x, stride=2)
        x = C.conv_apply(p["down1"], x, stride=2)
        x = _stage_block_apply(cfg, p["stage1"], x, shortcut=True)
        x = C.conv_apply(p["down2"], x, stride=2)
        p3 = _stage_block_apply(cfg, p["stage2"], x, shortcut=True)
    x = C.conv_apply(p["down3"], p3, stride=2)
    p4 = _stage_block_apply(cfg, p["stage3"], x, shortcut=True)
    x = C.conv_apply(p["down4"], p4, stride=2)
    x = _stage_block_apply(cfg, p["stage4"], x, shortcut=True)
    p5 = C.sppf_apply(p["sppf"], x)
    if cfg.family == "v11":
        p5 = C.c2psa_apply(p["c2psa"], p5)
    return p3, p4, p5


def init_neck(key: jax.Array, cfg: YoloConfig) -> Params:
    """PAN neck: top-down then bottom-up fusion."""
    ch = cfg.ch
    n = cfg.depth(3) if cfg.family == "v8" else cfg.depth(2)
    c3k = _c3k_default(cfg)
    # v11's backbone emits ch(512) at P3 resolution (its stage-2 C3k2
    # widens early); v8 emits ch(256) there.
    p3_ch = ch(512) if cfg.family == "v11" else ch(256)
    ks = jax.random.split(key, 6)
    return {
        "td1": _init_stage_block(
            ks[0], cfg, ch(1024) + ch(512), ch(512), n, c3k_flag=c3k
        ),
        "td2": _init_stage_block(
            ks[1], cfg, ch(512) + p3_ch, ch(256), n, c3k_flag=c3k
        ),
        "bu1_conv": C.init_conv(ks[2], ch(256), ch(256), 3),
        "bu1": _init_stage_block(
            ks[3], cfg, ch(256) + ch(512), ch(512), n, c3k_flag=c3k
        ),
        "bu2_conv": C.init_conv(ks[4], ch(512), ch(512), 3),
        "bu2": _init_stage_block(
            ks[5], cfg, ch(512) + ch(1024), ch(1024), n,
            c3k_flag=True if cfg.family == "v11" else c3k,
        ),
    }


def neck_apply(
    cfg: YoloConfig, p: Params, feats: tuple[jnp.ndarray, ...],
    *, packed_p3: Params | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PAN fusion. With packed_p3 (ops/pack.pack_p3_path), ``feats[0]``
    is the PACKED P3 and the returned n3 is packed too: td2 runs at
    half spatial / 4x channels, upsample2x(t4) in packed space is a
    channel repeat, and bu1_conv uses the transition form."""
    p3, p4, p5 = feats
    x = jnp.concatenate([C.upsample2x(p5), p4], axis=-1)
    t4 = _stage_block_apply(cfg, p["td1"], x, shortcut=False)
    if packed_p3 is not None:
        from strongsort_yolo_tpu.ops.pack import repeat4

        x = jnp.concatenate([repeat4(t4), p3], axis=-1)
        n3 = _stage_block_apply(cfg, packed_p3["td2"], x, shortcut=False)
        bu1 = C.conv_apply(packed_p3["bu1t"], n3, pad=(1, 0))
    else:
        x = jnp.concatenate([C.upsample2x(t4), p3], axis=-1)
        n3 = _stage_block_apply(cfg, p["td2"], x, shortcut=False)
        bu1 = C.conv_apply(p["bu1_conv"], n3, stride=2)
    x = jnp.concatenate([bu1, t4], -1)
    n4 = _stage_block_apply(cfg, p["bu1"], x, shortcut=False)
    x = jnp.concatenate([C.conv_apply(p["bu2_conv"], n4, stride=2), p5], -1)
    n5 = _stage_block_apply(cfg, p["bu2"], x, shortcut=False)
    return n3, n4, n5


# ---------------------------------------------------------------------------
# Heads: Detect / Segment / Pose
# ---------------------------------------------------------------------------


def _init_branch(key, c_in, c_mid, c_out, *, dw=False):
    """Conv-Conv-Conv2d tower. dw=True uses the v11 depthwise cls tower."""
    ks = jax.random.split(key, 5)
    if not dw:
        return {
            "a": C.init_conv(ks[0], c_in, c_mid, 3),
            "b": C.init_conv(ks[1], c_mid, c_mid, 3),
            "out": C.init_conv2d_bias(ks[2], c_mid, c_out, 1),
        }
    return {
        "a_dw": C.init_conv(ks[0], c_in, c_in, 3, groups=c_in),
        "a": C.init_conv(ks[1], c_in, c_mid, 1),
        "b_dw": C.init_conv(ks[2], c_mid, c_mid, 3, groups=c_mid),
        "b": C.init_conv(ks[3], c_mid, c_mid, 1),
        "out": C.init_conv2d_bias(ks[4], c_mid, c_out, 1),
    }


def _branch_apply(p, x):
    if "a_dw" in p:
        c_in = x.shape[-1]
        x = C.conv_apply(p["a_dw"], x, groups=c_in)
        x = C.conv_apply(p["a"], x)
        c_mid = x.shape[-1]
        x = C.conv_apply(p["b_dw"], x, groups=c_mid)
        x = C.conv_apply(p["b"], x)
    else:
        x = C.conv_apply(p["a"], x)
        x = C.conv_apply(p["b"], x)
    return C.conv2d_bias_apply(p["out"], x)


def init_detect_head(key: jax.Array, cfg: YoloConfig) -> Params:
    ch = cfg.head_ch
    c2 = max(16, ch[0] // 4, cfg.reg_max * 4)
    c3 = max(ch[0], min(cfg.nc, 100))
    ks = jax.random.split(key, 2 * len(ch))
    dw_cls = cfg.family == "v11"
    box = [_init_branch(ks[i], ch[i], c2, 4 * cfg.reg_max) for i in range(3)]
    cls = [
        _init_branch(ks[3 + i], ch[i], c3, cfg.nc, dw=dw_cls)
        for i in range(3)
    ]
    # Detection-prior bias init (standard v8 practice): box bias 1.0;
    # cls bias set so the initial objectness matches ~5 objects per
    # 640px image at each stride — stabilizes training AND makes an
    # untrained model's candidate statistics realistic (sparse).
    for i, s in enumerate(cfg.strides):
        box[i]["out"]["b"] = jnp.full_like(box[i]["out"]["b"], 1.0)
        prior = math.log(5.0 / cfg.nc / (640.0 / s) ** 2)
        cls[i]["out"]["b"] = jnp.full_like(cls[i]["out"]["b"], prior)
    return {"box": box, "cls": cls}


def detect_head_apply(
    p: Params, feats: tuple[jnp.ndarray, ...],
    *, packed_p3: Params | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (box_logits (B, A, 4*reg_max), cls_logits (B, A, nc)).

    With packed_p3, ``feats[0]`` is packed and the level-0 towers run
    in packed space; outputs are depth_to_space'd before the flatten
    so the anchor ordering (row-major per level) is unchanged."""
    box_out, cls_out = [], []
    for i, f in enumerate(feats):
        if i == 0 and packed_p3 is not None:
            from strongsort_yolo_tpu.ops.pack import depth_to_space

            b = depth_to_space(_branch_apply(packed_p3["box0"], f))
            c = depth_to_space(_branch_apply(packed_p3["cls0"], f))
        else:
            b = _branch_apply(p["box"][i], f)
            c = _branch_apply(p["cls"][i], f)
        n = f.shape[0]
        box_out.append(b.reshape(n, -1, b.shape[-1]))
        cls_out.append(c.reshape(n, -1, c.shape[-1]))
    return jnp.concatenate(box_out, axis=1), jnp.concatenate(cls_out, axis=1)


def init_proto(key: jax.Array, cfg: YoloConfig) -> Params:
    c_in = cfg.head_ch[0]
    c_ = cfg.ch(cfg.npr)
    ks = jax.random.split(key, 3)
    return {
        "cv1": C.init_conv(ks[0], c_in, c_, 3),
        "cv2": C.init_conv(ks[1], c_, c_, 3),
        "cv3": C.init_conv(ks[2], c_, cfg.nm, 1),
    }


def proto_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """P3 features -> (B, 4*h3, 4*w3... ) actually 2x: (B, 160, 160, nm) @640."""
    x = C.conv_apply(p["cv1"], x)
    x = C.upsample2x(x)
    x = C.conv_apply(p["cv2"], x)
    return C.conv_apply(p["cv3"], x)


def init_model(key: jax.Array, cfg: YoloConfig) -> Params:
    kb, kn, kh, kx = jax.random.split(key, 4)
    params: Params = {
        "backbone": init_backbone(kb, cfg),
        "neck": init_neck(kn, cfg),
        "detect": init_detect_head(kh, cfg),
    }
    ch = cfg.head_ch
    if cfg.task == "segment":
        k1, k2 = jax.random.split(kx)
        c4 = max(ch[0] // 4, cfg.nm)
        params["proto"] = init_proto(k1, cfg)
        ks = jax.random.split(k2, 3)
        params["mask"] = [
            _init_branch(ks[i], ch[i], c4, cfg.nm) for i in range(3)
        ]
    elif cfg.task == "pose":
        c4 = max(ch[0] // 4, cfg.nk)
        ks = jax.random.split(kx, 3)
        params["kpt"] = [
            _init_branch(ks[i], ch[i], c4, cfg.nk) for i in range(3)
        ]
    return params


def model_apply(
    params: Params,
    x: jnp.ndarray | None,
    cfg: YoloConfig,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    pack: bool | None = None,
    packed_prefix: Params | None = None,
    stem_out: jnp.ndarray | None = None,
    packed_p3: Params | None = None,
    out_dtype: jnp.dtype | None = jnp.float32,
) -> dict[str, jnp.ndarray]:
    """Full forward. x: (B, H, W, 3) in [0,1], NHWC.

    Returns raw head outputs:
      box_logits (B, A, 4*reg_max), cls_logits (B, A, nc),
      + task extras: mask_coef (B, A, nm) & proto (B, Hm, Wm, nm),
        or kpt_raw (B, A, nk).
    A = sum over levels of (H/s * W/s).

    out_dtype: dtype of box/cls logits — float32 default; None keeps
    the compute dtype (the (B, A, nc) casts are two full HBM passes at
    batch 32, and sigmoid/softmax consumers cast their few candidate
    rows themselves).

    pack: space-to-depth packed prefix (see backbone_apply). Default
    (None) enables it on the TPU backend whenever the input size
    allows — the transform is numerically exact (same math, re-indexed
    weights) and measured faster there; on CPU/GPU the 4x-FLOP packed
    convs are unmeasured, so other backends stay opt-in (pack=True).

    stem_out: precomputed packed stem output (letterbox folded into
    the stem — ops/stem_fuse); ``x`` may be None then.
    """
    if stem_out is None:
        x = x.astype(compute_dtype)
    if pack is None:
        pack = (
            packed_prefix is not None
            or stem_out is not None
            or (
                runtime.target_platform() == "tpu"
                and x.shape[-3] % 4 == 0
                and x.shape[-2] % 4 == 0
            )
        )
    if not pack:
        packed_p3 = None
    feats = backbone_apply(
        cfg, params["backbone"], x, pack=pack, packed_prefix=packed_prefix,
        stem_out=stem_out, packed_p3=packed_p3,
    )
    n3, n4, n5 = neck_apply(
        cfg, params["neck"], feats, packed_p3=packed_p3
    )
    box_logits, cls_logits = detect_head_apply(
        params["detect"], (n3, n4, n5), packed_p3=packed_p3
    )
    if out_dtype is not None:
        box_logits = box_logits.astype(out_dtype)
        cls_logits = cls_logits.astype(out_dtype)
    out = {
        "box_logits": box_logits,
        "cls_logits": cls_logits,
    }
    if cfg.task == "segment":
        coefs = []
        for i, f in enumerate((n3, n4, n5)):
            c = _branch_apply(params["mask"][i], f)
            coefs.append(c.reshape(c.shape[0], -1, c.shape[-1]))
        out["mask_coef"] = jnp.concatenate(coefs, axis=1).astype(jnp.float32)
        out["proto"] = proto_apply(params["proto"], n3).astype(jnp.float32)
    elif cfg.task == "pose":
        kpts = []
        for i, f in enumerate((n3, n4, n5)):
            k = _branch_apply(params["kpt"][i], f)
            kpts.append(k.reshape(k.shape[0], -1, k.shape[-1]))
        out["kpt_raw"] = jnp.concatenate(kpts, axis=1).astype(jnp.float32)
    return out


def feat_hw(input_hw: tuple[int, int], strides=(8, 16, 32)):
    """Per-level (h, w) for an input size — feeds ops.decode.make_anchors."""
    h, w = input_hw
    return [(h // s, w // s) for s in strides]


def num_anchors(input_hw: tuple[int, int], strides=(8, 16, 32)) -> int:
    return sum(h * w for h, w in feat_hw(input_hw, strides))


def fuse_model(params: Params) -> Params:
    """Fold every BN into its conv — the inference fast path."""

    def fuse(node):
        if isinstance(node, dict):
            if "bn_scale" in node:
                return C.fuse_conv_bn(node)
            return {k: fuse(v) for k, v in node.items()}
        if isinstance(node, list):
            return [fuse(v) for v in node]
        return node

    return fuse(params)
