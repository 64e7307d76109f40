"""OSNet — omni-scale ReID embedder (StrongSORT appearance model).

SURVEY.md H1: the StrongSORT configs in BASELINE.json require OSNet
appearance embeddings. Architecture follows the OSNet paper (Zhou et
al., omni-scale feature learning) in the torchreid release layout —
block structure, activations (ReLU throughout), and BatchNorm (eps
1e-5) match the published ``osnet_x*`` checkpoints exactly so that
``models/porting.port_osnet`` yields numerically identical features:

- stem: 7x7/2 conv+BN+ReLU, 3x3/2 maxpool;
- three stages of two OS blocks each; an OS block runs T=1..4 stacked
  "Light" 3x3 convs (linear 1x1 pointwise -> depthwise 3x3 -> one BN
  -> ReLU) in parallel streams, fuses them with a shared
  channel-attention aggregation gate (reduction 16), and projects back
  with a linear 1x1+BN plus a residual;
- 1x1 conv + 2x2 avgpool transitions after stages 2 and 3;
- final 1x1 conv, global average pool, and an fc embedding head
  (Linear -> BatchNorm1d -> ReLU), L2-normalized on device so the
  tracker's cosine costs are one matmul (track/cost.py).

TPU-first: NHWC functional blocks from models/common.py; the whole
embedder runs batched over all detection crops of a frame (one
(M, 128, 64, 3) tensor from ops/crops.py), bf16-friendly.

Width multipliers follow the released variants: x1_0 -> (64, 256, 384,
512), x0_75, x0_5, x0_25 (the tracking default: (16, 64, 96, 128)).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.models import common as C

Params = dict[str, Any]

BN_EPS = 1e-5  # torch BatchNorm default (torchreid checkpoints)

VARIANTS = {
    "osnet_x1_0": 1.0,
    "osnet_x0_75": 0.75,
    "osnet_x0_5": 0.5,
    "osnet_x0_25": 0.25,
}


@dataclasses.dataclass(frozen=True)
class OsnetConfig:
    variant: str = "osnet_x0_25"
    feat_dim: int = 512
    crop_hw: tuple[int, int] = (128, 64)

    @property
    def channels(self) -> tuple[int, int, int, int]:
        m = VARIANTS[self.variant]
        return tuple(int(c * m) for c in (64, 256, 384, 512))


def _relu_conv(p, x, *, stride: int = 1, groups: int = 1):
    """conv + BN + ReLU (torchreid ConvLayer / Conv1x1)."""
    return jax.nn.relu(
        C.conv_apply(p, x, stride=stride, groups=groups, act=False,
                     eps=BN_EPS, mm1x1=True)
    )


def _linear_conv(p, x, *, groups: int = 1):
    """conv + BN, NO activation (torchreid Conv1x1Linear)."""
    return C.conv_apply(p, x, groups=groups, act=False, eps=BN_EPS,
                        mm1x1=True)


def _init_lite_conv(key, c_in, c_out):
    """LightConv3x3: linear 1x1 pointwise (no BN) -> depthwise 3x3 ->
    one BN -> ReLU (the torchreid building unit)."""
    import math

    k1, k2 = jax.random.split(key)
    std = math.sqrt(2.0 / c_in)
    return {
        # bias-free linear pointwise ("b" zeros => conv_apply skips BN)
        "pw": {
            "w": (jax.random.normal(k1, (1, 1, c_in, c_out)) * std).astype(
                jnp.float32
            ),
            "b": jnp.zeros((c_out,), jnp.float32),
        },
        "dw": C.init_conv(k2, c_out, c_out, 3, groups=c_out),
    }


def _lite_conv_apply(p, x):
    x = C.conv_apply(p["pw"], x, act=False, mm1x1=True)  # pure linear
    return _relu_conv(p["dw"], x, groups=x.shape[-1])


def _init_gate(key, c):
    """Aggregation gate: squeeze -> fc -> relu -> fc -> sigmoid,
    shared across streams of a block (torchreid reduction=16)."""
    k1, k2 = jax.random.split(key)
    r = max(c // 16, 1)
    return {
        "fc1": C.init_conv2d_bias(k1, c, r, 1),
        "fc2": C.init_conv2d_bias(k2, r, c, 1),
    }


def _gate_apply(p, x):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
    s = jax.nn.relu(C.conv2d_bias_apply(p["fc1"], s))
    s = jax.nn.sigmoid(C.conv2d_bias_apply(p["fc2"], s))
    return x * s


def _init_os_block(key, c_in, c_out, streams: int = 4):
    mid = c_out // 4
    ks = jax.random.split(key, 3 + streams + sum(range(streams + 1)))
    p = {
        "conv1": C.init_conv(ks[0], c_in, mid, 1),
        "gate": _init_gate(ks[1], mid),
        "conv3": C.init_conv(ks[2], mid, c_out, 1),
        "streams": [],
    }
    ki = 3
    for t in range(1, streams + 1):
        convs = []
        for _ in range(t):
            convs.append(_init_lite_conv(ks[ki], mid, mid))
            ki += 1
        p["streams"].append(convs)
    if c_in != c_out:
        p["down"] = C.init_conv(jax.random.split(ks[0])[0], c_in, c_out, 1)
    return p


def _os_block_apply(p, x):
    y = _relu_conv(p["conv1"], x)
    agg = None
    for convs in p["streams"]:
        s = y
        for cp in convs:
            s = _lite_conv_apply(cp, s)
        s = _gate_apply(p["gate"], s)
        agg = s if agg is None else agg + s
    out = _linear_conv(p["conv3"], agg)
    res = x if "down" not in p else _linear_conv(p["down"], x)
    return jax.nn.relu(out + res)


def init_osnet(key: jax.Array, cfg: OsnetConfig = OsnetConfig()) -> Params:
    c1, c2, c3, c4 = cfg.channels
    ks = jax.random.split(key, 12)
    return {
        "stem": C.init_conv(ks[0], 3, c1, 7),
        "b2a": _init_os_block(ks[1], c1, c2),
        "b2b": _init_os_block(ks[2], c2, c2),
        "t2": C.init_conv(ks[3], c2, c2, 1),
        "b3a": _init_os_block(ks[4], c2, c3),
        "b3b": _init_os_block(ks[5], c3, c3),
        "t3": C.init_conv(ks[6], c3, c3, 1),
        "b4a": _init_os_block(ks[7], c3, c4),
        "b4b": _init_os_block(ks[8], c4, c4),
        "conv5": C.init_conv(ks[9], c4, c4, 1),
        # fc head: Linear -> BN1d -> ReLU (torchreid fc.0 / fc.1)
        "fc": {
            "lin": C.init_conv2d_bias(ks[10], c4, cfg.feat_dim, 1),
            "bn": {
                "bn_scale": jnp.ones((cfg.feat_dim,), jnp.float32),
                "bn_bias": jnp.zeros((cfg.feat_dim,), jnp.float32),
                "bn_mean": jnp.zeros((cfg.feat_dim,), jnp.float32),
                "bn_var": jnp.ones((cfg.feat_dim,), jnp.float32),
            },
        },
    }


def _avgpool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    ) / 4.0


def _maxpool_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _stem_norm_folded(
    stem: Params,
    crops: jnp.ndarray,  # (M, ...) in [0,1], compute dtype
    mean: jnp.ndarray,   # (3,) f32 (already channel-ordered)
    std: jnp.ndarray,
    *,
    packed_input: bool,
) -> jnp.ndarray:
    """stem(normalize(crops)) with the per-channel affine folded into
    the conv — EXACTLY, including borders.

    conv((x - m)/s) == conv_{W/s}(x) - D, where D = conv_{W/s}(m) is
    the folded conv of the constant MEAN map (the folded weight
    already carries the 1/s) under the SAME zero padding: constant in the
    interior, position-dependent at the borders (padded zeros stood
    for "pixel == 0 in normalized space", i.e. raw value m). D is a
    weights-only (1, H, W, c1) tensor XLA hoists out of the crop
    batch; the (M, crop, crop, C) normalize pass never runs.
    Oracle-equality pinned by tests/test_osnet_kernel.py."""
    dt = crops.dtype
    if packed_input:
        from strongsort_yolo_tpu.ops.pack import pack_stem7_weight

        w = pack_stem7_weight(stem["w"])
        ms = jnp.repeat(mean, 4)
        w = (w / jnp.repeat(std, 4)[None, None, :, None]).astype(dt)
        stride, pad = 1, ((2, 1), (2, 1))
        hw = (crops.shape[1], crops.shape[2])
    else:
        w = (stem["w"] / std[None, None, :, None]).astype(dt)
        ms = mean
        stride, pad = 2, ((3, 3), (3, 3))
        hw = (crops.shape[1], crops.shape[2])

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(stride, stride), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    const = jnp.broadcast_to(
        ms.astype(dt), (1,) + hw + (ms.shape[0],)
    )
    y = conv(crops) - conv(const)
    return jax.nn.relu(C.bn_act(stem, y, eps=BN_EPS, act=False))


def osnet_apply(
    params: Params,
    crops: jnp.ndarray,  # (M, 128, 64, 3) in [0,1]
    *,
    compute_dtype=jnp.float32,
    packed_input: bool = False,
    channel_order: str = "rgb",
    fused: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (M, feat_dim) L2-normalized appearance embeddings.

    packed_input: ``crops`` is (M, 64, 32, 12) in space-to-depth
    packing order (ops/crops.crop_and_resize_packed) and the 7x7/2
    stem runs in transition form (ops/pack.pack_stem7_weight) — exact
    same math, but the MXU-starved 3-channel full-res crop tensor
    never exists (NOTES.md OSNet-stem backlog entry).

    channel_order: "rgb" (torchreid convention — what the weights were
    trained on) or "bgr" for crops cut from cv2-convention frames (the
    pipeline's case). The BGR path costs nothing at runtime: the
    normalization vectors and the stem weights' input-channel axis are
    reversed at TRACE time instead of flipping every crop.

    fused: run the three backbone stages as VMEM-resident Pallas
    kernels (ops/pallas/osnet_kernel — one HBM read + one write per
    STAGE instead of ~30 activation traversals per block; same math,
    BN folded at trace time). The stem, maxpool and fc head stay XLA.
    MEASURED NEGATIVE on the v5e (0.51x in-step — the depthwise
    stencils are a VPU op-count floor XLA already sits near; see the
    kernel module docstring); kept for the record, off by default.
    """
    assert channel_order in ("rgb", "bgr"), channel_order
    # ImageNet normalization (standard for ReID backbones) — folded
    # into the stem conv at trace time (_stem_norm_folded): the
    # (M, crop, crop, C) `(x - mean)/std` tensor was a pure HBM pass
    # the v5e roofline audit billed at 608 us/step at bucket 4096
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    stem = dict(params["stem"])
    if channel_order == "bgr":
        mean, std = mean[::-1], std[::-1]
        stem["w"] = stem["w"][:, :, ::-1, :]
    x = _stem_norm_folded(
        stem, crops.astype(compute_dtype), mean, std,
        packed_input=packed_input,
    )
    x = _maxpool_s2(x)
    if fused:
        from strongsort_yolo_tpu.ops.pallas.osnet_kernel import (
            StageSpec,
            fold_stage,
            os_stage,
        )

        h, w = x.shape[1], x.shape[2]
        c1 = x.shape[3]
        c2 = params["t2"]["w"].shape[-1]
        c3 = params["t3"]["w"].shape[-1]
        c4 = params["conv5"]["w"].shape[-1]
        tm = 8
        while x.shape[0] % tm:
            tm //= 2
        x = x.transpose(0, 3, 1, 2)  # kernels run channel-major
        for blk, ep, spec in (
            ("b2", "t2", StageSpec(h, w, c1, c2, c2 // 4, "pool")),
            ("b3", "t3", StageSpec(h // 2, w // 2, c2, c3, c3 // 4,
                                   "pool")),
            ("b4", "conv5", StageSpec(h // 4, w // 4, c3, c4, c4 // 4,
                                      "gap")),
        ):
            f = fold_stage(params[blk + "a"], params[blk + "b"],
                           params[ep], spec, wdtype=compute_dtype,
                           tm=tm)
            x = os_stage(x, f, spec=spec, tm=tm, interpret=interpret)
        # x: (M, c4) — conv5 + global average pool ran in-kernel
    else:
        x = _os_block_apply(params["b2a"], x)
        x = _os_block_apply(params["b2b"], x)
        x = _avgpool2(_relu_conv(params["t2"], x))
        x = _os_block_apply(params["b3a"], x)
        x = _os_block_apply(params["b3b"], x)
        x = _avgpool2(_relu_conv(params["t3"], x))
        x = _os_block_apply(params["b4a"], x)
        x = _os_block_apply(params["b4b"], x)
        x = _relu_conv(params["conv5"], x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (M, c4)
    fc = params["fc"]
    feat = C.conv2d_bias_apply(fc["lin"], x[:, None, None, :])[:, 0, 0, :]
    bn = fc["bn"]
    scale = bn["bn_scale"] * jax.lax.rsqrt(bn["bn_var"] + BN_EPS)
    feat = feat * scale.astype(feat.dtype) + (
        bn["bn_bias"] - bn["bn_mean"] * scale
    ).astype(feat.dtype)
    feat = jax.nn.relu(feat)
    feat = feat.astype(jnp.float32)
    return feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Native .npz checkpoint IO (framework-trained embedders — e.g. the
# synthetic-identity checkpoint assets/osnet_x0_25_synth.npz produced
# by tools/train_osnet.py; torchreid .pt loading lives in
# models/porting.load_reid_checkpoint)
# ---------------------------------------------------------------------------


def _flatten(node, prefix, out):
    if isinstance(node, dict):
        for k, v in node.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(node)


def save_osnet_npz(path: str, params: Params, cfg: OsnetConfig) -> None:
    # one bulk device->host transfer (per-leaf np.asarray pays a
    # round-trip PER ARRAY — minutes through the axon tunnel)
    params = jax.device_get(params)
    flat: dict = {}
    _flatten(params, "", flat)
    flat["__variant__"] = np.asarray(cfg.variant)
    np.savez(path, **flat)


def load_osnet_npz(path: str) -> tuple[Params, OsnetConfig]:
    z = np.load(path, allow_pickle=False)
    cfg = OsnetConfig(variant=str(z["__variant__"]))
    root: dict = {}
    for name in z.files:
        if name == "__variant__":
            continue
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[name])

    def listify(node):
        """Restore lists saved as {'0': ..., '1': ...} dicts."""
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root), cfg
