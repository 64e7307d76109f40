"""Shared neural blocks for the YOLO family, as pure-functional JAX.

Re-implements (from the architecture spec, not the code — SURVEY.md D3)
the block vocabulary ultralytics' ``nn/modules`` provides to the models
the reference loads at /root/reference/yolo_multi_model.py:14-17:
Conv(+BN+SiLU), Bottleneck, C2f, C3, C3k2, SPPF, C2PSA, and the v5-era
C3 stack.

TPU-first choices:
- NHWC layout end-to-end (XLA:TPU's preferred conv layout; no
  channels-first translation of the torch reference);
- params are plain nested dicts of jnp arrays — trivially shardable
  with jax.sharding, trivially portable from torch state_dicts;
- compute dtype is a parameter (bfloat16 on TPU keeps the MXU fed);
  master params stay float32;
- BatchNorm can be *folded* into conv weights for inference
  (``fuse_conv_bn``) so the hot path is conv+SiLU only.

Every block is an ``init_*(key, ...) -> params`` / ``*_apply(params,
x) -> y`` pair. No classes, no framework magic.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# Conv-emitter variance probe knob (roofline audit follow-up): the
# S=64 step's same-shape convs run at 23-86 TF/s depending on which
# layout/emitter XLA assigns per fusion. SSYT_CONVVAR selects an
# alternative formulation for A/B measurement (tools/prof/
# _prof_convvar.py); OFF (default) in serving.
#   mm1x1   — emit ALL eligible 1x1 convs as explicit dots (matmul
#             layouts instead of the conv emitter's choice)
#   barrier — optimization_barrier between conv and its BN/SiLU
#             epilogue (splits the multiply_add fusion; isolates
#             whether the fused epilogue forces a slow conv layout)
_CONVVAR = os.environ.get("SSYT_CONVVAR", "")


def autopad(k: int, d: int = 1) -> int:
    """'same' padding for odd kernels (matches torch Conv default)."""
    k_eff = d * (k - 1) + 1
    return k_eff // 2


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


# NOTE: a Pallas conv takeover was built and MEASURED SLOWER than
# XLA's conv emitter on every eligible shape (narrow-channel stages
# are lane-bound at ~25% MXU for ANY formulation — NOTES.md round-3
# lessons). The kernel + its shootout table live in
# tools/prof/conv_kernel.py as a documented negative result; the
# product path is XLA-only.
# ---------------------------------------------------------------------------
# Conv + BN + SiLU
# ---------------------------------------------------------------------------


def init_conv(
    key: jax.Array,
    c_in: int,
    c_out: int,
    k: int = 1,
    *,
    groups: int = 1,
) -> Params:
    """Conv2d weight (HWIO) + BatchNorm params, He-initialized."""
    fan_in = c_in // groups * k * k
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (k, k, c_in // groups, c_out)) * std
    return {
        "w": w.astype(jnp.float32),
        "bn_scale": jnp.ones((c_out,), jnp.float32),
        "bn_bias": jnp.zeros((c_out,), jnp.float32),
        "bn_mean": jnp.zeros((c_out,), jnp.float32),
        "bn_var": jnp.ones((c_out,), jnp.float32),
    }


def conv_apply(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    act: bool = True,
    eps: float = 1e-3,
    pad: int | tuple[int, int] | None = None,
    mm1x1: bool = False,
) -> jnp.ndarray:
    """Conv -> BN (inference stats) -> SiLU. NHWC in/out.

    When the params were produced by ``fuse_conv_bn`` ("b" present, BN
    keys absent) the BN math is skipped entirely. ``pad`` overrides the
    'same' autopad (even kernels, e.g. the v5 6x6/2 stem uses pad=2;
    a (lo, hi) tuple applies asymmetrically to both spatial axes —
    the packed-transition 2x2 convs use (1, 0)).

    mm1x1: emit eligible 1x1 convs as an explicit (N*H*W, Cin) x
    (Cin, Cout) dot instead of lax.conv — on huge-batch tiny-spatial
    inputs (the 2048-crop OSNet stack) XLA's conv emitter picks
    batch-in-minor layouts that run at ~4% MXU; the dot form gets the
    standard matmul layouts. Same math (f32 MXU accumulation either
    way).
    """
    if "wq" in p:  # int8 PTQ params (ops/quant.quantize_model)
        from strongsort_yolo_tpu.ops import quant

        return quant.conv_int8_apply(
            p, x, stride=stride, groups=groups, dilation=dilation,
            act=act, pad=pad,
        )
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    if _CONVVAR == "mm1x1":
        mm1x1 = True
    if (
        mm1x1 and k == 1 and stride == 1 and groups == 1
        and dilation == 1
    ):
        n, hh, ww, cin = x.shape
        y = jax.lax.dot_general(
            x.reshape(n * hh * ww, cin),
            w.reshape(cin, w.shape[3]),
            (((1,), (0,)), ((), ())),
        ).reshape(n, hh, ww, w.shape[3])
        return bn_act(p, y, eps=eps, act=act)
    if pad is None:
        pad = autopad(k, dilation)
    pad2 = pad if isinstance(pad, tuple) else (pad, pad)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[pad2, pad2],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if _CONVVAR == "barrier":
        y = jax.lax.optimization_barrier(y)
    return bn_act(p, y, eps=eps, act=act)


def bn_act(
    p: Params, y: jnp.ndarray, *, eps: float = 1e-3, act: bool = True
) -> jnp.ndarray:
    """The post-conv epilogue of ``conv_apply`` (bias or BN, then SiLU)
    — for callers that build the convolution themselves (ops/stem_fuse)."""
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    else:
        scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + eps)
        bias = p["bn_bias"] - p["bn_mean"] * scale
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return silu(y) if act else y


def init_conv2d_bias(key: jax.Array, c_in: int, c_out: int, k: int = 1) -> Params:
    """Plain conv with bias (head output layers — no BN, no act)."""
    fan_in = c_in * k * k
    std = math.sqrt(1.0 / fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": (jax.random.normal(kw, (k, k, c_in, c_out)) * std).astype(jnp.float32),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def conv2d_bias_apply(p: Params, x: jnp.ndarray, *, stride: int = 1) -> jnp.ndarray:
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    pad = autopad(k)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def fuse_conv_bn(p: Params, eps: float = 1e-3) -> Params:
    """Fold BN into the conv weight/bias — inference fast path."""
    if "bn_scale" not in p:
        return p
    scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + eps)
    w = p["w"] * scale[None, None, None, :]
    b = p["bn_bias"] - p["bn_mean"] * scale
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Bottleneck / C2f / C3 / C3k2 (v8 & v11 & v5 block vocabulary)
# ---------------------------------------------------------------------------


def init_bottleneck(
    key: jax.Array, c_in: int, c_out: int, *, e: float = 0.5,
    k1: int = 3, k2: int = 3,
) -> Params:
    c_mid = int(c_out * e)
    k_a, k_b = jax.random.split(key)
    return {
        "cv1": init_conv(k_a, c_in, c_mid, k1),
        "cv2": init_conv(k_b, c_mid, c_out, k2),
    }


def bottleneck_apply(p: Params, x: jnp.ndarray, *, shortcut: bool) -> jnp.ndarray:
    y = conv_apply(p["cv1"], x)
    y = conv_apply(p["cv2"], y)
    return x + y if shortcut else y


def init_c2f(
    key: jax.Array, c_in: int, c_out: int, n: int, *, e: float = 0.5
) -> Params:
    """C2f: split-transform-concat CSP block (v8 backbone/neck unit)."""
    c_mid = int(c_out * e)
    keys = jax.random.split(key, n + 2)
    return {
        "cv1": init_conv(keys[0], c_in, 2 * c_mid, 1),
        "cv2": init_conv(keys[1], (2 + n) * c_mid, c_out, 1),
        "m": [
            init_bottleneck(keys[2 + i], c_mid, c_mid, e=1.0)
            for i in range(n)
        ],
    }


def c2f_apply(p: Params, x: jnp.ndarray, *, shortcut: bool) -> jnp.ndarray:
    y = conv_apply(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for bp in p["m"]:
        outs.append(bottleneck_apply(bp, outs[-1], shortcut=shortcut))
    return conv_apply(p["cv2"], jnp.concatenate(outs, axis=-1))


def init_c3(
    key: jax.Array, c_in: int, c_out: int, n: int, *, e: float = 0.5,
    bottleneck_k1: int = 1,
) -> Params:
    """C3: the v5-era CSP block (also the inner block of C3k2)."""
    c_mid = int(c_out * e)
    keys = jax.random.split(key, n + 3)
    return {
        "cv1": init_conv(keys[0], c_in, c_mid, 1),
        "cv2": init_conv(keys[1], c_in, c_mid, 1),
        "cv3": init_conv(keys[2], 2 * c_mid, c_out, 1),
        "m": [
            init_bottleneck(keys[3 + i], c_mid, c_mid, e=1.0, k1=bottleneck_k1)
            for i in range(n)
        ],
    }


def c3_apply(p: Params, x: jnp.ndarray, *, shortcut: bool) -> jnp.ndarray:
    a = conv_apply(p["cv1"], x)
    for bp in p["m"]:
        a = bottleneck_apply(bp, a, shortcut=shortcut)
    b = conv_apply(p["cv2"], x)
    return conv_apply(p["cv3"], jnp.concatenate([a, b], axis=-1))


def init_c3k2(
    key: jax.Array, c_in: int, c_out: int, n: int, *, c3k: bool,
    e: float = 0.5,
) -> Params:
    """C3k2 (v11): C2f whose inner units are C3k blocks when c3k=True."""
    c_mid = int(c_out * e)
    keys = jax.random.split(key, n + 2)
    if c3k:
        inner = [
            {"c3k": init_c3(keys[2 + i], c_mid, c_mid, 2, bottleneck_k1=3)}
            for i in range(n)
        ]
    else:
        inner = [
            init_bottleneck(keys[2 + i], c_mid, c_mid, e=0.5) for i in range(n)
        ]
    return {
        "cv1": init_conv(keys[0], c_in, 2 * c_mid, 1),
        "cv2": init_conv(keys[1], (2 + n) * c_mid, c_out, 1),
        "m": inner,
    }


def c3k2_apply(p: Params, x: jnp.ndarray, *, shortcut: bool) -> jnp.ndarray:
    y = conv_apply(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for bp in p["m"]:
        if "c3k" in bp:
            outs.append(c3_apply(bp["c3k"], outs[-1], shortcut=shortcut))
        else:
            outs.append(bottleneck_apply(bp, outs[-1], shortcut=shortcut))
    return conv_apply(p["cv2"], jnp.concatenate(outs, axis=-1))


# ---------------------------------------------------------------------------
# SPPF
# ---------------------------------------------------------------------------


def init_sppf(key: jax.Array, c_in: int, c_out: int) -> Params:
    c_mid = c_in // 2
    k1, k2 = jax.random.split(key)
    return {
        "cv1": init_conv(k1, c_in, c_mid, 1),
        "cv2": init_conv(k2, c_mid * 4, c_out, 1),
    }


def _maxpool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype.type(-1e30),
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def sppf_apply(p: Params, x: jnp.ndarray, *, k: int = 5) -> jnp.ndarray:
    y = conv_apply(p["cv1"], x)
    p1 = _maxpool_same(y, k)
    p2 = _maxpool_same(p1, k)
    p3 = _maxpool_same(p2, k)
    return conv_apply(p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1))


# ---------------------------------------------------------------------------
# C2PSA — v11's post-SPPF attention stage
# ---------------------------------------------------------------------------


def init_attention(key: jax.Array, dim: int, num_heads: int) -> Params:
    """Position-sensitive multi-head attention (v11 PSA block).

    qkv/proj are 1x1 convs; pe is a 3x3 depthwise positional conv.
    """
    head_dim = dim // num_heads
    key_dim = head_dim // 2
    nh_kd = key_dim * num_heads
    h = dim + nh_kd * 2
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qkv": init_conv(k1, dim, h, 1),
        "proj": init_conv(k2, dim, dim, 1),
        "pe": init_conv(k3, dim, dim, 3, groups=dim),
    }


def attention_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    n, hh, ww, c = x.shape
    # head geometry is derivable from static shapes (see init_attention)
    num_heads = max(c // 64, 1)
    head_dim = c // num_heads
    key_dim = head_dim // 2
    L = hh * ww
    qkv = conv_apply(p["qkv"], x, act=False)  # (n, h, w, 2*nh_kd + c)
    qkv = qkv.reshape(n, L, num_heads, 2 * key_dim + head_dim)
    q = qkv[..., :key_dim]
    k = qkv[..., key_dim : 2 * key_dim]
    v = qkv[..., 2 * key_dim :]
    scale = key_dim**-0.5
    attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, hh, ww, c)
    pe = conv_apply(p["pe"], v.reshape(n, hh, ww, c), act=False, groups=c)
    return conv_apply(p["proj"], out + pe, act=False)


def init_psa_block(key: jax.Array, dim: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": init_attention(k1, dim, num_heads=max(dim // 64, 1)),
        "ffn1": init_conv(k2, dim, dim * 2, 1),
        "ffn2": init_conv(k3, dim * 2, dim, 1),
    }


def psa_block_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = x + attention_apply(p["attn"], x)
    y = conv_apply(p["ffn1"], x)
    y = conv_apply(p["ffn2"], y, act=False)
    return x + y


def init_c2psa(key: jax.Array, c: int, n: int) -> Params:
    c_mid = c // 2
    keys = jax.random.split(key, n + 2)
    return {
        "cv1": init_conv(keys[0], c, 2 * c_mid, 1),
        "cv2": init_conv(keys[1], 2 * c_mid, c, 1),
        "m": [init_psa_block(keys[2 + i], c_mid) for i in range(n)],
    }


def c2psa_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = conv_apply(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    for bp in p["m"]:
        b = psa_block_apply(bp, b)
    return conv_apply(p["cv2"], jnp.concatenate([a, b], axis=-1))


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (neck top-down path)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
