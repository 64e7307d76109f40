"""Post-training int8 quantization for the fused conv stack.

v5e's int8 MXU peak is 2x bf16 (VERDICT r3 ask #2 — the one untouched
lever on the ~30% MFU ceiling). Scheme (standard TPU serving PTQ):

- weights: symmetric per-output-channel int8
  (``wscale[c] = max|w[..., c]| / 127``), quantized once offline by
  :func:`quantize_model`;
- activations: symmetric per-tensor DYNAMIC int8 — the scale is the
  tensor's abs-max computed in the step (one fused reduction; no
  calibration corpus needed, and the scale tracks the load exactly);
- accumulation in int32 on the MXU, dequant + bias + SiLU in f32,
  cast back to the compute dtype (one rounding, same epilogue
  structure as the bf16 path).

Routing: models/common.conv_apply dispatches here when the param dict
carries ``wq`` (i.e. after quantize_model). The head output layers
(final box/cls/obj projections) are left in bf16 by default — their
logits feed decode thresholds directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_conv(p: dict) -> dict:
    """{"w" (k,k,ci,co), "b"} fused-conv params -> int8 param dict
    {"wq", "wscale", "b"} (drops the float weight)."""
    w = jnp.asarray(p["w"], jnp.float32)
    wscale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / wscale), -127, 127).astype(jnp.int8)
    out = dict(p)
    out.pop("w")
    out["wq"] = wq
    out["wscale"] = wscale.astype(jnp.float32)
    return out


def conv_int8_apply(
    p: dict,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    act: bool = True,
    pad=None,
) -> jnp.ndarray:
    """Dynamic-activation int8 conv + bias (+SiLU). NHWC in/out, output
    in x.dtype."""
    from strongsort_yolo_tpu.models.common import autopad, silu

    k = p["wq"].shape[0]
    if pad is None:
        pad = autopad(k, dilation)
    pad2 = pad if isinstance(pad, tuple) else (pad, pad)
    if "xscale" in p:
        # static calibrated scale (calibrate_scales): the quantize is
        # a pure elementwise chain XLA fuses into the producer — no
        # extra reduction pass over x
        xscale = p["xscale"].astype(jnp.float32)
    else:
        # dynamic per-tensor scale: one extra abs-max pass over x
        # (measured -19% on the S=64 step vs bf16 — calibrate instead)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        xscale = jnp.maximum(amax, 1e-6) / 127.0
    if _CALIB is not None:  # eager calibration pass (calibrate_scales)
        cur = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        key = id(p["wq"])
        _CALIB[key] = max(_CALIB.get(key, 0.0), cur)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / xscale), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        p["wq"],
        window_strides=(stride, stride),
        padding=[pad2, pad2],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xscale * p["wscale"])
    y = y + p["b"].astype(jnp.float32)
    y = silu(y) if act else y
    return y.astype(x.dtype)


_CALIB: dict | None = None


def calibrate_scales(apply_fn, frames) -> None:
    """Run ``apply_fn(frame)`` eagerly for each calibration frame with
    activation recording on; then call :func:`inject_scales` on the
    quantized tree. ``apply_fn`` must execute the QUANTIZED model
    (conv_int8_apply records each quantized conv's input abs-max,
    keyed by the identity of its weight array)."""
    global _CALIB
    _CALIB = {}
    try:
        with jax.disable_jit():
            for f in frames:
                apply_fn(f)
    finally:
        stats, _CALIB = _CALIB, None
    return stats


def inject_scales(params, stats: dict, *, headroom: float = 1.0):
    """Write static ``xscale`` leaves into the quantized tree from a
    calibrate_scales() stats dict (amax keyed by id(wq))."""
    n = [0]

    def walk(node):
        if isinstance(node, dict):
            if "wq" in node and id(node["wq"]) in stats:
                out = dict(node)
                amax = max(stats[id(node["wq"])], 1e-6) * headroom
                out["xscale"] = jnp.float32(amax / 127.0)
                n[0] += 1
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v) for v in node]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return node

    return walk(params), n[0]


def _is_fused_conv(node) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and "b" in node
        and getattr(node["w"], "ndim", 0) == 4
    )


def quantize_model(
    params,
    *,
    skip_paths: tuple[str, ...] = (
        "detect", "head", "proto", "seg", "kpt",
        # the packed-prefix layers (ops/pack re-indexes their float
        # weights at trace time on TPU), which are also exactly the
        # narrow lane-bound stages where int8 measured ~nothing
        # (tools/prof/_prof_int8.py: 32-ch k3 18.2 -> 19.1 TF/s)
        "/stem", "/down1", "/stage1", "/down2", "/stage2",
    ),
    min_kk: int = 1,
) -> tuple:
    """Walk a FUSED param tree (fuse_conv_bn already applied) and
    quantize every conv whose path does not contain a skip marker.
    Defaults: the detect/seg/pose head stays bf16 (its logits feed
    decode thresholds directly) and the packed-prefix narrow stages
    stay bf16 (see inline note); the deep backbone (stage3+, sppf) and
    the neck — the wide compute-bound layers where int8 measured
    +40-63% — quantize.

    -> (quantized tree, number of convs quantized)."""
    n = [0]

    def walk(node, path):
        if _is_fused_conv(node) and not any(
            s in path for s in skip_paths
        ):
            if node["w"].shape[0] >= min_kk:
                n[0] += 1
                return quantize_conv(node)
            return node
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return node

    return walk(params, ""), n[0]
