"""Fused OSNet stage kernels: one VMEM-resident Pallas program per
backbone stage (b2a+b2b+t2+pool / b3a+b3b+t3+pool / b4a+b4b+conv5+GAP).

** MEASURED NEGATIVE — OFF BY DEFAULT (SSYT_OSNET=fused re-enables). **
In-step A/B on the v5e (tools/prof/_prof_osnet_step_ab.py, StrongSORT
fixed128, interleaved blocks): S=16 XLA 834 vs fused 428 fps/chip,
S=32 840 vs 447 — the kernel DOUBLES the step. Postmortem (NOTES
round-5): OSNet-x0_25's ten depthwise 3x3 chains are a VPU
*instruction-count* floor, not an HBM floor — ~9 taps x ~4 vector ops
over every activation element is ~4.5-5 ms at G=2048 no matter who
schedules it, and XLA's conv emitter already runs within ~1.5x of
that floor in its own (W,C)-packed layouts while fusing the HBM
traffic well enough. This kernel reaches the same stencil floor plus
kron'd-pointwise and gate overhead, so it can only lose. Kept (with
its exactness tests) as the record of the two layouts tried — a
stream-packed (TM,H,W,4mid) variant (failed: 128-lane padding at
mid=16..32 wastes 2-8x VPU) and the channels-on-rows variant below.
The honest ReID-cost levers remain embed WIDTH (auto_topk packed
buckets) and embed CADENCE, both shipped round 5.

Original design rationale (why it SHOULD have won, and why it did
not): the XLA OS-block graph traverses the (G, H, W, C) crop
activations ~30 times per block — conv1, ten lite-conv chains (each a
pointwise matmul + depthwise 3x3 + BN), four gate reductions, the
aggregation adds, conv3 and the residual. At the serving buckets
(G = 1024..4096) every traversal is an HBM round-trip, and the
depthwise stencils run at OSNet-x0_25's tiny channel counts
(mid = 16..32 of 128 lanes — up to 8x VPU padding waste). These
kernels hold a TM-crop tile of the ENTIRE stage in VMEM and fix both
with a TPU-native layout choice:

CHANNELS-ON-ROWS: every tensor lives as a 2-D (TM*C, H*W) array —
the row-major view of (TM, C, H, W). Consequences:

- The depthwise 3x3 becomes NINE LANE-SHIFTS at full occupancy:
  tap (dy, dx) reads lane l + dy*W + dx; the H/W border masks are a
  per-tap constant lane vector and the BN-scaled tap weight is a
  per-row constant column (c = row % mid), both precomputed at trace
  time. Minimal stencil work — no lane padding, no dead lanes
  (stage-2/3 spatial is 512/128 lanes; only the tiny 8x4 stage pads).
- Pointwise convs become LEFT matmuls kron(I_TM, w^T) @ x: a TM-fold
  FLOP redundancy (TM = 8) on the cheapest ops in the block, in
  exchange for ZERO relayouts anywhere in the kernel.
- The aggregation gate is a lane mean (spatial IS the lane axis), two
  tiny dots, and a per-row rescale; 2x2 avg-pool and conv5+GAP are
  single constant fold-matrix matmuls on the lane axis.
- Stages CHAIN in this layout: the pooled output (TM*C', H'*W') is
  exactly the next stage's input block — one (0,3,1,2) transpose at
  kernel entry (XLA, once, on the small post-maxpool tensor) and none
  anywhere else.

The four OS streams run as sequential chains (torchreid semantics,
minimal stencil work); BN folds at trace time (eps=BN_EPS); dots
accumulate f32. Exactness vs the XLA oracle
(models/osnet._os_block_apply) is asserted in
tests/test_osnet_kernel.py (f32 tight, bf16 by embedding cosine).

Reference parity: torchreid OSNet ``OSBlock`` semantics as rebuilt in
models/osnet.py (the reference consumes it as StrongSORT's appearance
embedder, /root/reference/yolo_multi_model.py:41 context).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Host-side (trace-time) weight folding
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StageSpec:
    h: int          # input spatial of the stage
    w: int
    c_in: int
    c_out: int
    mid: int
    epilogue: str   # "pool" (1x1+BN+ReLU then 2x2 avg) | "gap" (conv5+GAP)

    @property
    def out_shape(self) -> tuple[int, ...]:
        if self.epilogue == "gap":
            return (self.c_out,)
        return (self.h // 2, self.w // 2, self.c_out)


def _fold_bn(p, eps=BN_EPS):
    """conv params -> (w2d, bias) with BN (or plain bias) folded."""
    w = p["w"]
    assert w.shape[0] == 1 and w.shape[1] == 1, w.shape
    w = w[0, 0]  # (c_in, c_out)
    if "b" in p:
        return w, p["b"]
    scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + eps)
    return w * scale[None, :], p["bn_bias"] - p["bn_mean"] * scale


def _kron_left(w2d, tm: int, wdtype):
    """kron(I_tm, w2d.T): left-matmul form of a pointwise conv in the
    channels-on-rows layout — (tm*co, tm*ci)."""
    ci, co = w2d.shape
    out = jnp.zeros((tm, co, tm, ci), w2d.dtype)
    idx = jnp.arange(tm)
    out = out.at[idx, :, idx, :].set(
        jnp.broadcast_to(w2d.T, (tm, co, ci))
    )
    return out.reshape(tm * co, tm * ci).astype(wdtype)


def _col(b, tm: int):
    """(c,) bias -> (tm*c, 1) per-row column."""
    return jnp.tile(b, tm).reshape(-1, 1)


def _lane_masks(h: int, w: int) -> np.ndarray:
    """(9, h*w) f32 border masks: tap (dy, dx) is valid at lane
    l = y*w + x iff (y+dy, x+dx) stays inside the crop."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((9, h * w), np.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ok = ((yy + dy >= 0) & (yy + dy < h)
                  & (xx + dx >= 0) & (xx + dx < w))
            out[(dy + 1) * 3 + (dx + 1)] = ok.reshape(-1)
    return out


def fold_lite(lc, tm: int, *, wdtype) -> dict:
    """LightConv3x3 -> kron pointwise + per-row tap columns."""
    wp, bp = _fold_bn(lc["pw"])
    dw = lc["dw"]
    scale = dw["bn_scale"] * jax.lax.rsqrt(dw["bn_var"] + BN_EPS)
    dww = dw["w"][:, :, 0, :] * scale[None, None, :]   # (3, 3, mid)
    dwb = dw["bn_bias"] - dw["bn_mean"] * scale
    return {
        "pw": _kron_left(wp, tm, wdtype),
        "pwb": _col(bp, tm),
        # (9, tm*mid, 1) per-row tap weights (c = row % mid)
        "taps": jnp.tile(
            dww.reshape(9, -1), (1, tm)
        )[:, :, None].astype(jnp.float32),
        "dwb": _col(dwb, tm),
    }


def fold_os_block(p, tm: int, *, wdtype) -> dict:
    """models/osnet._init_os_block params -> channels-on-rows arrays."""
    w1, b1 = _fold_bn(p["conv1"])
    w3, b3 = _fold_bn(p["conv3"])
    out = {
        "w1": _kron_left(w1, tm, wdtype),
        "b1": _col(b1, tm),
        "streams": [
            [fold_lite(lc, tm, wdtype=wdtype) for lc in chain]
            for chain in p["streams"]
        ],
        # gate fcs in kron'd COLUMN form: the whole gate runs on
        # (tm*c, 1) columns — no lane<->row reshapes in-kernel
        "g1": _kron_left(p["gate"]["fc1"]["w"][0, 0], tm, wdtype),
        "g1b": _col(p["gate"]["fc1"]["b"], tm),
        "g2": _kron_left(p["gate"]["fc2"]["w"][0, 0], tm, wdtype),
        "g2b": _col(p["gate"]["fc2"]["b"], tm),
        "w3": _kron_left(w3, tm, wdtype),
        "b3": _col(b3, tm),
    }
    if "down" in p:
        wd, bd = _fold_bn(p["down"])
        out["wd"] = _kron_left(wd, tm, wdtype)
        out["bd"] = _col(bd, tm)
    return out


def fold_stage(pa, pb, ep, spec: StageSpec, *, wdtype, tm: int = 8):
    """Fold two OS blocks + the epilogue of one backbone stage."""
    we, be = _fold_bn(ep)
    h, w = spec.h, spec.w
    out = {
        "a": fold_os_block(pa, tm, wdtype=wdtype),
        "b": fold_os_block(pb, tm, wdtype=wdtype),
        "ep_w": _kron_left(we, tm, wdtype),
        "ep_b": _col(be, tm),
        "masks": jnp.asarray(_lane_masks(h, w))[:, None, :],
    }
    if spec.epilogue != "gap":
        # 2x2 avg pool as a constant lane-fold matrix (h*w, h*w/4)
        m = np.zeros((h * w, (h // 2) * (w // 2)), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        src = (yy * w + xx).reshape(-1)
        dst = ((yy // 2) * (w // 2) + xx // 2).reshape(-1)
        m[src, dst] = 0.25
        out["fold"] = jnp.asarray(m).astype(wdtype)
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _ldot(k, x, b=None):
    """Left pointwise conv: (R_out, R_in) @ (R_in, L) + (R_out, 1)."""
    y = jax.lax.dot(k, x, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


def _laneshift(x, k):
    """out[:, l] = x[:, l + k], zero lanes shifted in."""
    if k == 0:
        return x
    z = jnp.zeros((x.shape[0], abs(k)), x.dtype)
    if k > 0:
        return jnp.concatenate([x[:, k:], z], axis=1)
    return jnp.concatenate([z, x[:, :k]], axis=1)


def _lite(x, lw, masks, w_sp: int, dtype):
    """One LightConv3x3: kron pointwise dot, then the 9-tap stencil —
    tap (dy, dx) = lane shift by dy*W+dx, x per-tap border lane mask,
    x per-row BN-scaled tap weight."""
    s = _ldot(lw["pw"], x, lw["pwb"]).astype(dtype)
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            i = (dy + 1) * 3 + (dx + 1)
            t = (_laneshift(s, dy * w_sp + dx).astype(jnp.float32)
                 * masks[i] * lw["taps"][i])
            acc = t if acc is None else acc + t
    return jax.nn.relu(acc + lw["dwb"]).astype(dtype)


def _os_block_body(x, w, masks, spec: StageSpec, tm: int, dtype):
    """One OS block on the (TM*C, H*W) tile; mirrors
    models/osnet._os_block_apply (sequential stream chains)."""
    mid = spec.mid
    y = jax.nn.relu(_ldot(w["w1"], x, w["b1"])).astype(dtype)
    agg = None
    for chain in w["streams"]:
        s = y
        for lw in chain:
            s = _lite(s, lw, masks, spec.w, dtype)
        # shared aggregation gate, entirely in column space: the
        # spatial mean IS the lane mean, fc1/fc2 are kron'd left dots
        m = jnp.mean(s.astype(jnp.float32), axis=1, keepdims=True)
        a = jax.nn.relu(_ldot(w["g1"], m.astype(dtype), w["g1b"]))
        g = jax.nn.sigmoid(_ldot(w["g2"], a.astype(dtype), w["g2b"]))
        gs = s * g.astype(dtype)
        agg = gs if agg is None else agg + gs
    out = _ldot(w["w3"], agg, w["b3"])
    if "wd" in w:
        res = _ldot(w["wd"], x, w["bd"])
    else:
        res = x.astype(jnp.float32)
    return jax.nn.relu(out + res).astype(dtype)


def _stage_kernel(x_ref, *refs, treedef, spec: StageSpec, tm: int):
    *w_refs, out_ref = refs
    w = jax.tree.unflatten(treedef, [r[...] for r in w_refs])
    dtype = x_ref.dtype
    masks = w["masks"]  # (9, 1, H*W)
    x = x_ref[...]
    x = _os_block_body(x, w["a"], masks, spec, tm, dtype)
    x = _os_block_body(x, w["b"], masks, spec, tm, dtype)
    y = jax.nn.relu(_ldot(w["ep_w"], x, w["ep_b"])).astype(dtype)
    if spec.epilogue == "gap":
        # (tm*c4, 1) column; the (G, c4) view happens outside
        out_ref[...] = jnp.mean(
            y.astype(jnp.float32), axis=1, keepdims=True
        ).astype(dtype)
    else:
        out_ref[...] = jax.lax.dot(
            y, w["fold"], preferred_element_type=jnp.float32
        ).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("spec", "tm", "interpret")
)
def os_stage(
    x: jnp.ndarray,        # (G, c_in, H, W) channel-major, compute dtype
    folded: dict,          # fold_stage output (same tm)
    *,
    spec: StageSpec,
    tm: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused backbone stage -> pooled stage output
    ((G, c_out, H/2, W/2) channel-major, or (G, c_out) for GAP).

    HBM traffic: read x once, write the pooled output once; every
    intermediate of both OS blocks and the transition lives in VMEM
    in the channels-on-rows (TM*C, H*W) layout."""
    g = x.shape[0]
    assert x.shape == (g, spec.c_in, spec.h, spec.w), (x.shape, spec)
    assert g % tm == 0, (g, tm)
    leaves, treedef = jax.tree.flatten(folded)

    x2 = x.reshape(g * spec.c_in, spec.h * spec.w)  # pure view
    if spec.epilogue == "gap":
        out2d = (g * spec.c_out, 1)
        blk = (tm * spec.c_out, 1)
    else:
        h2, w2, co = spec.out_shape
        out2d = (g * co, h2 * w2)
        blk = (tm * co, h2 * w2)
    w_specs = [
        pl.BlockSpec(
            l.shape, functools.partial(lambda nd, i: (0,) * nd, l.ndim),
            memory_space=pltpu.VMEM,
        )
        for l in leaves
    ]
    kernel = functools.partial(
        _stage_kernel, treedef=treedef, spec=spec, tm=tm
    )
    out = pl.pallas_call(
        kernel,
        grid=(g // tm,),
        in_specs=[
            pl.BlockSpec(
                (tm * spec.c_in, spec.h * spec.w),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out2d, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x2, *leaves)
    if spec.epilogue == "gap":
        return out.reshape(g, spec.c_out)
    h2, w2, co = spec.out_shape
    return out.reshape(g, co, h2, w2)


def stage_specs(channels: tuple[int, int, int, int], crop_hw=(128, 64)):
    """The three backbone stages for an OSNet config (post stem+pool
    spatial = crop/4)."""
    c1, c2, c3, c4 = channels
    h, w = crop_hw[0] // 4, crop_hw[1] // 4
    return (
        StageSpec(h, w, c1, c2, c2 // 4, "pool"),
        StageSpec(h // 2, w // 2, c2, c3, c3 // 4, "pool"),
        StageSpec(h // 4, w // 4, c3, c4, c4 // 4, "gap"),
    )
