"""Device-side global motion compensation — dense pyramidal LK affine.

The reference's BoT-SORT GMC (ultralytics trackers/utils/gmc.py,
``sparseOptFlow``, reached via ``tracker="botsort.yaml"`` at
/root/reference/yolo_multi_model.py:41) detects ~1000 corners and
tracks them with pyramidal Lucas-Kanade on the HOST — cv2 work that
costs ~10ms/frame of CPU and serializes with the device step. On this
repo's 1-core benchmark host it caps the reference-default botsort
config at ~100 fps while the device path runs >900.

``gmc_method="flow_tpu"`` is the TPU-native alternative: a DENSE
pyramidal forward-additive Lucas-Kanade estimator of the global
affine warp, computed entirely in-jit on a 320x180 grayscale pyramid.
Instead of sparse corners + RANSAC, every pixel votes, weighted by a
Cauchy robust loss (outliers from moving foreground objects are
down-weighted the same way RANSAC rejects them). Everything is dense
elementwise/reduction math on tiny images — microseconds of VPU time,
zero host work, zero extra host<->device transfers (it reads the same
uploaded frame the detector consumes, and the warp handle stays on
device for the jitted tracker step).

Same convention as track/gmc.py: the returned (2, 3) warp maps
previous-frame coords to current-frame coords, identity on the first
frame.
"""

from __future__ import annotations

import functools

import jax

from strongsort_yolo_tpu.ops import runtime
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

# base gray resolution (w, h); two coarser pyramid levels are derived
# by 2x average pooling
BASE_H, BASE_W = 180, 320
_LEVELS = 3
_ITERS = 12  # default/fallback Gauss-Newton step count for direct
# _lk_level calls; estimate_warp always uses _ITERS_BY_LEVEL below
# Coarse-to-fine iteration schedule, indexed by level (0 = finest).
# The coarsest level (45x80, ~nothing/iter) does the heavy motion
# search; finer levels only polish an already-converged estimate
# (Gauss-Newton is quadratic near the optimum). Round-4 trim
# (4,8,12) -> (2,5,8): IDENTICAL MOTA/IDF1/IDsw on the trained-det
# panning-clip eval at pan 6 AND 10 (tools/eval_sequence --pan ...
# --lk-iters A/B — the advisor-requested real-scene check) and every
# synthetic-motion oracle still passes; cuts LK iter-pixels 44%.
_ITERS_BY_LEVEL = (2, 5, 8)


def frame_to_gray(frame_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR uint8 -> (..., BASE_H, BASE_W) f32 gray
    (cv2 BT.601 luma), resized with the MXU matmul resampler.

    Luma + resize run in bf16 (u8 values are exact in bf16; the
    estimator's prefilter blurs away sub-lsb noise anyway) — the f32
    version cost ~1.5ms/step at S=16, half the whole GMC budget."""
    x = frame_u8.astype(jnp.bfloat16)
    # BGR weights (cv2.COLOR_BGR2GRAY)
    gray = (
        jnp.bfloat16(0.114) * x[..., 0]
        + jnp.bfloat16(0.587) * x[..., 1]
        + jnp.bfloat16(0.299) * x[..., 2]
    )
    small = resize_bilinear_matmul(gray[..., None], BASE_H, BASE_W)
    return small[..., 0].astype(jnp.float32)


def gray_from_resized(resized_bgr: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, 3) BGR float (raw 0..255 range, any compute dtype)
    -> (..., BASE_H, BASE_W) f32 gray.

    The pyramid base derived from the DETECTOR'S resized intermediate
    instead of a second full-resolution pass: the packed detect path
    already resizes the frame to letterbox scale on the MXU
    (pipeline.detect), so the luma only has to touch that small image
    (~9x less HBM traffic at 1080p; the full-res luma+resize cost
    ~0.9 ms/step at S=16 — NOTES.md round-2 backlog). Geometry is
    identical: the letterbox resize is a uniform full-frame scale, so
    base coords map to original coords with the same scale_x/scale_y.
    Numerics differ from ``frame_to_gray`` only by the two-stage
    resampling (resize-to-letterbox then resize-to-base vs one direct
    resize) — a sub-lsb difference the LK prefilter smooths out
    (equivalence asserted in test_gmc_tpu.py)."""
    x = resized_bgr.astype(jnp.bfloat16)
    gray = (
        jnp.bfloat16(0.114) * x[..., 0]
        + jnp.bfloat16(0.587) * x[..., 1]
        + jnp.bfloat16(0.299) * x[..., 2]
    )
    if gray.shape[-2:] != (BASE_H, BASE_W):
        gray = resize_bilinear_matmul(
            gray[..., None], BASE_H, BASE_W
        )[..., 0]
    return gray.astype(jnp.float32)


def _pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pool — emitted as the MXU matmul resampler: bilinear
    half-size with half-pixel centers IS the exact 2x2 mean (taps 0.5
    at rows 2i, 2i+1), and the reshape-mean form measured 310us/step
    at S=16 (layout-hostile reshape) vs the matmul's ~usec."""
    h, w = img.shape
    return resize_bilinear_matmul(img[..., None], h // 2, w // 2)[..., 0]


def _blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap binomial smoothing (edge-replicated). LK's
    linearization + bilinear resampling systematically underestimates
    motion on high-frequency content (measured ~8-10% translation
    shortfall per level unsmoothed); pre-smoothing both images removes
    the bias — the classic Lucas-Kanade prefilter."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    px = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * px[:, i : i + img.shape[1]] for i in range(5))
    py = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    return sum(k[i] * py[i : i + img.shape[0], :] for i in range(5))


def _grad(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central differences, replicated edges."""
    px = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    py = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    ix = (px[:, 2:] - px[:, :-2]) * 0.5
    iy = (py[2:, :] - py[:-2, :]) * 0.5
    return ix, iy


def _sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """Bilinear sample + in-bounds mask. img (h, w); coords any shape."""
    h, w = img.shape
    valid = (
        (xs >= 0.0) & (xs <= w - 1.001) & (ys >= 0.0) & (ys <= h - 1.001)
    )
    xc = jnp.clip(xs, 0.0, w - 1.001)
    yc = jnp.clip(ys, 0.0, h - 1.001)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    fx = xc - x0
    fy = yc - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = img.reshape(-1)
    base = y0 * w + x0
    v00 = flat[base]
    v01 = flat[base + 1]
    v10 = flat[base + w]
    v11 = flat[base + w + 1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy, valid.astype(jnp.float32)


_MAX_SHIFT = 32  # max per-level translation, level pixels


def _lk_level(prev, cur, params, method: str | None = None,
              iters: int = _ITERS):
    """Backend dispatch: the Pallas VMEM-resident kernel on TPU
    (ops/pallas/lk_kernel.py — the XLA lowering re-streams every
    plane from HBM for each of the ~36 Gauss-Newton iterations), the
    plain XLA version elsewhere. Identical math."""
    if method is None:
        method = "pallas" if runtime.target_platform() == "tpu" else "xla"
    if method.startswith("pallas"):
        from strongsort_yolo_tpu.ops.pallas.lk_kernel import (
            lk_level_pallas,
        )

        return lk_level_pallas(
            prev, cur, jnp.asarray(params), m=_MAX_SHIFT, iters=iters,
            interpret=(method == "pallas_interpret"),
        )
    return _lk_level_xla(prev, cur, params, iters=iters)


def _lk_level_xla(prev, cur, params, iters: int = _ITERS):
    """Refine affine params on one pyramid level (forward-additive
    Gauss-Newton LK).

    params are in CENTERED, WIDTH-NORMALIZED coordinates
    (xn = (x - cx) / (w/2)): this keeps the 6x6 normal equations
    well-conditioned in f32 — with raw pixel coordinates the
    coordinate-coupled entries are ~1e4x the translation entries and
    ``solve`` returns steps ~100x too small in the translation
    subspace (measured: convergence crawled at ~1%/iteration).
    Normalized params are also LEVEL-INVARIANT, so pyramid
    propagation needs no rescaling.

    TPU-critical detail: the warp is sampled as TRANSLATION-ONLY
    (four ``dynamic_slice``s + bilinear blend — contiguous copies),
    and the small linear part (rotation/zoom, |A-I| ~ 1e-2 in GMC)
    enters the residual LINEARIZED via the gradient images. Per-pixel
    gather-based affine sampling scalarizes inside the fused tracking
    program (measured 112ms per gather pass at S=16 — 1000x the cost
    of the whole estimator); dynamic slices lower to plain VMEM
    copies. The linearization error is second-order in the linear
    part's corner displacement (<2px blurred), far below GMC needs.
    """
    h, w = prev.shape
    s = jnp.float32(w / 2.0)
    cx, cy = jnp.float32((w - 1) / 2.0), jnp.float32((h - 1) / 2.0)
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    gxn = (gx - cx) / s
    gyn = (gy - cy) / s
    m = _MAX_SHIFT
    padded = jnp.pad(cur, ((m + 1, m + 1), (m + 1, m + 1)))
    jx = jnp.arange(w, dtype=jnp.float32)
    jy = jnp.arange(h, dtype=jnp.float32)

    def it(_, p):
        a11, a12, tx, a21, a22, ty = (p[i] for i in range(6))
        # translation at the image center, level pixels
        txp = jnp.clip(s * tx, -m, m)
        typ = jnp.clip(s * ty, -m, m)
        kx = jnp.floor(txp)
        ky = jnp.floor(typ)
        fx, fy = txp - kx, typ - ky
        oy = (ky + (m + 1)).astype(jnp.int32)
        ox = (kx + (m + 1)).astype(jnp.int32)
        c00 = jax.lax.dynamic_slice(padded, (oy, ox), (h, w))
        c01 = jax.lax.dynamic_slice(padded, (oy, ox + 1), (h, w))
        c10 = jax.lax.dynamic_slice(padded, (oy + 1, ox), (h, w))
        c11 = jax.lax.dynamic_slice(padded, (oy + 1, ox + 1), (h, w))
        ct = (
            (1 - fy) * ((1 - fx) * c00 + fx * c01)
            + fy * ((1 - fx) * c10 + fx * c11)
        )
        valid = (
            ((jx + txp >= 0.0) & (jx + txp <= w - 1.001))[None, :]
            & ((jy + typ >= 0.0) & (jy + typ <= h - 1.001))[:, None]
        ).astype(jnp.float32)
        ixw, iyw = _grad(ct)
        # gradient w.r.t. the NORMALIZED params
        ixw = ixw * s
        iyw = iyw * s
        # residual of the model cur(p + T + la(p)) with the linear
        # displacement la applied via first-order expansion
        e = (
            ct - prev
            + ((a11 - 1.0) * gxn + a12 * gyn) * ixw
            + (a21 * gxn + (a22 - 1.0) * gyn) * iyw
        )
        # Robustness by hard TRIMMING, not smooth reweighting: a
        # Cauchy/Huber weight continuously downweights the highest-
        # gradient pixels — exactly the informative ones — and biases
        # the converged fixpoint (measured 8-15% translation
        # underestimate on clean synthetic pans). Trimming keeps every
        # inlier at weight 1 (unbiased Gauss-Newton) and zeroes gross
        # outliers (moving foreground — the job RANSAC does in the
        # sparse host GMC). Threshold: 3x the mean |residual|, floored
        # at 40 gray levels so a well-aligned frame trims nothing.
        thr = jnp.maximum(
            3.0 * jnp.sum(jnp.abs(e) * valid) / (jnp.sum(valid) + 1.0),
            40.0,
        )
        wgt = valid * (jnp.abs(e) < thr).astype(jnp.float32)
        j = jnp.stack(
            [gxn * ixw, gyn * ixw, ixw, gxn * iyw, gyn * iyw, iyw]
        )  # (6, h, w)
        jw = j * wgt
        hmat = jnp.einsum(
            "khw,lhw->kl", jw, j,
            precision=jax.lax.Precision.HIGHEST,
        )
        g = jnp.einsum(
            "khw,hw->k", jw, e, precision=jax.lax.Precision.HIGHEST
        )
        # Levenberg damping keeps low-texture frames near identity
        damp = 1e-4 * jnp.trace(hmat) / 6.0 + 1e-6
        delta = jnp.linalg.solve(
            hmat + damp * jnp.eye(6, dtype=jnp.float32), g
        )
        return p - delta

    return jax.lax.fori_loop(0, iters, it, params)


@functools.partial(
    jax.jit, static_argnames=("scale_x", "scale_y", "method")
)
def estimate_warp(
    prev_gray: jnp.ndarray,
    cur_gray: jnp.ndarray,
    *,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    method: str | None = None,
) -> jnp.ndarray:
    """(BASE_H, BASE_W) grays -> (2, 3) affine warp prev->cur in
    ORIGINAL frame coords (scale_* = original/base pixel ratios)."""
    pyr_p = [prev_gray]
    pyr_c = [cur_gray]
    for _ in range(_LEVELS - 1):
        pyr_p.append(_pool2(pyr_p[-1]))
        pyr_c.append(_pool2(pyr_c[-1]))

    params = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)
    if method is None:
        method = "pallas" if runtime.target_platform() == "tpu" else "xla"
    if method.startswith("pallas"):
        # ALL levels coarse-to-fine in ONE kernel call: three per-level
        # calls paid ~250-290us each at S=16 regardless of level size
        # (in-program dispatch/DMA floor — _prof_cfgtrace flowbatch)
        from strongsort_yolo_tpu.ops.pallas.lk_kernel import (
            lk_pyramid_pallas,
        )

        params = lk_pyramid_pallas(
            tuple(_blur(p) for p in pyr_p),
            tuple(_blur(c) for c in pyr_c),
            params,
            m=_MAX_SHIFT,
            iters_by_level=tuple(_ITERS_BY_LEVEL),
            interpret=(method == "pallas_interpret"),
        )
    else:
        for lvl in range(_LEVELS - 1, -1, -1):
            # params are centered width-normalized (_lk_level) and thus
            # LEVEL-INVARIANT: coarse-to-fine needs no rescaling
            params = _lk_level(
                _blur(pyr_p[lvl]), _blur(pyr_c[lvl]), params, method=method,
                iters=_ITERS_BY_LEVEL[min(lvl, len(_ITERS_BY_LEVEL) - 1)],
            )

    a11, a12, tx, a21, a22, ty = (params[i] for i in range(6))
    # normalized -> base pixel coords
    s = BASE_W / 2.0
    cx, cy = (BASE_W - 1) / 2.0, (BASE_H - 1) / 2.0
    tpx = s * tx + cx - a11 * cx - a12 * cy
    tpy = s * ty + cy - a21 * cx - a22 * cy
    # conjugate by the base->original scaling S = diag(sx, sy)
    sx, sy = jnp.float32(scale_x), jnp.float32(scale_y)
    return jnp.stack(
        [
            jnp.stack([a11, a12 * sx / sy, tpx * sx]),
            jnp.stack([a21 * sy / sx, a22, tpy * sy]),
        ]
    )


class FlowTpuGMC:
    """Drop-in GMC with the track/gmc.py protocol, state on device.

    ``apply_device`` takes the already-uploaded frame and returns a
    device (2, 3) warp handle WITHOUT synchronizing — the sequential
    track path feeds it straight into the jitted step, so GMC adds one
    small async dispatch and zero host work. ``apply`` is the
    np-compatible wrapper used by offline chunk paths.
    """

    method = "flow_tpu"

    def __init__(self, src_hw: tuple[int, int] | None = None):
        self._prev: jnp.ndarray | None = None

    def reset(self) -> None:
        self._prev = None

    def apply_device(self, frame_u8: jnp.ndarray) -> jnp.ndarray:
        src_h, src_w = frame_u8.shape[-3], frame_u8.shape[-2]
        gray = frame_to_gray(frame_u8)
        prev, self._prev = self._prev, gray
        if prev is None:
            return jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32
            )
        return estimate_warp(
            prev, gray,
            scale_x=src_w / BASE_W, scale_y=src_h / BASE_H,
        )

    def apply(self, frame_bgr: np.ndarray) -> np.ndarray:
        return np.asarray(self.apply_device(jnp.asarray(frame_bgr)))


def batched_warps(
    prev_grays: jnp.ndarray | None,
    cur_grays: jnp.ndarray,
    src_hw: tuple[int, int],
    has_prev: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(S, BASE_H, BASE_W) pyramidal LK for every stream in one
    dispatch -> (S, 2, 3). Identity when prev_grays is None; per
    stream, identity where ``has_prev`` is False (fresh/reset
    streams)."""
    s = cur_grays.shape[0]
    ident = jnp.tile(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32),
        (s, 1, 1),
    )
    if prev_grays is None:
        return ident
    src_h, src_w = src_hw
    est = jax.vmap(
        lambda p, c: estimate_warp(
            p, c, scale_x=src_w / BASE_W, scale_y=src_h / BASE_H
        )
    )(prev_grays, cur_grays)
    if has_prev is None:
        return est
    return jnp.where(has_prev[:, None, None], est, ident)
