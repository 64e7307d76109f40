"""Pyramidal-LK level solver as one Pallas TPU kernel.

The XLA formulation of track/gmc_tpu.py's Gauss-Newton refinement
runs ~36 sequential iterations of ~25 small HBM-level ops; under the
batched tracking step that measured ~1.6ms per iteration (58ms/step
at S=16) — every iteration re-streams the (S, h, w) planes from HBM.

Here one kernel instance solves a whole pyramid level for one stream:
the padded current frame and the previous frame live in VMEM for all
iterations; per iteration the translation window is ONE dynamic-slice
load (a VMEM copy), the 3x3 bilinear-offset taps are static slices of
it, and the 6x6 normal equations are built from 27 full-array
reductions and solved by an unrolled scalar Cholesky. vmap adds the
stream grid dimension. Measured: the full 3-level estimate dropped to
microseconds-per-stream territory (see BENCH numbers).

Math (same formulation as gmc_tpu._lk_level_xla): forward-additive LK
over a centered width-normalized affine; translation sampled
bilinearly, the small linear part linearized into the residual; hard
residual trimming; Levenberg damping. One deliberate difference: the
validity mask here is tighter at the border ([1, w-2.001] vs the XLA
path's [0, w-1.001]) because the rotate-based taps need the ±1
gradient neighbors in-bounds, so border pixels weight differently and
warps may drift slightly between backends (tests allow 0.15 px).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve6(h_mat, g_vec, damp):
    """Unrolled 6x6 Cholesky solve on scalars: H x = g.

    h_mat: 6x6 nested list of jnp scalars (symmetric PSD + damping);
    g_vec: list of 6 scalars. ~120 scalar ops, unrolled at trace time
    (Mosaic has no small-matrix linalg; a loop-lowered LU would cost
    more than the whole image pass).
    """
    a = [[h_mat[i][j] + (damp if i == j else 0.0) for j in range(6)]
         for i in range(6)]
    l = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = a[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                l[i][j] = s / l[j][j]
    # forward: L y = g
    y = [None] * 6
    for i in range(6):
        s = g_vec[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # backward: L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return x


def _refine_level(prev, cur, p0, *, h, w, m, iters):
    """Gauss-Newton refinement on one (loaded, padded) level plane
    pair — the body shared by the per-level kernel and the merged
    3-level pyramid kernel. p0: 6-tuple of scalars; returns the same.
    """
    hp, wp = prev.shape  # padded (tile-aligned) dims
    s = jnp.float32(w / 2.0)
    cx, cy = jnp.float32((w - 1) / 2.0), jnp.float32((h - 1) / 2.0)
    # int iota + convert: Mosaic has no float iota
    iy2 = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(jnp.float32)
    ix2 = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(jnp.float32)
    gxn = (ix2 - cx) / s
    gyn = (iy2 - cy) / s

    def it(_, p):
        a11, a12, tx, a21, a22, ty = p
        txp = jnp.clip(s * tx, -m, m)
        typ = jnp.clip(s * ty, -m, m)
        kx = jnp.floor(txp)
        ky = jnp.floor(typ)
        fx, fy = txp - kx, typ - ky
        # integer translation via DYNAMIC ROTATES (Mosaic dynamic
        # slices need tile-aligned offsets; rotates take any shift).
        # Circularly wrapped pixels land exactly in the region the
        # validity mask below already zeroes.
        # roll shifts must be non-negative: use (-k) mod size
        r0 = pltpu.roll(cur, (-ky.astype(jnp.int32)) % hp, 0)
        r0 = pltpu.roll(r0, (-kx.astype(jnp.int32)) % wp, 1)
        # static +-1/+2 taps: cur[i + ky + dy, j + kx + dx]
        rows = {dy: pltpu.roll(r0, (-dy) % hp, 0) if dy else r0
                for dy in (-1, 0, 1, 2)}
        taps = {
            (dy, dx): (
                pltpu.roll(rows[dy], (-dx) % wp, 1) if dx else rows[dy]
            )
            for dy in (-1, 0, 1, 2)
            for dx in (-1, 0, 1, 2)
        }

        def blend(dy, dx):
            return (
                (1 - fy) * (
                    (1 - fx) * taps[(dy, dx)] + fx * taps[(dy, dx + 1)]
                )
                + fy * (
                    (1 - fx) * taps[(dy + 1, dx)]
                    + fx * taps[(dy + 1, dx + 1)]
                )
            )

        ct = blend(0, 0)
        ixw = (blend(0, 1) - blend(0, -1)) * (0.5 * s)
        iyw = (blend(1, 0) - blend(-1, 0)) * (0.5 * s)
        valid = jnp.where(
            (ix2 + txp >= 1.0) & (ix2 + txp <= w - 2.001)
            & (iy2 + typ >= 1.0) & (iy2 + typ <= h - 2.001)
            & (ix2 <= w - 1.0) & (iy2 <= h - 1.0),  # padded region
            1.0,
            0.0,
        )
        e = (
            ct - prev
            + ((a11 - 1.0) * gxn + a12 * gyn) * ixw
            + (a21 * gxn + (a22 - 1.0) * gyn) * iyw
        )
        n_valid = jnp.sum(valid) + 1.0
        thr = jnp.maximum(3.0 * jnp.sum(jnp.abs(e) * valid) / n_valid, 40.0)
        wgt = jnp.where(jnp.abs(e) < thr, valid, 0.0)

        j0 = gxn * ixw
        j1 = gyn * ixw
        j2 = ixw
        j3 = gxn * iyw
        j4 = gyn * iyw
        j5 = iyw
        js = (j0, j1, j2, j3, j4, j5)
        h_mat = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for k in range(i + 1):
                v = jnp.sum(js[i] * js[k] * wgt)
                h_mat[i][k] = v
                h_mat[k][i] = v
        ew = e * wgt
        g_vec = [jnp.sum(js[i] * ew) for i in range(6)]
        damp = 1e-4 * (
            h_mat[0][0] + h_mat[1][1] + h_mat[2][2]
            + h_mat[3][3] + h_mat[4][4] + h_mat[5][5]
        ) / 6.0 + 1e-6
        d = _solve6(h_mat, g_vec, damp)
        return (
            a11 - d[0], a12 - d[1], tx - d[2],
            a21 - d[3], a22 - d[4], ty - d[5],
        )

    return jax.lax.fori_loop(0, iters, it, p0)


def _lk_kernel(prev_ref, cur_ref, p_ref, out_ref, *, h, w, m, iters):
    """prev_ref/cur_ref: (hp, wp) f32 zero-padded up from the TRUE
    (h, w) to sublane/lane tile multiples (Mosaic rotates need aligned
    shapes); p_ref/out_ref: (1, 8) f32 (params in [0:6]). Geometry
    (center, normalization, masks) uses the true h, w — padded pixels
    are excluded by the validity mask, and rolls only wrap values into
    already-masked regions."""
    p = tuple(p_ref[0, i] for i in range(6))
    p = _refine_level(
        prev_ref[...], cur_ref[...], p, h=h, w=w, m=m, iters=iters
    )
    out_ref[0, :] = jnp.stack(
        [p[0], p[1], p[2], p[3], p[4], p[5],
         jnp.float32(0.0), jnp.float32(0.0)]
    )


def _lk_pyramid_kernel(*refs, dims, m, iters_by_level):
    """Coarse-to-fine over ALL pyramid levels in ONE kernel call —
    three per-level calls each paid a ~250-290us in-program floor at
    S=16 (dispatch + plane DMA warmup) regardless of level size or
    iteration count; merged, the floor is paid once.

    refs: prev_L-1, cur_L-1, ..., prev_0, cur_0 (coarsest FIRST),
    then p_ref, out_ref. dims: matching list of true (h, w).
    """
    p_ref, out_ref = refs[-2], refs[-1]
    p = tuple(p_ref[0, i] for i in range(6))
    n = len(dims)
    for i in range(n):
        lvl = n - 1 - i  # level index in gmc terms (0 = finest)
        p = _refine_level(
            refs[2 * i][...], refs[2 * i + 1][...], p,
            h=dims[i][0], w=dims[i][1], m=m,
            iters=iters_by_level[min(lvl, len(iters_by_level) - 1)],
        )
    out_ref[0, :] = jnp.stack(
        [p[0], p[1], p[2], p[3], p[4], p[5],
         jnp.float32(0.0), jnp.float32(0.0)]
    )


def _pad_plane(x):
    h, w = x.shape
    hp = -(-h // 8) * 8
    wp = max(128, -(-w // 128) * 128)
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, hp - h), (0, wp - w)))
    return x.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("m", "iters_by_level", "interpret")
)
def lk_pyramid_pallas(
    pyr_prev: tuple,  # level planes, FINEST first (gmc convention)
    pyr_cur: tuple,
    params: jnp.ndarray,  # (6,) f32 normalized affine
    *,
    m: int,
    iters_by_level: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """All pyramid levels coarse-to-fine in ONE kernel call (see
    _lk_pyramid_kernel). Identical math to sequential lk_level_pallas
    calls."""
    n = len(pyr_prev)
    dims = tuple(tuple(p.shape) for p in reversed(pyr_prev))
    planes = []
    for i in range(n - 1, -1, -1):  # coarsest first
        planes.append(_pad_plane(pyr_prev[i]))
        planes.append(_pad_plane(pyr_cur[i]))
    kernel = functools.partial(
        _lk_pyramid_kernel, dims=dims, m=m,
        iters_by_level=tuple(iters_by_level),
    )
    p8 = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(params)
    total_px = sum(h * w for h, w in dims)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n + 1),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=sum(it * h * w * 60 for (h, w), it in
                      zip(dims, reversed(iters_by_level))),
            bytes_accessed=(2 * total_px + 64) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*planes, p8)
    return out[0, :6]


@functools.partial(
    jax.jit, static_argnames=("m", "iters", "interpret")
)
def lk_level_pallas(
    prev: jnp.ndarray,  # (h, w) f32 (pre-blurred)
    cur: jnp.ndarray,  # (h, w) f32 (pre-blurred)
    params: jnp.ndarray,  # (6,) f32 normalized affine
    *,
    m: int,
    iters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pyramid level of Gauss-Newton refinements, all in VMEM.
    Returns the refined (6,) params."""
    h, w = prev.shape
    hp = -(-h // 8) * 8
    wp = max(128, -(-w // 128) * 128)
    if (hp, wp) != (h, w):
        prev = jnp.pad(prev, ((0, hp - h), (0, wp - w)))
        cur = jnp.pad(cur, ((0, hp - h), (0, wp - w)))
    kernel = functools.partial(_lk_kernel, h=h, w=w, m=m, iters=iters)
    p8 = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(params)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=iters * h * w * 60,
            bytes_accessed=(2 * h * w + 64) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prev.astype(jnp.float32), cur.astype(jnp.float32), p8)
    return out[0, :6]
