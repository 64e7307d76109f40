"""Constant-velocity Kalman filters for track motion, vmapped over slots.

Re-implements (from the DeepSORT/ByteTrack/BoT-SORT literature and the
ultralytics behavior surface — SURVEY.md D11/H3) the three filter
variants the capability set needs:

- XYAH: 8-state over (cx, cy, aspect, h, velocities) — ByteTrack /
  DeepSORT form (``trackers/utils/kalman_filter.KalmanFilterXYAH``).
- XYWH: same but (cx, cy, w, h) — BoT-SORT form.
- NSA (StrongSORT): XYAH/XYWH with measurement noise scaled by
  detection confidence, ``R̃ = (1 - conf) · R``.

Everything is batched: means are (K, 8), covariances (K, 8, 8), and
predict/update are dense 8×8 matrix algebra that XLA fuses and runs on
the MXU for all K slots at once — there is no per-track Python loop
anywhere (the reference stack iterates tracks in Python inside
STrack.multi_predict).

Noise scales follow the standard DeepSORT weights:
std_weight_position = 1/20, std_weight_velocity = 1/160.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# KF algebra is tiny f32 matrix math: force full-precision multiplies
# (DEFAULT matmul precision uses bf16 passes on TPU and fast paths on
# some CPU backends, which visibly corrupts covariance updates).
_HI = jax.lax.Precision.HIGHEST

STD_POS = 1.0 / 20
STD_VEL = 1.0 / 160

# forms
XYAH = "xyah"
XYWH = "xywh"


def _motion_matrix() -> jnp.ndarray:
    f = jnp.eye(8)
    return f.at[:4, 4:].set(jnp.eye(4))


def _size_proxy(mean4: jnp.ndarray, form: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-component noise scale bases (w-like, h-like)."""
    if form == XYWH:
        return mean4[..., 2], mean4[..., 3]
    # xyah: everything scales with h; aspect gets constant tiny noise
    return mean4[..., 3], mean4[..., 3]


def _pos_std(mean4: jnp.ndarray, form: str, w_pos: float) -> jnp.ndarray:
    w, h = _size_proxy(mean4, form)
    if form == XYWH:
        return jnp.stack([w_pos * w, w_pos * h, w_pos * w, w_pos * h], -1)
    const = jnp.full_like(w, 1e-2)
    return jnp.stack([w_pos * h, w_pos * h, const, w_pos * h], -1)


def _vel_std(mean4: jnp.ndarray, form: str, w_vel: float) -> jnp.ndarray:
    w, h = _size_proxy(mean4, form)
    if form == XYWH:
        return jnp.stack([w_vel * w, w_vel * h, w_vel * w, w_vel * h], -1)
    const = jnp.full_like(w, 1e-5)
    return jnp.stack([w_vel * h, w_vel * h, const, w_vel * h], -1)


def initiate(measurement: jnp.ndarray, form: str = XYWH):
    """New-track state from an unassociated measurement.

    measurement: (..., 4). Returns mean (..., 8), cov (..., 8, 8).
    """
    zeros = jnp.zeros_like(measurement)
    mean = jnp.concatenate([measurement, zeros], axis=-1)
    std_pos = 2.0 * _pos_std(measurement, form, STD_POS)
    std_vel = 10.0 * _vel_std(measurement, form, STD_VEL)
    std = jnp.concatenate([std_pos, std_vel], axis=-1)
    cov = jnp.zeros((*measurement.shape[:-1], 8, 8)) + (
        std[..., :, None] ** 2
    ) * jnp.eye(8)
    return mean, cov


def predict(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    form: str = XYWH,
    *,
    still_mask: jnp.ndarray | None = None,
):
    """KF time update. mean (..., 8), cov (..., 8, 8).

    still_mask: optional (...,) bool — tracks not currently 'Tracked'
    get their size-velocity components zeroed before predicting, the
    ByteTrack multi_predict behavior for lost tracks.
    """
    if still_mask is not None:
        damp = jnp.where(still_mask[..., None], 0.0, 1.0)
        mean = mean.at[..., 6:8].multiply(damp)
    std_pos = _pos_std(mean[..., :4], form, STD_POS)
    std_vel = _vel_std(mean[..., :4], form, STD_VEL)
    q_diag = jnp.concatenate([std_pos, std_vel], axis=-1) ** 2
    # F = [[I, I], [0, I]] is structured — expand F P Fᵀ in closed form
    # (pure adds on 4x4 blocks) instead of batched 8x8 matmuls, which
    # XLA handles poorly at this size.
    new_mean = jnp.concatenate(
        [mean[..., :4] + mean[..., 4:], mean[..., 4:]], axis=-1
    )
    p11 = cov[..., :4, :4]
    p12 = cov[..., :4, 4:]
    p21 = cov[..., 4:, :4]
    p22 = cov[..., 4:, 4:]
    top = jnp.concatenate([p11 + p12 + p21 + p22, p12 + p22], axis=-1)
    bot = jnp.concatenate([p21 + p22, p22], axis=-1)
    new_cov = jnp.concatenate([top, bot], axis=-2) + q_diag[
        ..., :, None
    ] * jnp.eye(8)
    return new_mean, new_cov


def project(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    form: str = XYWH,
    *,
    conf: jnp.ndarray | None = None,
):
    """State -> measurement space. Returns (mean4, S (..., 4, 4)).

    conf: optional (...,) detection confidence for NSA noise scaling
    (StrongSORT H3): R̃ = (1 - conf) · R.
    """
    std = _pos_std(mean[..., :4], form, STD_POS)
    if form == XYAH:
        # DeepSORT uses a larger aspect noise in project than initiate
        std = std.at[..., 2].set(1e-1)
    # floor keeps S invertible for empty slots (w = h = 0) whose lanes
    # are discarded by the caller's masks anyway
    r_diag = jnp.maximum(std**2, 1e-9)
    if conf is not None:
        r_diag = jnp.maximum(
            r_diag * jnp.clip(1.0 - conf[..., None], 0.0, 1.0), 1e-9
        )
    proj_mean = mean[..., :4]
    s = cov[..., :4, :4] + r_diag[..., :, None] * jnp.eye(4)
    return proj_mean, s


def _chol4_lanes(s: jnp.ndarray):
    """Closed-form Cholesky of batched SPD 4x4 matrices.

    Batched tiny LU/Cholesky (``jnp.linalg.solve`` / ``cholesky`` on
    (K, 4, 4)) lowers to loop-heavy linalg kernels that dominate the
    tracker step on TPU; the unrolled scalar formulas below are ~16
    elementwise VPU lanes over K instead. Returns the 10 lower-
    triangular entries as separate (...,) arrays.
    """
    eps = 1e-12

    def rsq(x):  # guarded sqrt: empty slots carry ~0 diagonals
        return jnp.sqrt(jnp.maximum(x, eps))

    l00 = rsq(s[..., 0, 0])
    l10 = s[..., 1, 0] / l00
    l20 = s[..., 2, 0] / l00
    l30 = s[..., 3, 0] / l00
    l11 = rsq(s[..., 1, 1] - l10 * l10)
    l21 = (s[..., 2, 1] - l20 * l10) / l11
    l31 = (s[..., 3, 1] - l30 * l10) / l11
    l22 = rsq(s[..., 2, 2] - l20 * l20 - l21 * l21)
    l32 = (s[..., 3, 2] - l30 * l20 - l31 * l21) / l22
    l33 = rsq(s[..., 3, 3] - l30 * l30 - l31 * l31 - l32 * l32)
    return (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33)


def _forward_sub4(lanes, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b for batched b (..., 4, N), L from _chol4_lanes."""
    l00, l10, l20, l30, l11, l21, l31, l22, l32, l33 = (
        lane[..., None] for lane in lanes
    )
    y0 = b[..., 0, :] / l00
    y1 = (b[..., 1, :] - l10 * y0) / l11
    y2 = (b[..., 2, :] - l20 * y0 - l21 * y1) / l22
    y3 = (b[..., 3, :] - l30 * y0 - l31 * y1 - l32 * y2) / l33
    return jnp.stack([y0, y1, y2, y3], axis=-2)


def _chol_solve4(lanes, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L Lᵀ) x = b for batched b (..., 4, N)."""
    l00, l10, l20, l30, l11, l21, l31, l22, l32, l33 = (
        lane[..., None] for lane in lanes
    )
    y = _forward_sub4(lanes, b)
    y0, y1, y2, y3 = (y[..., i, :] for i in range(4))
    x3 = y3 / l33
    x2 = (y2 - l32 * x3) / l22
    x1 = (y1 - l21 * x2 - l31 * x3) / l11
    x0 = (y0 - l10 * x1 - l20 * x2 - l30 * x3) / l00
    return jnp.stack([x0, x1, x2, x3], axis=-2)


def update(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    measurement: jnp.ndarray,
    form: str = XYWH,
    *,
    conf: jnp.ndarray | None = None,
):
    """KF measurement update. Batched over leading dims."""
    proj_mean, s = project(mean, cov, form, conf=conf)
    # Kalman gain via SPD solve against S: K = P Hᵀ S⁻¹ (closed-form
    # 4x4 Cholesky — see _chol4_lanes for why not jnp.linalg.solve)
    ph_t = cov[..., :, :4]
    gain_t = _chol_solve4(_chol4_lanes(s), jnp.swapaxes(ph_t, -1, -2))
    innovation = measurement - proj_mean
    new_mean = mean + jnp.einsum(
        "...i,...ij->...j", innovation, gain_t, precision=_HI
    )
    new_cov = cov - jnp.einsum(
        "...ji,...jk->...ik", gain_t,
        jnp.matmul(s, gain_t, precision=_HI), precision=_HI,
    )
    return new_mean, new_cov


def gating_distance(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    measurements: jnp.ndarray,
    form: str = XYWH,
    *,
    only_position: bool = False,
) -> jnp.ndarray:
    """Squared Mahalanobis distance of measurements to the track gate.

    mean (K, 8), cov (K, 8, 8), measurements (N, 4) -> (K, N).
    Chi-square 95% gate: 9.4877 for 4 dof (StrongSORT H4).
    """
    proj_mean, s = project(mean, cov, form)
    d = measurements[None, :, :] - proj_mean[:, None, :]  # (K, N, 4)
    if only_position:
        d = d[..., :2]
        s = s[..., :2, :2]
        l00 = jnp.sqrt(jnp.maximum(s[..., 0, 0], 1e-12))
        l10 = s[..., 1, 0] / l00
        l11 = jnp.sqrt(jnp.maximum(s[..., 1, 1] - l10 * l10, 1e-12))
        dt = jnp.swapaxes(d, -1, -2)  # (K, 2, N)
        z0 = dt[..., 0, :] / l00[..., None]
        z1 = (dt[..., 1, :] - l10[..., None] * z0) / l11[..., None]
        return z0**2 + z1**2
    # z solves L z = dᵀ for all N measurements of each track at once
    z = _forward_sub4(_chol4_lanes(s), jnp.swapaxes(d, -1, -2))
    return jnp.sum(z**2, axis=-2)


CHI2_95_4DOF = 9.4877
