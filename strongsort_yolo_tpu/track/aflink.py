"""AFLink — learned appearance-free tracklet linking (SURVEY.md H7).

The StrongSORT++ paper's AFLink scores whether tracklet A (earlier)
and tracklet B (later) belong to the same object from MOTION ONLY: a
small temporal-conv network over the tail of A and the head of B.
The reference repo ships it as a torch module run offline per pair
(StrongSORT's AFLink/AppFreeLink); here it is a jax model whose
scoring runs ALL candidate pairs in one jitted batched forward — the
TPU-shaped formulation of the same idea — pluggable into
``track.postprocess.link_tracklets`` via ``cost_fn``.

Input features are scale/translation invariant, so one trained net
works at any resolution: for a pair, positions are centered on the
midpoint between A's last and B's first box center and divided by the
pair's mean box size; time is relative to A's end, divided by the
30-frame link horizon (B's time channel thereby encodes the gap).
Each of the K=30 rows is [t_rel, cx, cy, w, h] (+ a validity mask for
short tracklets).

Architecture (~13k params): a shared two-layer temporal conv encoder
(5->32->32, k=3) with masked mean+max pooling, then an MLP head on
the concatenated pair embedding -> link logit. Cost returned to the
linker is ``1 - sigmoid(logit)`` so the existing ``link_thresh``
semantics (lower = better, default 0.8) hold; a trained net separates
pairs to ~0/~1, making the threshold insensitive.

Training runs on synthetic trajectories (tools/train_aflink.py —
constant-velocity + acceleration-noise + jitter tracks, cut into
positive pairs with 1..30-frame gaps, hard negatives from the
spatially nearest other trajectory); the shipped checkpoint is
``assets/aflink_synth.npz``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

K = 30  # rows per tracklet segment (AFLink horizon)
HORIZON = 30.0  # time normalization / max linkable gap, frames
FEAT = 5  # [t_rel, cx, cy, w, h]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def init_aflink(key: jax.Array) -> dict:
    ks = jax.random.split(key, 5)

    def conv(k, cin, cout, width=3):
        return {
            "w": jax.random.normal(k, (width, cin, cout)) * (
                1.0 / np.sqrt(width * cin)
            ),
            "b": jnp.zeros((cout,)),
        }

    def dense(k, cin, cout):
        return {
            "w": jax.random.normal(k, (cin, cout)) * (1.0 / np.sqrt(cin)),
            "b": jnp.zeros((cout,)),
        }

    return {
        "c1": conv(ks[0], FEAT, 32),
        "c2": conv(ks[1], 32, 32),
        "h1": dense(ks[2], 128, 64),
        "h2": dense(ks[3], 64, 1),
    }


def _conv1d(p, x):
    """(N, K, C) 'same' temporal conv."""
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"],
            window_strides=(1,),
            padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["b"]
    )


def _encode(params, x, mask):
    """(N, K, FEAT), (N, K) -> (N, 64) masked mean+max pooled."""
    h = jax.nn.relu(_conv1d(params["c1"], x))
    h = jax.nn.relu(_conv1d(params["c2"], h))
    m = mask[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(h * m, axis=1) / cnt
    mx = jnp.max(jnp.where(m > 0, h, -1e9), axis=1)
    mx = jnp.where(cnt > 0, mx, 0.0)
    return jnp.concatenate([mean, mx], axis=-1)


def aflink_logits(params, fa, ma, fb, mb):
    """Batched pair logits: (N,K,FEAT)x2 (+masks) -> (N,)."""
    ha = _encode(params, fa, ma)
    hb = _encode(params, fb, mb)
    z = jnp.concatenate([ha, hb], axis=-1)
    z = jax.nn.relu(z @ params["h1"]["w"] + params["h1"]["b"])
    return (z @ params["h2"]["w"] + params["h2"]["b"])[:, 0]


# ---------------------------------------------------------------------------
# Pair featurization (host numpy — offline tool path)
# ---------------------------------------------------------------------------


def _segment(rows: np.ndarray, tail: bool) -> np.ndarray:
    """Last/first K rows of a (n, >=5) [frame, x1, y1, x2, y2, ...]."""
    seg = rows[-K:] if tail else rows[:K]
    out = np.zeros((K, FEAT + 1), np.float32)  # + mask column
    n = len(seg)
    c = (seg[:, 1:3] + seg[:, 3:5]) / 2.0
    wh = seg[:, 3:5] - seg[:, 1:3]
    out[:n, 0] = seg[:, 0]
    out[:n, 1:3] = c
    out[:n, 3:5] = wh
    out[:n, 5] = 1.0
    return out


def pair_features(a: np.ndarray, b: np.ndarray):
    """Tracklets a (earlier), b (later) -> (fa, ma, fb, mb) for one
    pair, in the normalized frame described in the module docstring."""
    sa = _segment(a, tail=True)
    sb = _segment(b, tail=False)
    ta_end = a[-1, 0]
    ca = (a[-1, 1:3] + a[-1, 3:5]) / 2.0
    cb = (b[0, 1:3] + b[0, 3:5]) / 2.0
    origin = (ca + cb) / 2.0
    size = max(
        float(
            np.mean(
                [a[-1, 3] - a[-1, 1], a[-1, 4] - a[-1, 2],
                 b[0, 3] - b[0, 1], b[0, 4] - b[0, 2]]
            )
        ),
        1.0,
    )

    def norm(seg):
        f = np.zeros((K, FEAT), np.float32)
        m = seg[:, 5]
        f[:, 0] = (seg[:, 0] - ta_end) / HORIZON * m
        f[:, 1:3] = (seg[:, 1:3] - origin) / size * m[:, None]
        f[:, 3:5] = seg[:, 3:5] / size * m[:, None]
        return f, m.astype(np.float32)

    fa, ma = norm(sa)
    fb, mb = norm(sb)
    return fa, ma, fb, mb


def make_cost_fn(params):
    """-> cost_fn(ordered_tracklets: list[np.ndarray]) -> (n, n) cost
    matrix for ``link_tracklets``: one jitted forward over every
    ordered pair; pairs with non-positive or over-horizon gaps get the
    linker's 'implausible' cost (10.0)."""
    fwd = jax.jit(aflink_logits)

    def cost_fn(tracks_list):
        n = len(tracks_list)
        cost = np.full((n, n), 10.0, np.float32)
        idx, fas, mas, fbs, mbs = [], [], [], [], []
        for i, a in enumerate(tracks_list):
            for j, b in enumerate(tracks_list):
                if i == j:
                    continue
                gap = b[0, 0] - a[-1, 0]
                if gap <= 0 or gap > HORIZON:
                    continue
                fa, ma, fb, mb = pair_features(a, b)
                idx.append((i, j))
                fas.append(fa)
                mas.append(ma)
                fbs.append(fb)
                mbs.append(mb)
        if not idx:
            return cost
        logits = np.asarray(
            fwd(
                params,
                jnp.asarray(np.stack(fas)),
                jnp.asarray(np.stack(mas)),
                jnp.asarray(np.stack(fbs)),
                jnp.asarray(np.stack(mbs)),
            )
        )
        p = 1.0 / (1.0 + np.exp(-np.clip(logits, -30.0, 30.0)))
        for (i, j), prob in zip(idx, p):
            cost[i, j] = 1.0 - prob
        return cost

    return cost_fn


# ---------------------------------------------------------------------------
# Checkpoint IO
# ---------------------------------------------------------------------------


def save_aflink(path: str, params: dict) -> None:
    flat = {
        f"{k}/{kk}": np.asarray(v)
        for k, sub in params.items()
        for kk, v in sub.items()
    }
    np.savez(path, **flat)


def load_aflink(path: str) -> dict:
    z = np.load(path)
    out: dict = {}
    for name in z.files:
        k, kk = name.split("/")
        out.setdefault(k, {})[kk] = jnp.asarray(z[name])
    return out


def default_checkpoint() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "assets",
        "aflink_synth.npz",
    )
