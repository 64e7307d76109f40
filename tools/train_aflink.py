"""Train the AFLink tracklet-link classifier on synthetic trajectories.

Produces ``assets/aflink_synth.npz`` (the checkpoint shipped with the
repo — regenerate with this script; fully deterministic from --seed).

Data: smooth synthetic trajectories (constant velocity + acceleration
noise + per-frame jitter, slowly-varying box size) in a 1920x1080
field. Positives: one trajectory cut at a random point with a 1..30
frame gap — the two sides must link. Negatives: the tail of one
trajectory against the head segment of the SPATIALLY NEAREST other
trajectory at a plausible gap (hard negatives), plus random pairs.

Because the pair featurization (track/aflink.py) is scale/translation
invariant, the synthetic field generalizes to any resolution.

Usage: python tools/train_aflink.py [--seed 0] [--steps 1500]
            [--out assets/aflink_synth.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_trajectories(rng: np.random.Generator, n: int, t_len: int = 240):
    """-> list of (t_len, 5) arrays [frame, x1, y1, x2, y2]."""
    out = []
    for _ in range(n):
        pos = rng.uniform([100, 100], [1820, 980])
        vel = rng.normal(0, 3.0, 2)
        w = rng.uniform(40, 160)
        h = w * rng.uniform(1.6, 2.6)
        rows = []
        for t in range(t_len):
            vel += rng.normal(0, 0.25, 2)
            vel *= 0.999
            pos = pos + vel
            w *= 1.0 + rng.normal(0, 0.004)
            h *= 1.0 + rng.normal(0, 0.004)
            c = pos + rng.normal(0, 2.0, 2)  # detector jitter
            rows.append(
                [t, c[0] - w / 2, c[1] - h / 2, c[0] + w / 2, c[1] + h / 2]
            )
        out.append(np.asarray(rows, np.float64))
    return out


def make_pairs(rng, trajs, n_pos: int, n_neg: int):
    """-> (fa, ma, fb, mb, labels) numpy batches."""
    from strongsort_yolo_tpu.track.aflink import pair_features

    fas, mas, fbs, mbs, ys = [], [], [], [], []

    def add(a, b, y):
        fa, ma, fb, mb = pair_features(a, b)
        fas.append(fa)
        mas.append(ma)
        fbs.append(fb)
        mbs.append(mb)
        ys.append(y)

    t_len = len(trajs[0])
    ends = np.asarray([tr[-1, 1:3] for tr in trajs])
    for _ in range(n_pos):
        tr = trajs[rng.integers(len(trajs))]
        cut = int(rng.integers(40, t_len - 40))
        gap = int(rng.integers(1, 31))
        a = tr[max(0, cut - 45) : cut]
        b = tr[min(cut + gap, t_len - 5) :][:45]
        if len(a) < 2 or len(b) < 2:
            continue
        add(a, b, 1.0)
    for k in range(n_neg):
        i = int(rng.integers(len(trajs)))
        a_tr = trajs[i]
        if k % 2 == 0:  # hard negative: nearest other trajectory
            d = np.linalg.norm(ends - ends[i], axis=1)
            d[i] = np.inf
            j = int(np.argmin(d))
        else:
            j = int(rng.integers(len(trajs)))
            if j == i:
                j = (j + 1) % len(trajs)
        b_tr = trajs[j]
        cut = int(rng.integers(40, t_len - 40))
        gap = int(rng.integers(1, 31))
        a = a_tr[max(0, cut - 45) : cut]
        # shift b's frames so the gap is plausible (negatives must be
        # temporally linkable, else the linker never sees them anyway)
        b = b_tr[min(cut, t_len - 45) :][:45].copy()
        b[:, 0] += (a[-1, 0] + gap) - b[0, 0]
        if len(a) < 2 or len(b) < 2:
            continue
        add(a, b, 0.0)
    return (
        np.stack(fas),
        np.stack(mas),
        np.stack(fbs),
        np.stack(mbs),
        np.asarray(ys, np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "aflink_synth.npz",
        ),
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from strongsort_yolo_tpu.track.aflink import (
        aflink_logits, init_aflink, save_aflink,
    )

    rng = np.random.default_rng(args.seed)
    trajs = make_trajectories(rng, 80)
    fa, ma, fb, mb, y = make_pairs(rng, trajs, 6000, 6000)
    vtrajs = make_trajectories(rng, 20)
    vfa, vma, vfb, vmb, vy = make_pairs(rng, vtrajs, 1000, 1000)
    print(f"train pairs {len(y)} (pos {int(y.sum())}), val {len(vy)}")

    params = init_aflink(jax.random.PRNGKey(args.seed))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, fa, ma, fb, mb, y):
        def loss_fn(p):
            logits = aflink_logits(p, fa, ma, fb, mb)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def acc(params, fa, ma, fb, mb, y):
        logits = aflink_logits(params, fa, ma, fb, mb)
        return jnp.mean(((logits > 0) == (y > 0.5)).astype(jnp.float32))

    t0 = time.perf_counter()
    n = len(y)
    for it in range(args.steps):
        sel = rng.integers(0, n, args.batch)
        params, opt_state, loss = step(
            params, opt_state, fa[sel], ma[sel], fb[sel], mb[sel], y[sel]
        )
        if it % 200 == 0 or it == args.steps - 1:
            va = float(acc(params, vfa, vma, vfb, vmb, vy))
            print(
                f"step {it}: loss {float(loss):.4f} val_acc {va:.4f} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    save_aflink(args.out, params)
    print(f"saved {args.out} (val_acc {va:.4f})")


if __name__ == "__main__":
    main()
