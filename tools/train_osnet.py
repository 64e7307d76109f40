"""Train OSNet x0_25 on synthetic person-like identities.

Produces ``assets/osnet_x0_25_synth.npz`` — a ReID embedder whose
identity discrimination is LEARNED rather than the random-init
separation the round-3 appearance e2e relied on. No real pedestrian
data exists in this zero-egress image, so identities are synthetic
"clothing recipes": a 3-band (head/torso/legs) 128x64 crop where each
band has its own base color and stripe texture; views of one identity
vary by affine jitter, brightness/contrast, noise, and flips — the
invariances a ReID embedder must learn. Training is standard ReID
classification (CE over identities + label smoothing) on the OSNet
embedding; retrieval quality is evaluated on UNSEEN identities
(rank-1 of cosine retrieval), which is the property StrongSORT's
appearance term actually uses.

Usage: python tools/train_osnet.py [--seed 0] [--steps 1200]
            [--ids 96] [--out assets/osnet_x0_25_synth.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Synthetic identity crops
# ---------------------------------------------------------------------------


def make_recipe(rng: np.random.Generator) -> dict:
    """One identity = band layout + per-band color/stripe recipe."""
    head = rng.uniform(0.12, 0.2)
    torso = rng.uniform(0.35, 0.5)
    return {
        "bands": (head, torso),
        "colors": rng.uniform(0.05, 0.95, (3, 3)),
        "stripe_color": rng.uniform(0.0, 1.0, (3, 3)),
        "freq": rng.uniform(0.0, 0.45, 3),  # stripes per row; 0 = plain
        "horiz": rng.random(3) < 0.5,
        "phase": rng.uniform(0, np.pi, 3),
    }


def render_view(rng: np.random.Generator, r: dict, h: int = 128, w: int = 64):
    """One augmented view of an identity recipe -> (h, w, 3) in [0,1]."""
    img = np.empty((h, w, 3), np.float32)
    head, torso = r["bands"]
    edges = [0, int(h * head), int(h * (head + torso)), h]
    yy, xx = np.mgrid[0:h, 0:w]
    for b in range(3):
        sl = slice(edges[b], edges[b + 1])
        base = r["colors"][b][None, None, :]
        if r["freq"][b] > 0.02:
            coord = yy[sl] if r["horiz"][b] else xx[sl]
            s = 0.5 + 0.5 * np.sin(
                coord * r["freq"][b] * 2 * np.pi / 8.0 + r["phase"][b]
            )
            img[sl] = base + (r["stripe_color"][b][None, None, :] - base) * (
                s[..., None] * 0.8
            )
        else:
            img[sl] = base
    # view augmentations: affine jitter via roll+crop, photometric, noise
    dy, dx = rng.integers(-6, 7), rng.integers(-4, 5)
    img = np.roll(img, (dy, dx), axis=(0, 1))
    if rng.random() < 0.5:
        img = img[:, ::-1]
    img = img * rng.uniform(0.7, 1.25) + rng.uniform(-0.08, 0.08)
    img = img + rng.normal(0, 0.04, img.shape)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def make_dataset(rng, n_ids: int, views: int):
    recipes = [make_recipe(rng) for _ in range(n_ids)]
    x = np.stack(
        [render_view(rng, r) for r in recipes for _ in range(views)]
    )
    y = np.repeat(np.arange(n_ids), views).astype(np.int32)
    return x, y, recipes


def rank1(emb: np.ndarray, y: np.ndarray) -> float:
    """Rank-1 of leave-one-out cosine retrieval (embeddings L2-normed)."""
    sim = emb @ emb.T
    np.fill_diagonal(sim, -2.0)
    return float(np.mean(y[np.argmax(sim, 1)] == y))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--ids", type=int, default=96)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "osnet_x0_25_synth.npz",
        ),
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from strongsort_yolo_tpu.models.osnet import (
        OsnetConfig, init_osnet, osnet_apply, save_osnet_npz,
    )

    rng = np.random.default_rng(args.seed)
    x, y, _ = make_dataset(rng, args.ids, args.views)
    # unseen-identity eval set (the property the tracker uses)
    ev_x, ev_y, _ = make_dataset(
        np.random.default_rng(args.seed + 1), 24, 8
    )
    print(f"train {len(y)} crops / {args.ids} ids; eval 24 unseen ids")

    cfg = OsnetConfig()
    params = init_osnet(jax.random.PRNGKey(args.seed), cfg)
    key = jax.random.PRNGKey(args.seed + 2)
    head_w = (
        jax.random.normal(key, (cfg.feat_dim, args.ids)) * 0.02
    )
    state = {"osnet": params, "head": head_w}
    opt = optax.adam(3e-4)
    opt_state = opt.init(state)

    xd = jnp.asarray(x)
    yd = jnp.asarray(y)

    @jax.jit
    def step(state, opt_state, idx):
        def loss_fn(st):
            feats = osnet_apply(
                st["osnet"], xd[idx], compute_dtype=jnp.float32
            )
            logits = feats @ st["head"] * 16.0  # normed-feature scale
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yd[idx]
            ).mean() + 0.0 * jnp.sum(st["head"] ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    embed = jax.jit(
        lambda p, xx: osnet_apply(p, xx, compute_dtype=jnp.float32)
    )

    def eval_rank1(p):
        out = []
        for i in range(0, len(ev_x), 64):
            out.append(np.asarray(embed(p, jnp.asarray(ev_x[i : i + 64]))))
        return rank1(np.concatenate(out), ev_y)

    r0 = eval_rank1(state["osnet"])
    print(f"random-init rank-1 on unseen ids: {r0:.4f}", flush=True)

    t0 = time.perf_counter()
    n = len(y)
    for it in range(args.steps):
        idx = jnp.asarray(rng.integers(0, n, args.batch))
        state, opt_state, loss = step(state, opt_state, idx)
        if it % 150 == 0 or it == args.steps - 1:
            r1 = eval_rank1(state["osnet"])
            print(
                f"step {it}: loss {float(loss):.4f} "
                f"unseen-id rank-1 {r1:.4f} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    save_osnet_npz(args.out, state["osnet"], cfg)
    print(f"saved {args.out} (unseen rank-1 {r1:.4f} vs random {r0:.4f})")


if __name__ == "__main__":
    main()
