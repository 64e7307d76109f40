"""Learned AFLink tracklet linker (track/aflink.py).

Validates the shipped synthetic-trained checkpoint
(assets/aflink_synth.npz, trained by tools/train_aflink.py): pairwise
classification accuracy on FRESH synthetic trajectories (a different
seed than training), correct recovery of cut tracks through the
linker, and the strongsort_pp aflink=True path end to end. Reference
role: StrongSORT++'s AFLink module (SURVEY.md H7) — the learned
replacement for the motion-heuristic default scorer.
"""

import os
import sys

import numpy as np
import pytest

from strongsort_yolo_tpu.track import aflink
from strongsort_yolo_tpu.track.postprocess import (
    link_tracklets,
    records_to_tracks,
    strongsort_pp,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


@pytest.fixture(scope="module")
def params():
    return aflink.load_aflink(aflink.default_checkpoint())


@pytest.fixture(scope="module")
def fresh_pairs():
    from train_aflink import make_pairs, make_trajectories

    rng = np.random.default_rng(1234)  # NOT the training seed
    trajs = make_trajectories(rng, 30)
    return make_pairs(rng, trajs, 400, 400)


def test_checkpoint_pairwise_accuracy(params, fresh_pairs):
    import jax.numpy as jnp

    fa, ma, fb, mb, y = fresh_pairs
    logits = np.asarray(
        aflink.aflink_logits(
            params, jnp.asarray(fa), jnp.asarray(ma),
            jnp.asarray(fb), jnp.asarray(mb),
        )
    )
    acc = float(np.mean((logits > 0) == (y > 0.5)))
    assert acc >= 0.95, acc


def test_cost_fn_separates_pairs(params):
    """Cut one smooth track into two tracklets; the learned cost for
    the true continuation must be far below a spatially-offset decoy
    arriving at the same time."""
    t = np.arange(60, dtype=float)
    x = 100.0 + 6.0 * t
    rows = np.stack([t, x, 50 + 0 * t, x + 40, 130 + 0 * t], 1)
    a, b = rows[:30], rows[36:]
    decoy = b.copy()
    decoy[:, 1] += 400.0
    decoy[:, 3] += 400.0
    cost = aflink.make_cost_fn(params)([a, b, decoy])
    assert cost[0, 1] < 0.2, cost
    assert cost[0, 2] > 0.8, cost
    assert cost[1, 0] == 10.0  # non-positive gap: implausible


def test_linker_recovers_cut_tracks(params):
    from train_aflink import make_trajectories

    rng = np.random.default_rng(77)
    trajs = make_trajectories(rng, 8, t_len=120)
    recs = []
    for k, tr in enumerate(trajs):
        cut = 50 + 3 * k
        gap = 4 + k
        for r in tr[:cut]:
            recs.append((int(r[0]), 2 * k + 1, *r[1:5]))
        for r in tr[cut + gap :]:
            recs.append((int(r[0]), 2 * k + 2, *r[1:5]))
    tracks = records_to_tracks(recs)
    assert len(tracks) == 16
    linked = link_tracklets(
        tracks, cost_fn=aflink.make_cost_fn(params), link_thresh=0.5
    )
    # every cut must be healed with the surviving (earlier, odd) id
    assert set(linked) == {2 * k + 1 for k in range(8)}
    for k in range(8):
        frames = linked[2 * k + 1][:, 0]
        assert frames[0] == 0 and frames[-1] == 119


def test_strongsort_pp_aflink_path(params):
    t = np.arange(40, dtype=float)
    x = 50.0 + 5.0 * t
    recs = [(int(tt), 1, xx, 50.0, xx + 40.0, 130.0) for tt, xx in zip(t[:18], x[:18])]
    recs += [(int(tt), 2, xx, 50.0, xx + 40.0, 130.0) for tt, xx in zip(t[24:], x[24:])]
    out = strongsort_pp(recs, aflink=True, link_thresh=0.5)
    ids = {r[1] for r in out}
    assert ids == {1}
    frames = sorted(r[0] for r in out)
    assert frames[0] == 0 and frames[-1] == 39  # gap interpolated
