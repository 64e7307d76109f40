"""Trained ReID embedder quality (assets/osnet_x0_25_synth.npz).

The round-2/3 caveat on SURVEY H1 was that appearance QUALITY was
unproven — OSNet ran with random weights (no pretrained checkpoints
exist in this zero-egress image). tools/train_osnet.py closes what is
closable offline: OSNet x0_25 trained on synthetic clothing-recipe
identities. These tests pin the learned property the tracker actually
uses — cosine retrieval of the same identity across views — on
identities NEVER SEEN in training, and require a decisive margin over
random initialization.
"""

import os

import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "assets", "osnet_x0_25_synth.npz"
)


@pytest.fixture(scope="module")
def trained():
    from strongsort_yolo_tpu.models.osnet import load_osnet_npz

    return load_osnet_npz(CKPT)


@pytest.fixture(scope="module")
def eval_set():
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from train_osnet import make_dataset

    # fresh seed: identities unseen by training (seeds 0/1 used there)
    return make_dataset(np.random.default_rng(999), 16, 8)


def _embed(params, x):
    import jax.numpy as jnp

    from strongsort_yolo_tpu.models.osnet import osnet_apply

    out = []
    for i in range(0, len(x), 32):
        out.append(np.asarray(osnet_apply(params, jnp.asarray(x[i : i + 32]))))
    return np.concatenate(out)


def test_checkpoint_roundtrip_variant(trained):
    params, cfg = trained
    assert cfg.variant == "osnet_x0_25"
    assert cfg.feat_dim == 512


def test_unseen_identity_rank1(trained, eval_set):
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from train_osnet import rank1

    params, _ = trained
    x, y, _ = eval_set
    r1 = rank1(_embed(params, x), y)
    assert r1 >= 0.9, r1


def test_trained_beats_random_margin(trained, eval_set):
    """Same-identity cosine margin over cross-identity must be wide
    and clearly better than random init (the tracker thresholds
    cosine distance at ~0.25 absolute)."""
    import jax

    from strongsort_yolo_tpu.models.osnet import OsnetConfig, init_osnet

    params, _ = trained
    x, y, _ = eval_set

    def margin(p):
        e = _embed(p, x)
        sim = e @ e.T
        same = (y[:, None] == y[None, :]) & ~np.eye(len(y), dtype=bool)
        return float(sim[same].mean() - sim[~same & ~np.eye(len(y), dtype=bool)].mean())

    m_trained = margin(params)
    m_rand = margin(init_osnet(jax.random.PRNGKey(3), OsnetConfig()))
    assert m_trained > 0.5, m_trained
    assert m_trained > m_rand + 0.2, (m_trained, m_rand)


def test_loads_into_pipeline_by_path(trained):
    """--reid-weights <path>.npz plumbs the trained embedder into the
    Pipeline (the serving surface for this asset)."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline

    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=192, half=False),
        tracker="strongsort.yaml",
        reid_weights=CKPT,
        track_slots=32,
    )
    params, _ = trained
    got = pipe.reid_params["fc"]["lin"]["w"]
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(params["fc"]["lin"]["w"])
    )
