"""StrongSORT step: lifecycle + appearance-driven identity tests."""

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.track.strongsort import StrongSortConfig, strongsort_step
from strongsort_yolo_tpu.track.state import init_track_state

N_DET = 8
D = 16
CFG = StrongSortConfig()

step = jax.jit(strongsort_step, static_argnums=(6,))


def embed(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1, D)
    return (v / np.linalg.norm(v)).astype(np.float32)


def frame(dets):
    """dets: list of (x1,y1,x2,y2,score,cls,emb_seed)."""
    boxes = np.zeros((N_DET, 4), np.float32)
    scores = np.zeros((N_DET,), np.float32)
    cls = np.zeros((N_DET,), np.int32)
    valid = np.zeros((N_DET,), bool)
    feats = np.zeros((N_DET, D), np.float32)
    for i, d in enumerate(dets):
        boxes[i] = d[:4]
        scores[i] = d[4]
        cls[i] = d[5]
        feats[i] = embed(d[6])
        valid[i] = True
    return tuple(map(jnp.asarray, (boxes, scores, cls, valid, feats)))


def run(frames, cfg=CFG, slots=32):
    state = init_track_state(slots, feat_dim=D)
    outs = []
    for dets in frames:
        state, out = step(state, *frame(dets), cfg)
        outs.append(jax.tree.map(np.asarray, out))
    return state, outs


def active(out):
    return {
        int(out.track_id[i]): out.boxes[i]
        for i in range(len(out.active))
        if out.active[i]
    }


def box(t, x0=100, y0=100, vx=4, vy=2, w=40, h=80):
    x, y = x0 + vx * t, y0 + vy * t
    return (x, y, x + w, y + h)


def test_confirmation_after_n_init():
    frames = [[(*box(t), 0.9, 0, 7)] for t in range(5)]
    _, outs = run(frames)
    assert active(outs[0]) == {}  # tentative
    assert active(outs[1]) == {}
    assert set(active(outs[2])) == {1}  # hit 3 == n_init -> confirmed
    assert set(active(outs[4])) == {1}


def test_tentative_dies_on_single_miss():
    frames = [
        [(*box(0), 0.9, 0, 7)],
        [],
        [(*box(2), 0.9, 0, 7)],
        [(*box(3), 0.9, 0, 7)],
        [(*box(4), 0.9, 0, 7)],
    ]
    _, outs = run(frames)
    # first track died tentative; new track (id 2) confirms at frame 5
    assert set(active(outs[4])) == {2}


def test_appearance_resolves_crossover():
    """Two objects swap positions; ReID must keep ids glued to their
    embeddings, not their positions."""
    a_seed, b_seed = 11, 23
    frames = []
    # approach: A at x=100 moving right, B at x=300 moving left
    for t in range(12):
        xa = 100.0 + 18.0 * t
        xb = 300.0 - 18.0 * t
        frames.append(
            [
                (xa, 100.0, xa + 40, 180.0, 0.9, 0, a_seed),
                (xb, 100.0, xb + 40, 180.0, 0.9, 0, b_seed),
            ]
        )
    _, outs = run(frames)
    ids0 = active(outs[2])
    # find which id has which embedding by x position at confirmation
    id_a = min(ids0, key=lambda i: ids0[i][0])
    id_b = max(ids0, key=lambda i: ids0[i][0])
    assert id_a != id_b
    last = active(outs[-1])
    assert set(last) == {id_a, id_b}
    # after crossing, A (which started left) is now on the right
    assert last[id_a][0] > last[id_b][0]


def test_occlusion_reid_recovery():
    frames = [[(*box(t), 0.9, 0, 5)] for t in range(4)]
    frames += [[]] * 6  # occluded, within max_age
    frames += [[(*box(10 + i), 0.9, 0, 5)] for i in range(2)]
    _, outs = run(frames)
    assert set(active(outs[3])) == {1}
    assert active(outs[9]) == {}
    assert set(active(outs[-1])) == {1}  # same id after reappearing


def test_max_age_prunes():
    cfg = StrongSortConfig(max_age=3)
    frames = [[(*box(t), 0.9, 0, 5)] for t in range(4)]
    frames += [[]] * 6
    frames += [[(*box(10), 0.9, 0, 5)], [(*box(11), 0.9, 0, 5)],
               [(*box(12), 0.9, 0, 5)]]
    _, outs = run(frames, cfg)
    assert set(active(outs[-1])) == {2}  # old id was pruned


def test_low_conf_detections_ignored():
    frames = [[(*box(t), 0.1, 0, 5)] for t in range(4)]
    _, outs = run(frames)
    for out in outs:
        assert active(out) == {}


def test_crop_and_resize_matches_bilinear_oracle():
    """MXU matmul crops == 4-tap bilinear sampling (numpy oracle) at
    downscale=1; tolerance covers default-precision multiplies."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.crops import crop_and_resize

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
    boxes = np.array(
        [[20, 10, 84, 90], [0, 0, 160, 120], [50.5, 33.3, 70.2, 110.9]],
        np.float32,
    )

    def oracle(img, box, oh, ow):
        x1, y1, x2, y2 = box
        out = np.zeros((oh, ow, 3), np.float32)
        h, w = img.shape[:2]
        for r in range(oh):
            gy = y1 + (r + 0.5) / oh * max(y2 - y1, 1e-3) - 0.5
            y0 = np.clip(np.floor(gy), 0, h - 1)
            wy = np.clip(gy - y0, 0, 1)
            y0i, y1i = int(y0), int(min(y0 + 1, h - 1))
            for c in range(ow):
                gx = x1 + (c + 0.5) / ow * max(x2 - x1, 1e-3) - 0.5
                x0 = np.clip(np.floor(gx), 0, w - 1)
                wx = np.clip(gx - x0, 0, 1)
                x0i, x1i = int(x0), int(min(x0 + 1, w - 1))
                top = img[y0i, x0i] * (1 - wx) + img[y0i, x1i] * wx
                bot = img[y1i, x0i] * (1 - wx) + img[y1i, x1i] * wx
                out[r, c] = top * (1 - wy) + bot * wy
        return out

    got = np.asarray(
        crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), (32, 16), downscale=1)
    )
    for i, b in enumerate(boxes):
        np.testing.assert_allclose(got[i], oracle(img, b, 32, 16), atol=1e-2)
    # degenerate box: finite output
    z = crop_and_resize(
        jnp.asarray(img), jnp.asarray(np.zeros((2, 4), np.float32)), (32, 16)
    )
    assert np.isfinite(np.asarray(z)).all()


def test_osnet_bgr_equals_flipped_rgb():
    """osnet_apply(channel_order='bgr') on BGR crops == the rgb path
    on channel-reversed crops: the cv2-frame convention is handled by
    trace-time weight/normalization reversal, not a runtime flip
    (pipeline embed parity for torchreid-convention weights)."""
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.models.osnet import (
        OsnetConfig, init_osnet, osnet_apply,
    )

    rng = np.random.default_rng(4)
    params = init_osnet(jax.random.PRNGKey(1), OsnetConfig())
    bgr = jnp.asarray(rng.uniform(0, 1, (3, 128, 64, 3)), jnp.float32)
    ref = osnet_apply(params, bgr[..., ::-1])
    got = osnet_apply(params, bgr, channel_order="bgr")
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
