"""StrongSORT++ offline post-processing (GSI + tracklet linking)."""

import numpy as np

from strongsort_yolo_tpu.track.postprocess import (
    gsi,
    link_tracklets,
    records_to_tracks,
    strongsort_pp,
)


def make_records(tid, t0, t1, x0=100.0, v=5.0, skip=()):
    recs = []
    for t in range(t0, t1):
        if t in skip:
            continue
        x = x0 + v * (t - t0)
        recs.append((t, tid, x, 50.0, x + 40.0, 130.0))
    return recs


def test_gsi_fills_gaps():
    recs = make_records(1, 0, 20, skip={7, 8, 9})
    tracks = records_to_tracks(recs)
    assert len(tracks[1]) == 17
    out = gsi(tracks)
    frames = out[1][:, 0].astype(int)
    assert set(frames) == set(range(20))
    # interpolated boxes lie on the motion line (within smoothing slack)
    row8 = out[1][frames.tolist().index(8)]
    assert abs(row8[1] - (100.0 + 5.0 * 8)) < 4.0


def test_gsi_smooths_jitter(rng):
    recs = []
    for t in range(30):
        x = 100.0 + 5.0 * t + rng.normal(0, 3.0)
        recs.append((t, 1, x, 50.0, x + 40.0, 130.0))
    tracks = records_to_tracks(recs)
    out = gsi(tracks)
    resid_raw = np.abs(tracks[1][:, 1] - (100.0 + 5.0 * tracks[1][:, 0]))
    resid_s = np.abs(out[1][:, 1] - (100.0 + 5.0 * out[1][:, 0]))
    assert resid_s.mean() < resid_raw.mean()


def test_link_merges_split_track():
    # one physical object split into ids 1 and 2 by a 6-frame occlusion
    recs = make_records(1, 0, 20) + make_records(
        2, 26, 46, x0=100.0 + 5.0 * 26
    )
    # plus an unrelated stationary object far away
    recs += [(t, 3, 800.0, 400.0, 840.0, 480.0) for t in range(0, 46)]
    tracks = records_to_tracks(recs)
    linked = link_tracklets(tracks)
    assert set(linked) == {1, 3}
    assert len(linked[1]) == 40


def test_link_does_not_merge_divergent():
    recs = make_records(1, 0, 20, v=5.0)
    # starts later but moving the other way from an offset position
    recs += make_records(2, 26, 46, x0=900.0, v=-5.0)
    tracks = records_to_tracks(recs)
    linked = link_tracklets(tracks)
    assert set(linked) == {1, 2}


def test_strongsort_pp_roundtrip():
    recs = make_records(1, 0, 10, skip={4})
    out = strongsort_pp(recs)
    assert len(out) == 10
    assert all(r[1] == 1 for r in out)
