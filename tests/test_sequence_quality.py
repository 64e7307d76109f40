"""Sequence-level StrongSORT-with-appearance regression guard
(VERDICT r3 ask #7; BASELINE.md sequence rows).

Runs the fully-trained pipeline (trained detector + trained OSNet +
StrongSORT) over a 1-cycle OcclusionRelayClip — two engineered blind
windows where motion-only association provably prefers the swapped
identities — and guards that:
  - the appearance term reduces identity switches and earns IDF1;
  - the StrongSORT++ offline pass (learned AFLink + GSI) further
    reduces switches without costing IDF1.
Thresholds sit with slack below the CPU-measured values (see the
BASELINE.md table for the full 2-cycle rows)."""

import pytest

from strongsort_yolo_tpu.media.video import OcclusionRelayClip
from strongsort_yolo_tpu.tools.eval_sequence import eval_pp, run_arm


@pytest.fixture(scope="module")
def arms():
    out = {}
    for name, lam in [("reid", 0.98), ("lambda0", 0.0)]:
        clip = OcclusionRelayClip(cycles=1)
        m, records, (gt_vis, gt_occ, _hyp) = run_arm(clip, lam=lam)
        out[name] = m
        out[name + "_pp"] = eval_pp(records, (gt_vis, gt_occ))
    return out


def test_appearance_reduces_id_switches(arms):
    assert arms["reid"]["vis"]["idsw"] < arms["lambda0"]["vis"]["idsw"], arms


def test_appearance_earns_idf1(arms):
    assert (
        arms["reid"]["vis"]["idf1"]
        > arms["lambda0"]["vis"]["idf1"] + 0.01
    ), arms


def test_absolute_quality_floor(arms):
    m = arms["reid"]["vis"]
    assert m["mota"] > 0.6, m
    assert m["idf1"] > 0.65, m


def test_strongsort_pp_cuts_switches(arms):
    assert (
        arms["reid_pp"]["vis"]["idsw"] <= arms["reid"]["vis"]["idsw"]
    ), arms
    assert (
        arms["reid_pp"]["vis"]["idf1"] >= arms["reid"]["vis"]["idf1"] - 0.02
    ), arms
