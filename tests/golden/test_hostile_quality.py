"""Hostile-regime quality floors (VERDICT r3 item 6 closure).

The round-3 stress clips (constant velocity, uniform scores) measured every
opt-in association knob as a no-op; the HOSTILE_CLIPS family
(data/synthetic.py) scripts the regimes the knobs exist for, and this file
locks the measured wins so a regression in BYTE / buffered-IoU / the
lifecycle can't land silently.

Measured round 4 (tools/perf_hostile_knobs.py, CPU, deterministic seeds):

  occl_dips  base     mota 0.6579 idf1 0.7704 idsw 9 ml 3
             byte0.1  mota 0.7763 idf1 0.8695 idsw 5 ml 1   <- BYTE's regime
  curved_pan base     mota 0.7564 idf1 0.8305 idsw 7
             biou0.3  mota 0.7634 idf1 0.8594 idsw 4        <- buffered IoU
             byte+biou mota 0.7879 idf1 0.8727 idsw 4
  storm      all nine variants identical: mota 0.8840 idf1 0.9384 idsw 0

Round 5 (VERDICT r4 item 1c): motion_gate measured on every clip including
ghost_clutter, the appearance-identical-ghost regime scripted FOR it. The
projected-innovation gate (chi2-95% = 9.4877) NEVER wins MOTA/IDF1: the
Kalman posterior half-absorbs a matched ghost and stays a TP, while
rejecting it is a hard FN plus a twin birth. Its one measured virtue is
precision — FP 83 -> 24 (-71%) on ghost_clutter — and under unmodeled
global motion it is catastrophic (curved_pan IDSW 7 -> 62, storm 0 -> 39).
Hence the 0.0 default; enable only when FP cost dominates and the motion
model is sound. Locked below.

  ghost_clutter base      mota 0.8493 idf1 0.9164 idsw  8 fn 347 fp 83
                mgate9.5  mota 0.8125 idf1 0.8778 idsw 12 fn 509 fp 24
  curved_pan    mgate9.5  mota 0.6960 idf1 0.6891 idsw 62
"""
import dataclasses

import pytest

from waymo_2d_tracking_tpu.config import KalmanConfig, TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import HOSTILE_CLIPS, generate_clip
from waymo_2d_tracking_tpu.eval.mot import (
    evaluate_mot,
    gt_to_frames,
    track_outputs_to_frames,
)
from waymo_2d_tracking_tpu.tracker import Tracker

BASE = TrackerConfig(
    max_tracks=64, max_detections=64, embed_dim=128,
    appearance_weight=0.3, appearance_gate=0.5,
    n_init=3, max_age=3, iou_threshold=0.3,
    reid_recovery=True, max_lost_age=30, gallery_size=4,
)
BYTE = dataclasses.replace(BASE, byte_low_threshold=0.1)
BIOU = dataclasses.replace(BASE, iou_buffer=0.3)
BYTE_BIOU = dataclasses.replace(BASE, byte_low_threshold=0.1, iou_buffer=0.3)


def _metrics(tracker_cfg, clip_cfg):
    dets, gt = generate_clip(clip_cfg)
    _, outs = Tracker(tracker_cfg).run(dets)
    return evaluate_mot(
        gt_to_frames(gt), track_outputs_to_frames(outs, clip_cfg.num_frames)
    )


@pytest.fixture(scope="module")
def occl():
    clip = HOSTILE_CLIPS["occl_dips"]
    return {"base": _metrics(BASE, clip), "byte": _metrics(BYTE, clip)}


@pytest.fixture(scope="module")
def pan():
    clip = HOSTILE_CLIPS["curved_pan"]
    return {"base": _metrics(BASE, clip), "biou": _metrics(BIOU, clip),
            "combo": _metrics(BYTE_BIOU, clip)}


def test_byte_wins_under_occlusion_dips(occl):
    """BYTE second association recovers the occlusion-dipped low-score
    detections the base config drops (measured +0.118 MOTA, +0.099 IDF1)."""
    base, byte = occl["base"], occl["byte"]
    assert byte.mota >= base.mota + 0.08, (base.as_dict(), byte.as_dict())
    assert byte.idf1 >= base.idf1 + 0.06, (base.as_dict(), byte.as_dict())
    assert byte.num_idsw <= base.num_idsw
    # absolute floors just under the measured values
    assert byte.mota >= 0.75 and byte.idf1 >= 0.85, byte.as_dict()
    assert byte.mostly_lost <= 1, byte.as_dict()
    assert base.mota >= 0.62 and base.idf1 >= 0.74, base.as_dict()


def test_buffered_iou_wins_under_curved_pan(pan):
    """Buffered IoU keeps identities through the motion the constant-
    velocity model under-predicts (IDF1 +0.029, IDSW 7 -> 4 measured)."""
    base, biou = pan["base"], pan["biou"]
    assert biou.idf1 >= base.idf1 + 0.015, (base.as_dict(), biou.as_dict())
    assert biou.num_idsw <= base.num_idsw - 2, (base.as_dict(), biou.as_dict())
    assert biou.mota >= base.mota, (base.as_dict(), biou.as_dict())
    assert biou.idf1 >= 0.84 and biou.mota >= 0.74, biou.as_dict()
    assert base.mota >= 0.73, base.as_dict()


def test_byte_biou_compose(pan):
    """The two knobs compose (measured 0.7879/0.8727 vs 0.7564/0.8305)."""
    base, combo = pan["base"], pan["combo"]
    assert combo.mota >= base.mota + 0.02, (base.as_dict(), combo.as_dict())
    assert combo.idf1 >= base.idf1 + 0.03, (base.as_dict(), combo.as_dict())
    assert combo.mota >= 0.77 and combo.idf1 >= 0.86, combo.as_dict()


MGATE = dataclasses.replace(BASE, motion_gate=9.4877)


@pytest.fixture(scope="module")
def ghost():
    clip = HOSTILE_CLIPS["ghost_clutter"]
    return {"base": _metrics(BASE, clip), "mgate": _metrics(MGATE, clip)}


def test_motion_gate_cuts_ghost_false_positives(ghost):
    """The gate's ONE measured win, in the regime scripted for it
    (appearance-identical offset ghosts): FP 83 -> 24 (-71%). MOTA goes the
    OTHER way (0.849 -> 0.813) — absorbing a ghost into the Kalman
    posterior keeps the track a TP, rejecting it is a hard FN — which is
    exactly why the default is 0.0. Both directions are locked."""
    base, mg = ghost["base"], ghost["mgate"]
    assert mg.num_fp <= int(base.num_fp * 0.45), (base.as_dict(), mg.as_dict())
    assert base.mota >= mg.mota, (base.as_dict(), mg.as_dict())
    assert mg.mota >= 0.79 and mg.idf1 >= 0.86, mg.as_dict()
    assert base.mota >= 0.83 and base.idf1 >= 0.90, base.as_dict()


def test_motion_gate_harms_under_unmodeled_pan(pan):
    """Under camera pan + acceleration the constant-velocity prediction is
    wrong by construction, so the chi-square gate forbids exactly the
    matches that keep identities: IDSW 7 -> 62, IDF1 -0.14 measured. Locked
    so the config guidance ('never under unmodeled global motion') stays
    backed by a number."""
    gated = _metrics(MGATE, HOSTILE_CLIPS["curved_pan"])
    base = pan["base"]
    assert gated.num_idsw >= base.num_idsw + 20, (
        base.as_dict(), gated.as_dict())
    assert gated.idf1 <= base.idf1 - 0.08, (base.as_dict(), gated.as_dict())


def test_storm_lifecycle_floor():
    """Birth/death churn with distance noise: the lifecycle handles 40
    staggered lifespans with zero identity switches, knobs or not."""
    clip = HOSTILE_CLIPS["storm"]
    base = _metrics(BASE, clip)
    byte = _metrics(BYTE, clip)
    for m in (base, byte):
        assert m.mota >= 0.86 and m.idf1 >= 0.92, m.as_dict()
        assert m.num_idsw == 0, m.as_dict()
        assert m.mostly_lost == 0, m.as_dict()
    # knob neutrality where the regime doesn't apply (measured identical)
    assert base.as_dict() == byte.as_dict()
