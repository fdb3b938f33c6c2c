"""Quality floors for the BENCHED presets (configs/production.yaml,
configs/fast.yaml).

The bench headline numbers (BASELINE.md round 2) are only meaningful if the
preset's tracker settings hold the golden-clip quality bar — detection
weights are random in this environment, so the floor is on the tracker
configuration driven by the synthetic detection stream (the same oracle the
config-1/3 goldens use). Guards against e.g. a speed-preset edit that
quietly trades too much quality (greedy association, slot counts, gates).
"""
import os

from waymo_2d_tracking_tpu.config import load_config
from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
from waymo_2d_tracking_tpu.eval.mot import (
    evaluate_mot,
    gt_to_frames,
    track_outputs_to_frames,
)
from waymo_2d_tracking_tpu.tracker import Tracker

CONFIGS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")
CLIP = SyntheticClipConfig(num_frames=200, num_objects=12, seed=0)


def _run_preset_tracker(name):
    cfg = load_config(os.path.join(CONFIGS_DIR, name))
    dets, gt = generate_clip(CLIP)
    tracker = Tracker(cfg.tracker)
    _state, outs = tracker.run(dets)
    return evaluate_mot(gt_to_frames(gt), track_outputs_to_frames(outs, CLIP.num_frames))


def test_headline_preset_quality_floor():
    """The bench.py default (round 3): greedy + ReID + recovery measured
    IDENTICAL to config-3 (auction) on this clip — MOTA 0.9389, IDF1
    0.9671, IDSW 2 (BASELINE.md round-3 table). Floors sit just under."""
    m = _run_preset_tracker("headline.yaml")
    assert m.mota >= 0.92, m.as_dict()
    assert m.idf1 >= 0.95, m.as_dict()
    assert m.num_idsw <= 3, m.as_dict()


def test_production_preset_quality_floor():
    m = _run_preset_tracker("production.yaml")
    assert m.mota >= 0.90, m.as_dict()
    assert m.idf1 >= 0.85, m.as_dict()
    assert m.num_idsw <= 8, m.as_dict()


def test_fast_preset_quality_floor():
    # greedy + IoU-only: allowed a slightly lower identity bar than
    # production, but must stay in the same quality regime
    m = _run_preset_tracker("fast.yaml")
    assert m.mota >= 0.88, m.as_dict()
    assert m.idf1 >= 0.80, m.as_dict()
    assert m.num_idsw <= 12, m.as_dict()


def test_headline_int8_shares_headline_tracker():
    """headline_int8.yaml differs from headline.yaml ONLY in
    detector.quant — identical tracker config, so identical golden-clip
    tracker quality by construction (the int8 DETECTOR numerics are bounded
    separately in tests/unit/test_quant.py)."""
    import dataclasses

    a = load_config(os.path.join(CONFIGS_DIR, "headline_int8.yaml"))
    b = load_config(os.path.join(CONFIGS_DIR, "headline.yaml"))
    assert a.tracker == b.tracker
    assert dataclasses.replace(a.detector, quant="off") == b.detector


def test_robust_preset_quality():
    """configs/robust.yaml = the headline architecture + the knobs the
    hostile family validated (byte_low=0.1, iou_buffer=0.3). Contract:
    (a) identical detector + identical benign-clip quality regime (the
    knobs are no-ops/noise on easy scenes — round-3 measurement), and
    (b) it beats the headline tracker where the knobs' regimes apply
    (the hostile occl_dips clip; floors from test_hostile_quality.py)."""
    import dataclasses

    from waymo_2d_tracking_tpu.data.synthetic import HOSTILE_CLIPS

    r = load_config(os.path.join(CONFIGS_DIR, "robust.yaml"))
    h = load_config(os.path.join(CONFIGS_DIR, "headline.yaml"))
    assert r.detector == h.detector
    assert dataclasses.replace(
        r.tracker, byte_low_threshold=0.0, iou_buffer=0.0
    ) == h.tracker

    # (a) benign golden clip: same quality regime as headline
    m = _run_preset_tracker("robust.yaml")
    assert m.mota >= 0.92, m.as_dict()
    assert m.idf1 >= 0.95, m.as_dict()
    assert m.num_idsw <= 3, m.as_dict()

    # (b) hostile occlusion-dip clip: robust must beat headline
    dets, gt = generate_clip(HOSTILE_CLIPS["occl_dips"])
    frames = HOSTILE_CLIPS["occl_dips"].num_frames
    _, r_outs = Tracker(r.tracker).run(dets)
    _, h_outs = Tracker(h.tracker).run(dets)
    rm = evaluate_mot(gt_to_frames(gt), track_outputs_to_frames(r_outs, frames))
    hm = evaluate_mot(gt_to_frames(gt), track_outputs_to_frames(h_outs, frames))
    assert rm.mota >= hm.mota + 0.05, (rm.as_dict(), hm.as_dict())
    assert rm.idf1 >= hm.idf1 + 0.04, (rm.as_dict(), hm.as_dict())


def test_headline_centernet_preset_quality_floor():
    """headline_centernet.yaml differs from headline.yaml ONLY in
    detector.head_family — its tracker settings (and therefore this
    scripted-stream quality) must be IDENTICAL to the headline's."""
    m = _run_preset_tracker("headline_centernet.yaml")
    h = _run_preset_tracker("headline.yaml")
    assert m.as_dict() == h.as_dict(), (m.as_dict(), h.as_dict())
