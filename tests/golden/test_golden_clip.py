"""Golden/parity test over the frozen synthetic 200-frame clip (SURVEY.md §4).

Mirrors BASELINE config 1 (IoU-only SORT over precomputed detections, CPU).
Two layers of protection:
  1. Quality floor: MOTA/IDSW bounds on the synthetic clip — catches
     behavioral regressions robustly.
  2. Golden freeze: exact per-frame (frame, id, box) emissions are compared
     against tests/golden/golden_config1.npz; regenerate deliberately with
     `python tests/golden/regen_golden.py` after an intended behavior change.
"""
import os

import numpy as np

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
from waymo_2d_tracking_tpu.eval.mot import (
    evaluate_mot,
    gt_to_frames,
    track_outputs_to_frames,
)
from waymo_2d_tracking_tpu.tracker import Tracker

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_config1.npz")

CLIP = SyntheticClipConfig(num_frames=200, num_objects=12, seed=0)
CFG = TrackerConfig(
    max_tracks=64, max_detections=64, embed_dim=0,
    n_init=3, max_age=3, iou_threshold=0.3,
)


def run_config1():
    dets, gt = generate_clip(CLIP)
    tracker = Tracker(CFG)
    state, outs = tracker.run(dets)
    return outs, gt


def test_config1_quality_floor():
    outs, gt = run_config1()
    m = evaluate_mot(gt_to_frames(gt), track_outputs_to_frames(outs, CLIP.num_frames))
    # the clip has 5% random misses + occlusion gap + false positives;
    # a healthy SORT should still land comfortably high on it
    assert m.mota > 0.80, m.as_dict()
    assert m.motp > 0.85, m.as_dict()
    assert m.num_idsw <= 6, m.as_dict()
    assert m.idf1 > 0.85, m.as_dict()
    assert m.mostly_tracked == 12 and m.mostly_lost == 0, m.as_dict()


def test_config1_matches_golden():
    if not os.path.exists(GOLDEN_PATH):
        import pytest

        pytest.skip("golden file missing; run tests/golden/regen_golden.py")
    outs, _ = run_config1()
    golden = np.load(GOLDEN_PATH)
    valid = np.asarray(outs.valid)
    np.testing.assert_array_equal(valid, golden["valid"])
    ids = np.where(valid, np.asarray(outs.track_id), -1)
    np.testing.assert_array_equal(ids, golden["track_id"])
    boxes = np.where(valid[..., None], np.asarray(outs.boxes), 0.0)
    np.testing.assert_allclose(boxes, golden["boxes"], atol=0.2)


# ----------------------------------------------------- config-3 (ReID) freeze

GOLDEN3_PATH = os.path.join(os.path.dirname(__file__), "golden_config3.npz")

CFG3 = TrackerConfig(
    max_tracks=64, max_detections=64, embed_dim=128,
    appearance_weight=0.3, appearance_gate=0.5,
    n_init=3, max_age=3, iou_threshold=0.3,
    reid_recovery=True, max_lost_age=30, gallery_size=4,
)


def run_config3():
    dets, gt = generate_clip(CLIP)
    tracker = Tracker(CFG3)
    state, outs = tracker.run(dets)
    return outs, gt


def test_config3_quality_floor():
    outs, gt = run_config3()
    m = evaluate_mot(gt_to_frames(gt), track_outputs_to_frames(outs, CLIP.num_frames))
    # appearance must IMPROVE identity quality over the IoU-only config
    # (measured: IDF1 0.913 -> 0.967, IDSW 4 -> 2 on this clip)
    assert m.mota > 0.80, m.as_dict()
    assert m.num_idsw <= 4, m.as_dict()
    assert m.idf1 > 0.93, m.as_dict()


def test_config3_matches_golden():
    if not os.path.exists(GOLDEN3_PATH):
        import pytest

        pytest.skip("golden file missing; run tests/golden/regen_golden.py")
    outs, _ = run_config3()
    golden = np.load(GOLDEN3_PATH)
    valid = np.asarray(outs.valid)
    np.testing.assert_array_equal(valid, golden["valid"])
    ids = np.where(valid, np.asarray(outs.track_id), -1)
    np.testing.assert_array_equal(ids, golden["track_id"])
