"""BYTE low-score second association (ByteTrack-style, opt-in).

Covers the three contracts of ``TrackerConfig.byte_low_threshold``:

1. no-op safety: with BYTE enabled but no low-score detections present the
   outputs are bit-identical to BYTE off;
2. the point of it: a 25-frame score-dip window (detections present but
   below score_threshold) destroys identity continuity without BYTE and is
   ridden out with it;
3. low-score detections can sustain tracks but never create them.
"""
import dataclasses

import numpy as np

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import (
    SyntheticClipConfig,
    generate_clip,
    scripted_detections,
)
from waymo_2d_tracking_tpu.eval.mot import (
    evaluate_mot,
    gt_to_frames,
    track_outputs_to_frames,
)
from waymo_2d_tracking_tpu.tracker import Tracker

BASE = TrackerConfig(
    max_tracks=64, max_detections=64, embed_dim=128,
    n_init=3, max_age=3, iou_threshold=0.3,
)
BYTE = dataclasses.replace(BASE, byte_low_threshold=0.1)


def _run(cfg, clip):
    dets, gt = generate_clip(clip)
    _, outs = Tracker(cfg).run(dets)
    metrics = evaluate_mot(
        gt_to_frames(gt), track_outputs_to_frames(outs, clip.num_frames)
    )
    return outs, metrics


def test_byte_noop_without_low_dets():
    # All synthetic true-detection scores are >= 0.8 and FP scores >= 0.5,
    # so the low band [0.1, 0.5) is empty: BYTE must change nothing.
    clip = SyntheticClipConfig(num_frames=80, num_objects=10, seed=3,
                               false_pos_per_frame=0.0)
    outs_off, m_off = _run(BASE, clip)
    outs_on, m_on = _run(BYTE, clip)
    assert m_off.as_dict() == m_on.as_dict()
    np.testing.assert_array_equal(np.asarray(outs_off.track_id),
                                  np.asarray(outs_on.track_id))
    np.testing.assert_array_equal(np.asarray(outs_off.valid),
                                  np.asarray(outs_on.valid))


def test_byte_rides_out_score_dips():
    # Frames 40-65: objects 0-2 still detected but at score 0.15-0.4 —
    # invisible to stage 1 (score_threshold 0.5). Without BYTE each dipped
    # object ages out (max_age 3) and re-acquires a fresh id; with BYTE the
    # low-score boxes sustain the original identity.
    clip = SyntheticClipConfig(
        num_frames=100, num_objects=10, miss_prob=0.0,
        false_pos_per_frame=0.0, occlusion_gap=(0, 0),
        dip_window=(40, 65), dip_objects=3, seed=5,
    )
    _, m_off = _run(BASE, clip)
    _, m_on = _run(BYTE, clip)
    # without BYTE: >=3 identity breaks and a pile of false negatives
    assert m_off.num_idsw >= 3
    # with BYTE: continuity restored, strictly better on every axis
    assert m_on.num_idsw <= m_off.num_idsw - 3
    assert m_on.num_fn < m_off.num_fn
    assert m_on.mota > m_off.mota
    assert m_on.idf1 > m_off.idf1


def test_byte_low_dets_never_birth():
    # A clip of ONLY low-score detections: with BYTE on, nothing may ever
    # be tracked (no confirmed rows exist for the second pass to sustain,
    # and low scores are below birth_score_threshold).
    frames = [[([100.0, 100.0, 200.0, 200.0], 0.3, 0)]] * 20
    dets = scripted_detections(frames)
    cfg = dataclasses.replace(
        BYTE, embed_dim=0, max_detections=int(dets.boxes.shape[1])
    )
    _, outs = Tracker(cfg).run(dets)
    assert not bool(np.asarray(outs.valid).any())
