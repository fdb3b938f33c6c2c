"""Track gap interpolation (io_out/postprocess.py).

Unit semantics (fill, bounds, cross-track isolation, determinism) plus the
quality claim: on the golden synthetic clip the pass repairs most of the
injected 5% per-frame detection misses without adding false positives
(long occlusion gaps are NOT filled).
"""
from collections import defaultdict

import numpy as np
import pytest

from waymo_2d_tracking_tpu.io_out.postprocess import (
    interpolate_gaps,
    interpolate_gaps_offline,
)
from waymo_2d_tracking_tpu.io_out.submission import TrackRecord


def _rec(ts, oid="a", cx=10.0, cy=20.0, ln=8.0, w=6.0, score=0.9,
         ctx="c", cam=1, otype=1):
    return TrackRecord(
        context_name=ctx, timestamp_micros=ts, camera_name=cam,
        object_id=oid, object_type=otype, center_x=cx, center_y=cy,
        length=ln, width=w, score=score,
    )


GRID = [1000 * i for i in range(10)]


def test_single_frame_gap_filled_linearly():
    recs = [_rec(0, cx=10.0, score=1.0), _rec(2000, cx=30.0, score=0.5)]
    out = interpolate_gaps(recs, GRID, max_gap=1)
    assert len(out) == 3
    mid = [r for r in out if r.timestamp_micros == 1000][0]
    assert mid.center_x == pytest.approx(20.0)
    assert mid.score == pytest.approx(0.75)
    assert mid.object_id == "a" and mid.object_type == 1


def test_gap_longer_than_max_gap_untouched():
    recs = [_rec(0), _rec(4000)]   # 3 missing frames
    assert len(interpolate_gaps(recs, GRID, max_gap=2)) == 2
    assert len(interpolate_gaps(recs, GRID, max_gap=3)) == 5


def test_max_gap_zero_is_identity():
    recs = [_rec(0), _rec(3000)]
    assert interpolate_gaps(recs, GRID, max_gap=0) == recs
    assert interpolate_gaps_offline(recs, max_gap=0) == recs


def test_no_cross_track_or_cross_camera_bleed():
    recs = [
        _rec(0, oid="a"), _rec(2000, oid="a"),
        _rec(0, oid="b", cx=100.0), _rec(2000, oid="b", cx=200.0),
        # same object_id string on another camera: separate track
        _rec(0, oid="a", cam=2, cx=50.0), _rec(4000, oid="a", cam=2),
    ]
    out = interpolate_gaps(recs, GRID, max_gap=1)
    added = [r for r in out if r.timestamp_micros == 1000]
    assert {(r.object_id, r.camera_name) for r in added} == {("a", 1), ("b", 1)}
    b_mid = [r for r in added if r.object_id == "b"][0]
    assert b_mid.center_x == pytest.approx(150.0)


def test_consecutive_frames_not_duplicated():
    recs = [_rec(0), _rec(1000), _rec(2000)]
    assert len(interpolate_gaps(recs, GRID, max_gap=5)) == 3


def test_off_grid_timestamp_passthrough():
    recs = [_rec(0), _rec(2500), _rec(4000)]   # 2500 not on grid
    out = interpolate_gaps(recs, GRID, max_gap=5)
    # 0 -> 4000 is a 3-frame hole on the grid; 2500 rides along untouched
    assert len(out) == 6
    assert sum(r.timestamp_micros == 2500 for r in out) == 1


def test_offline_grid_inference_with_jitter():
    # ~100ms period with microsecond jitter; one 1-frame hole for track a
    ts = [0, 100_003, 199_998, 300_001, 400_000]
    recs = [_rec(t, oid="b", cx=5.0) for t in ts]            # dense track
    recs += [_rec(ts[0], oid="a", cx=10.0),
             _rec(ts[2], oid="a", cx=30.0)]                   # gap at ts[1]
    out = interpolate_gaps_offline(recs, max_gap=1)
    added = [r for r in out if r.object_id == "a"
             and r.timestamp_micros == ts[1]]
    assert len(added) == 1
    assert added[0].center_x == pytest.approx(20.0)


def test_offline_hole_in_every_track():
    # NO track observed at the missing frame: rank-based grid synthesizes it
    recs = [_rec(0, oid="a"), _rec(200_000, oid="a"),
            _rec(0, oid="b", cx=50.0), _rec(200_000, oid="b", cx=70.0),
            _rec(300_000, oid="b", cx=80.0)]
    out = interpolate_gaps_offline(recs, max_gap=1)
    added = sorted(
        (r for r in out if r.timestamp_micros not in (0, 200_000, 300_000)),
        key=lambda r: r.object_id,
    )
    assert [r.object_id for r in added] == ["a", "b"]
    assert added[0].timestamp_micros == pytest.approx(100_000, abs=2)


def test_deterministic_order():
    recs = [_rec(2000, oid="b"), _rec(0, oid="b"),
            _rec(0, oid="a"), _rec(2000, oid="a")]
    out1 = interpolate_gaps(recs, GRID, max_gap=1)
    out2 = interpolate_gaps(list(reversed(recs)), GRID, max_gap=1)
    assert out1 == out2
    keys = [(r.timestamp_micros, r.object_id) for r in out1]
    assert keys == sorted(keys)


def _records_to_hyp_frames(records, timestamps):
    intern: dict = {}
    by_ts = defaultdict(list)
    for r in records:
        by_ts[r.timestamp_micros].append(r)
    frames = []
    for ts in timestamps:
        rows = by_ts.get(ts, [])
        ids = np.array(
            [intern.setdefault(r.object_id, len(intern)) for r in rows],
            np.int64,
        )
        boxes = np.array([r.to_xyxy() for r in rows]).reshape(-1, 4)
        frames.append((ids, boxes))
    return frames


def test_golden_clip_interp_repairs_misses():
    """End-to-end quality: tracker outputs on the golden clip, with and
    without interpolation. Misses (5%/frame injected) are largely repaired;
    the 30-frame occlusion gap must NOT be filled at max_gap=5 (GT marks
    those frames absent — filling them would add FPs, not fix FNs)."""
    from tests.golden.test_golden_clip import CFG3, CLIP
    from waymo_2d_tracking_tpu.data.synthetic import generate_clip
    from waymo_2d_tracking_tpu.eval.mot import evaluate_mot, gt_to_frames
    from waymo_2d_tracking_tpu.io_out.submission import (
        records_from_track_outputs,
    )
    from waymo_2d_tracking_tpu.tracker import Tracker

    dets, gt = generate_clip(CLIP)
    _, outputs = Tracker(CFG3).run(dets)
    timestamps = list(range(0, CLIP.num_frames * 1000, 1000))

    base = records_from_track_outputs(outputs, "ctx", timestamps, 1)
    interp = interpolate_gaps(base, timestamps, max_gap=5)

    gt_frames = gt_to_frames(gt)
    m0 = evaluate_mot(gt_frames, _records_to_hyp_frames(base, timestamps))
    m1 = evaluate_mot(gt_frames, _records_to_hyp_frames(interp, timestamps))
    d0, d1 = m0.as_dict(), m1.as_dict()
    assert m1.num_fn < m0.num_fn * 0.45, (d0, d1)     # most misses repaired
    assert m1.num_fp <= m0.num_fp + 2, (d0, d1)       # no FP regression
    assert m1.mota > m0.mota + 0.03, (d0, d1)
    assert m1.num_idsw <= m0.num_idsw, (d0, d1)
