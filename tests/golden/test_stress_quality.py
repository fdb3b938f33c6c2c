"""Tracker robustness at Waymo-like density stress (BASELINE.md round 3).

The golden clip (12 objects, 2 px noise, 5% miss) leaves assignment nearly
unambiguous. These clips push to 36-40 objects, 6-8 px box noise, 12-15%
miss and 2 FP/frame — the regime where a Hungarian-vs-greedy difference
would show if one existed. Locks in two measured claims:

1. quality floors at density (no mostly-lost trajectories, bounded IDSW);
2. auction (scipy-equal Hungarian) and greedy produce IDENTICAL metrics on
   these clips — the measured basis for `fast.yaml`'s greedy choice and
   for keeping auction on ReID presets for semantics rather than a quality
   edge (BASELINE.md "Stress probes" paragraph).

Measured 2026-08-17 (both assignments, both clips identical):
crowded     mota 0.8696 idf1 0.9282 idsw 9  fp 6 mt 35 ml 0
dense_noisy mota 0.8427 idf1 0.9126 idsw 11 fp 3 mt 36 ml 0
"""
import dataclasses

import pytest

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import (
    SyntheticClipConfig,
    generate_clip,
)
from waymo_2d_tracking_tpu.eval.mot import (
    evaluate_mot,
    gt_to_frames,
    track_outputs_to_frames,
)
from waymo_2d_tracking_tpu.tracker import Tracker

AUCTION = TrackerConfig(
    max_tracks=64, max_detections=64, embed_dim=128,
    appearance_weight=0.3, appearance_gate=0.5,
    n_init=3, max_age=3, iou_threshold=0.3,
    reid_recovery=True, max_lost_age=30, gallery_size=4,
)
GREEDY = dataclasses.replace(AUCTION, assignment="greedy")

STRESS = {
    "crowded": SyntheticClipConfig(
        num_frames=150, num_objects=36, det_noise_px=6.0,
        miss_prob=0.12, false_pos_per_frame=2.0, seed=11,
    ),
    "dense_noisy": SyntheticClipConfig(
        num_frames=150, num_objects=40, det_noise_px=8.0,
        miss_prob=0.15, false_pos_per_frame=2.0, seed=7,
    ),
}
FLOORS = {   # just under the measured values above
    "crowded": dict(mota=0.84, idf1=0.90, idsw=12),
    "dense_noisy": dict(mota=0.81, idf1=0.88, idsw=15),
}


def _metrics(cfg, clip):
    dets, gt = generate_clip(clip)
    _, outs = Tracker(cfg).run(dets)
    return evaluate_mot(
        gt_to_frames(gt), track_outputs_to_frames(outs, clip.num_frames)
    )


@pytest.mark.parametrize("name", sorted(STRESS))
def test_stress_floor_and_assignment_equivalence(name):
    clip = STRESS[name]
    ma = _metrics(AUCTION, clip)
    mg = _metrics(GREEDY, clip)
    floor = FLOORS[name]
    for m in (ma, mg):
        assert m.mota >= floor["mota"], (name, m.as_dict())
        assert m.idf1 >= floor["idf1"], (name, m.as_dict())
        assert m.num_idsw <= floor["idsw"], (name, m.as_dict())
        assert m.mostly_lost == 0, (name, m.as_dict())
    # the equivalence claim: identical CLEAR-MOT metrics, not just close
    assert ma.as_dict() == mg.as_dict(), (name, ma.as_dict(), mg.as_dict())


@pytest.mark.parametrize("name", sorted(STRESS))
def test_stress_interp_repairs_fn_floor(name):
    """Offline gap interpolation on the stress clips (BASELINE.md round 3,
    session 3): the FN floor there is detector misses (hard drops, not
    score dips — BYTE/NSA/buffered-IoU all measured as exact no-ops on
    these clips), and max_gap=5 linear fill repairs it:
    crowded 0.8696 -> 0.9876 MOTA, dense_noisy 0.8427 -> 0.9886."""
    import numpy as np

    from waymo_2d_tracking_tpu.io_out.postprocess import (
        interpolate_gaps_offline,
    )
    from waymo_2d_tracking_tpu.io_out.submission import (
        records_from_track_outputs,
    )

    clip = STRESS[name]
    dets, gt = generate_clip(clip)
    _, outs = Tracker(AUCTION).run(dets)
    recs = records_from_track_outputs(
        outs, "s", list(range(clip.num_frames)), 1)
    recs = interpolate_gaps_offline(recs, max_gap=5)

    by_ts, ids = {}, {}
    for r in recs:
        by_ts.setdefault(r.timestamp_micros, []).append(r)
    hyp = []
    for t in range(clip.num_frames):
        rows = by_ts.get(t, [])
        hyp.append((
            np.array([ids.setdefault(r.object_id, len(ids)) for r in rows],
                     np.int64),
            np.array([r.to_xyxy() for r in rows]).reshape(-1, 4),
        ))
    m = evaluate_mot(gt_to_frames(gt), hyp)
    base = _metrics(AUCTION, clip)
    assert m.mota >= 0.97, (name, m.as_dict())
    assert m.idf1 >= 0.97, (name, m.as_dict())
    assert m.num_idsw <= base.num_idsw  # fill never creates new switches
