"""Knob sweep over the HOSTILE synthetic clips (VERDICT r3 item 6).

The round-3 stress clips (constant velocity, uniform ~0.9 scores) left
every opt-in association knob measuring as a no-op; these clips script the
regimes the knobs exist for:

  occl_dips  : dense scene, occlusion-coupled score dips (+noise, +miss)
               -> BYTE second association's regime (low-score recovery)
  curved_pan : per-object acceleration + sinusoidal camera pan + occlusion
               dips -> buffered-IoU / NSA / motion-model stress
  storm      : birth/death storm + distance-coupled noise -> lifecycle churn

Tracker-only on CPU (no detector in the loop). Prints one metrics table;
the committed floors live in tests/golden/test_hostile_quality.py and the
measured table in BASELINE.md.
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waymo_2d_tracking_tpu.config import KalmanConfig, TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import (
    HOSTILE_CLIPS as CLIPS,
    generate_clip,
)
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

VARIANTS = {
    "base": BASE,
    "byte0.1": dataclasses.replace(BASE, byte_low_threshold=0.1),
    "byte0.3": dataclasses.replace(BASE, byte_low_threshold=0.3),
    "biou0.3": dataclasses.replace(BASE, iou_buffer=0.3),
    "biou0.5": dataclasses.replace(BASE, iou_buffer=0.5),
    "nsa": dataclasses.replace(BASE, kalman=KalmanConfig(nsa=True)),
    "momentum": dataclasses.replace(BASE, recovery_momentum=True),
    "byte+biou": dataclasses.replace(
        BASE, byte_low_threshold=0.1, iou_buffer=0.3),
    "byte+biou+nsa": dataclasses.replace(
        BASE, byte_low_threshold=0.1, iou_buffer=0.3,
        kalman=KalmanConfig(nsa=True)),
    # round 5: motion_gate regime measurement (VERDICT r4 item 1c) against
    # the projected-innovation statistic (chi2 4-dof: 95% = 9.4877,
    # 99.9% = 18.467)
    "mgate9.5": dataclasses.replace(BASE, motion_gate=9.4877),
    "mgate18.5": dataclasses.replace(BASE, motion_gate=18.467),
    "byte+biou+mg": dataclasses.replace(
        BASE, byte_low_threshold=0.1, iou_buffer=0.3, motion_gate=9.4877),
}


def run(clip_cfg, tracker_cfg):
    dets, gt = generate_clip(clip_cfg)
    _, outs = Tracker(tracker_cfg).run(dets)
    m = evaluate_mot(
        gt_to_frames(gt),
        track_outputs_to_frames(outs, clip_cfg.num_frames),
    )
    return {"mota": round(m.mota, 4), "idf1": round(m.idf1, 4),
            "idsw": m.num_idsw, "fn": m.num_fn, "fp": m.num_fp,
            "ml": m.mostly_lost}


if __name__ == "__main__":
    names = sys.argv[1:] or sorted(CLIPS)
    out = {}
    for cname in names:
        out[cname] = {}
        for vname, vcfg in VARIANTS.items():
            r = run(CLIPS[cname], vcfg)
            out[cname][vname] = r
            print(f"{cname:11s} {vname:14s} "
                  f"mota {r['mota']:.4f} idf1 {r['idf1']:.4f} "
                  f"idsw {r['idsw']:3d} fn {r['fn']:4d} fp {r['fp']:3d} "
                  f"ml {r['ml']}", flush=True)
    print(json.dumps(out))
