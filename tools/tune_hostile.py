"""`w2t tune` signal check on the hostile clips (VERDICT r3 item 6).

Round 3's tune runs had no realistic signal: every knob measured as a
no-op on the constant-velocity stress clips. This converts a hostile clip
(data/synthetic.py HOSTILE_CLIPS) into the tune verb's native input
(detection rows + GT rows) and runs the committed random search — the top
trials should now turn the regime's knob ON (byte_low_threshold > 0 for
occl_dips).

Run: python tools/tune_hostile.py [clip] [trials]
"""
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

import numpy as np

from waymo_2d_tracking_tpu.config import load_config
from waymo_2d_tracking_tpu.data.synthetic import HOSTILE_CLIPS, generate_clip
from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.pipeline.tune import tune_tracker

DT = 100_000  # 10 Hz


def clip_to_rows(name: str):
    """(det_rows, gt_rows) TrackRecord lists for one hostile clip."""
    clip = HOSTILE_CLIPS[name]
    dets, gt = generate_clip(clip)
    stamps = [1_000_000 + t * DT for t in range(clip.num_frames)]
    det_rows = subm.records_from_detections(dets, name, stamps, 1)
    gt_rows = []
    for t in range(clip.num_frames):
        for k in range(gt["boxes"].shape[1]):
            if not gt["present"][t, k]:
                continue
            gt_rows.append(subm.TrackRecord.from_xyxy(
                name, stamps[t], 1, f"obj{k}", 1,
                tuple(float(v) for v in gt["boxes"][t, k]), 1.0,
            ))
    return det_rows, gt_rows


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "occl_dips"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    det_rows, gt_rows = clip_to_rows(name)
    # tune runs over precomputed detection ROWS (no embeddings), so the
    # base config is appearance-free — the IoU/score/lifecycle knob space
    cfg = load_config(None, {
        "tracker": {"max_tracks": 64, "max_detections": 64, "embed_dim": 0,
                    "appearance_weight": 0.0,
                    "n_init": 3, "max_age": 3},
    })
    report = tune_tracker(det_rows, gt_rows, cfg, trials=trials, seed=0)
    print("best_overrides:", report["best_overrides"])
    for r in report["results"][:5]:
        print(json.dumps(r))
