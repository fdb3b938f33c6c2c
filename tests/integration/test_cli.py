"""CLI integration (C25): config-1 track-from-detections, submit, eval."""
import json
import os

import numpy as np
import pytest

from waymo_2d_tracking_tpu import cli
from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
from waymo_2d_tracking_tpu.io_out import submission as subm


@pytest.fixture()
def detections_file(tmp_path):
    """Synthetic clip detections serialized as a detections JSONL."""
    dets, gt = generate_clip(SyntheticClipConfig(num_frames=30, num_objects=5,
                                                 max_detections=32, embed_dim=1))
    recs = subm.records_from_detections(
        dets, "ctx0", [1000 * t for t in range(30)], camera_name=1
    )
    path = str(tmp_path / "dets.jsonl")
    subm.write_jsonl(path, recs)
    return path, gt


def test_track_from_detections_and_eval(detections_file, tmp_path, capsys):
    dets_path, gt = detections_file
    out_path = str(tmp_path / "tracks.jsonl")
    cli.main([
        "track", "--from-detections", dets_path, "--out", out_path,
        "--set", "tracker.max_detections=32", "tracker.embed_dim=0",
        "tracker.n_init=2",
    ])
    assert os.path.exists(out_path)
    tracks = subm.read_jsonl(out_path)
    assert tracks, "no tracks produced"
    # every record's id persists over multiple frames for real objects
    ids = {}
    for r in tracks:
        ids.setdefault(r.object_id, []).append(r.timestamp_micros)
    assert max(len(v) for v in ids.values()) > 10

    # gt file from synthetic ground truth
    gt_recs = []
    for t in range(30):
        for k in np.flatnonzero(gt["present"][t]):
            gt_recs.append(subm.TrackRecord.from_xyxy(
                "ctx0", 1000 * t, 1, f"gt{k}", 1, gt["boxes"][t, k], 1.0))
    gt_path = str(tmp_path / "gt.jsonl")
    subm.write_jsonl(gt_path, gt_recs)

    capsys.readouterr()  # drop the track command's status line
    cli.main(["eval", "--pred", out_path, "--gt", gt_path])
    out = capsys.readouterr().out
    metrics = json.loads(out)
    m = metrics["ctx0/1"]
    assert m["mota"] > 0.5, m


def test_submit_pb(detections_file, tmp_path):
    dets_path, _ = detections_file
    pb_path = str(tmp_path / "sub.pb")
    cli.main(["submit", dets_path, "--out", pb_path])
    back = subm.read_waymo_pb(pb_path)
    orig = subm.read_jsonl(dets_path)
    assert len(back) == len(orig)
    assert back[0].context_name == "ctx0"
