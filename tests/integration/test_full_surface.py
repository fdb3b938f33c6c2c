"""Full-surface drive (VERDICT r2 missing #2 / item 4): ONE test chains the
whole product surface on a self-encoded multi-camera tfrecord with labels —

  convert -> train (input pipeline + checkpoint + export) -> detect (TTA
  preset, trained params) -> eval-det -> track --sharded (trained params,
  gallery sidecars) -> link -> submit -> read_waymo_pb round-trip -> eval
  (pooled OVERALL row) -> draw

Every CLI verb runs in sequence against the same data. Quality is NOT
asserted (3 train steps, random-ish weights); the invariants are structural:
each stage consumes the previous stage's artifact and produces a parseable
one. RUNBOOK.md documents the same sequence for the day real Waymo
data/reference weights appear.
"""
import json
import os

import numpy as np
import pytest

from waymo_2d_tracking_tpu import cli
from waymo_2d_tracking_tpu.data import waymo
from waymo_2d_tracking_tpu.io_out import submission as subm

NUM_CAMS = 2
T = 6
HW = (64, 96)

SLIM_SET = [
    "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
    "detector.fpn_channels=32", "detector.head_depth=1",
    "detector.fpn_levels=[3,4,5]",
    "detector.pre_nms_topk=32", "detector.max_detections=8",
    "detector.embed_dim=8", "detector.dtype=float32",
    "detector.score_threshold=0.01",
    "tracker.max_detections=8", "tracker.embed_dim=8", "tracker.n_init=1",
    "tracker.score_threshold=0.0", "tracker.birth_score_threshold=0.0",
    'pipeline.cameras=["FRONT","FRONT_LEFT"]', "pipeline.chunk_frames=4",
]


def _make_tfrecord(data_dir):
    """Two-camera labeled segment: colored rectangles on noise."""
    import cv2

    rng = np.random.default_rng(0)
    os.makedirs(data_dir, exist_ok=True)
    frames_pb = []
    gt_records = []
    for t in range(T):
        ts = 1000 * t
        images, labels = {}, {}
        for cam in range(1, NUM_CAMS + 1):
            img = rng.integers(0, 60, HW + (3,), np.uint8)
            labs = []
            for k in range(2):
                x1 = 8 + 20 * k + 2 * t + 4 * cam
                y1 = 10 + 14 * k
                x2, y2 = x1 + 16, y1 + 12
                img[y1:y2, x1:x2] = (220, 40 + 80 * k, 60)
                labs.append({"id": f"obj{cam}_{k}", "type": 1,
                             "xyxy": (float(x1), float(y1),
                                      float(x2), float(y2))})
                gt_records.append(subm.TrackRecord.from_xyxy(
                    "ctxF", ts, cam, f"obj{cam}_{k}", 1,
                    (x1, y1, x2, y2), 1.0,
                ))
            ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, 95])
            assert ok
            images[cam] = enc.tobytes()
            labels[cam] = labs
        frames_pb.append(
            waymo.encode_frame("ctxF", ts, images=images, labels=labels)
        )
    waymo.write_tfrecord(os.path.join(data_dir, "ctxF.tfrecord"), frames_pb)
    return gt_records


@pytest.mark.slow
def test_full_surface_chain(tmp_path, capsys):
    data = str(tmp_path / "data")
    gt_records = _make_tfrecord(data)
    gt_path = str(tmp_path / "gt.jsonl")
    subm.write_jsonl(gt_path, gt_records)

    # 1. convert -> COCO detection dataset
    coco = str(tmp_path / "coco")
    cli.main(["convert", "--segments-dir", data, "--out-dir", coco])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["images"] == T * NUM_CAMS
    anns = json.load(open(os.path.join(coco, "annotations.json")))
    assert len(anns["annotations"]) == T * NUM_CAMS * 2

    # 2. train 3 steps on the converted data (background input workers +
    # device prefetch), checkpoint + serving export
    ckpt = str(tmp_path / "ckpt")
    cli.main([
        "train", "--data-dir", coco, "--steps", "3", "--set", *SLIM_SET,
        "train.batch_size=2", "train.warmup_steps=1",
        "train.checkpoint_dir=" + ckpt, "train.checkpoint_every=1000",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    export = out["export"]
    assert os.path.isdir(export)
    assert os.path.isdir(os.path.join(ckpt, "step_3"))

    # 3. detect with the trained export under a TTA preset
    dets_path = str(tmp_path / "dets.jsonl")
    cli.main([
        "detect", "--segments-dir", data, "--out", dets_path,
        "--params", export, "--set", *SLIM_SET, "pipeline.tta_flip=true",
    ])
    capsys.readouterr()
    det_rows = subm.read_jsonl(dets_path)
    assert all(r.context_name == "ctxF" for r in det_rows)

    # 4. detection AP of those detections vs GT
    cli.main(["eval-det", "--pred", dets_path, "--gt", gt_path])
    ap = json.loads(capsys.readouterr().out)
    assert "mAP" in ap and "AP50" in ap

    # 5. track --sharded with the same params: per-camera files + gallery
    # sidecars + manifest
    track_out = str(tmp_path / "tracks")
    cli.main([
        "track", "--segments-dir", data, "--out-dir", track_out, "--sharded",
        "--params", export, "--set", *SLIM_SET,
    ])
    capsys.readouterr()
    files = sorted(os.listdir(track_out))
    assert "manifest.jsonl" in files
    for cam in range(1, NUM_CAMS + 1):
        assert f"ctxF_{cam}.jsonl" in files
        assert f"ctxF_{cam}.gallery.npz" in files

    # 6. cross-camera identity linking over the gallery sidecars
    cli.main(["link", "--out-dir", track_out])
    report = json.loads(capsys.readouterr().out)
    linked = os.path.join(track_out, "linked")
    assert os.path.isdir(linked)

    # 7. submit: linked JSONL -> Waymo pb -> read back (round-trip)
    linked_files = [os.path.join(linked, f) for f in sorted(os.listdir(linked))
                    if f.endswith(".jsonl")]
    assert linked_files
    pb_path = str(tmp_path / "submission.pb")
    cli.main(["submit", *linked_files, "--out", pb_path])
    out = json.loads(capsys.readouterr().out)
    rt = subm.read_waymo_pb(pb_path)
    assert len(rt) == out["objects"]
    merged = []
    for f in linked_files:
        merged.extend(subm.read_jsonl(f))
    assert len(rt) == len(merged)

    # 8. MOT eval of the (merged) tracks vs GT: per-camera rows + pooled
    # OVERALL row
    pred_path = str(tmp_path / "pred.jsonl")
    subm.write_jsonl(pred_path, merged)
    cli.main(["eval", "--hota", "--per-class",
              "--pred", pred_path, "--gt", gt_path])
    mot = json.loads(capsys.readouterr().out)
    assert "OVERALL" in mot
    assert {f"ctxF/{c}" for c in range(1, NUM_CAMS + 1)} <= set(mot)
    assert mot["OVERALL"]["num_gt"] == len(gt_records)
    assert 0.0 <= mot["OVERALL"]["hota"] <= 1.0
    assert any(k.startswith("CLASS_") for k in mot)

    # 9. draw: render tracked boxes back onto the frames
    viz = str(tmp_path / "viz")
    cli.main(["draw", "--tracks", pred_path, "--segments-dir", data,
              "--out-dir", viz, "--max-frames", "2", "--set", *SLIM_SET])
    out = json.loads(capsys.readouterr().out)
    assert out["frames"] > 0
