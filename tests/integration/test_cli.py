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

    # --hota merges HOTA/DetA/AssA into the same rows
    cli.main(["eval", "--hota", "--pred", out_path, "--gt", gt_path])
    mh = json.loads(capsys.readouterr().out)["ctx0/1"]
    assert 0.0 < mh["hota"] <= 1.0, mh
    assert {"deta", "assa", "loca", "hota_50"} <= set(mh), mh
    assert mh["hota"] >= 0.5 * m["mota"], mh  # sane on a good tracker

    # --per-class adds pooled per-type rows. GT here is all VEHICLE while
    # predictions carry the synthetic clip's mixed classes, so the vehicle
    # row sees every GT but only type-1 predictions (wrong-type predictions
    # can never match — the Waymo per-class contract).
    cli.main(["eval", "--per-class", "--pred", out_path, "--gt", gt_path])
    out_pc = json.loads(capsys.readouterr().out)
    assert "CLASS_VEHICLE" in out_pc, sorted(out_pc)
    assert out_pc["CLASS_VEHICLE"]["num_gt"] == m["num_gt"]
    assert out_pc["CLASS_VEHICLE"]["mota"] <= m["mota"] + 1e-9


def test_interp_cli_and_pipeline_knob(detections_file, tmp_path, capsys):
    """`w2t interp` fills gaps offline; `pipeline.interp_max_gap` does the
    same inline during track-from-detections."""
    dets_path, _ = detections_file
    base_path = str(tmp_path / "tracks.jsonl")
    inline_path = str(tmp_path / "tracks_interp.jsonl")
    common = [
        "--set", "tracker.max_detections=32", "tracker.embed_dim=0",
        "tracker.n_init=2",
    ]
    cli.main(["track", "--from-detections", dets_path, "--out", base_path]
             + common)
    cli.main(["track", "--from-detections", dets_path, "--out", inline_path]
             + common + ["pipeline.interp_max_gap=3"])
    base = subm.read_jsonl(base_path)
    inline = subm.read_jsonl(inline_path)
    assert len(inline) > len(base), "inline interp added no records"

    out_path = str(tmp_path / "tracks_offline.jsonl")
    capsys.readouterr()
    cli.main(["interp", base_path, "--out", out_path, "--max-gap", "3"])
    status = json.loads(capsys.readouterr().out)
    offline = subm.read_jsonl(out_path)
    assert status["interpolated"] == len(offline) - len(base) > 0
    # the offline grid-inferring pass reproduces the inline exact-grid one
    key = lambda r: (r.object_id, r.timestamp_micros)
    assert sorted(map(key, offline)) == sorted(map(key, inline))


def test_track_from_detections_rejects_appearance_config(detections_file, tmp_path):
    """Detection files carry no embeddings; a config that actually USES
    appearance (weight > 0 or recovery) must fail fast instead of silently
    gating away every match (observed MOTA 0.94 -> 0.005 with zero-vector
    embeds)."""
    dets_path, _ = detections_file
    for override in ("tracker.appearance_weight=0.5", "tracker.reid_recovery=true"):
        with pytest.raises(SystemExit, match="appearance"):
            cli.main([
                "track", "--from-detections", dets_path,
                "--out", str(tmp_path / "t.jsonl"),
                "--set", override,
            ])


def test_track_from_detections_default_config_ok(detections_file, tmp_path):
    """The default config (embed_dim=128 but appearance_weight=0, no
    recovery) never applies the cosine term, so zero embeds are inert —
    it must run, and match the explicit embed_dim=0 invocation."""
    dets_path, _ = detections_file
    a = str(tmp_path / "default.jsonl")
    b = str(tmp_path / "iou_only.jsonl")
    common = ["--set", "tracker.max_detections=32", "tracker.n_init=2"]
    cli.main(["track", "--from-detections", dets_path, "--out", a] + common)
    cli.main(["track", "--from-detections", dets_path, "--out", b]
             + common + ["tracker.embed_dim=0"])
    key = lambda r: (r.object_id, r.timestamp_micros, r.center_x)
    assert sorted(map(key, subm.read_jsonl(a))) == sorted(map(key, subm.read_jsonl(b)))


def test_track_from_detections_synthesizes_empty_frames(tmp_path):
    """A frame where the detector emitted ZERO detections must still exist
    on the tracker's frame grid: the tracker steps it (coasting) and
    pipeline.interp_max_gap can fill the 1-frame track gap it causes. The
    grid is inferred from timestamp diffs like the offline `w2t interp`
    path, so the two stay equivalent on such input."""
    period = 1000
    recs = []
    for t in range(12):
        if t == 6:
            continue  # detector came up empty this frame for ALL objects
        for k in range(3):
            recs.append(subm.TrackRecord.from_xyxy(
                "ctx0", period * t, 1, f"det{t}_{k}", 1,
                np.array([50.0 * k, 50.0, 50.0 * k + 40.0, 90.0]), 0.9))
    dets_path = str(tmp_path / "dets.jsonl")
    subm.write_jsonl(dets_path, recs)

    base = str(tmp_path / "base.jsonl")
    inline = str(tmp_path / "inline.jsonl")
    common = ["--set", "tracker.max_detections=8", "tracker.embed_dim=0",
              "tracker.n_init=2"]
    cli.main(["track", "--from-detections", dets_path, "--out", base] + common)
    cli.main(["track", "--from-detections", dets_path, "--out", inline]
             + common + ["pipeline.interp_max_gap=2"])
    base_recs = subm.read_jsonl(base)
    inline_recs = subm.read_jsonl(inline)
    # the empty frame exists on the grid: no track emitted output there...
    assert period * 6 not in {r.timestamp_micros for r in base_recs}
    # ...and inline interp synthesized records exactly at that timestamp
    added = len(inline_recs) - len(base_recs)
    assert added == 3, (added, len(base_recs))
    assert {r.timestamp_micros for r in inline_recs} >= {period * 6}

    # offline grid-inferring interp on the base output reproduces inline
    offline = str(tmp_path / "offline.jsonl")
    cli.main(["interp", base, "--out", offline, "--max-gap", "2"])
    key = lambda r: (r.object_id, r.timestamp_micros)
    assert (sorted(map(key, subm.read_jsonl(offline)))
            == sorted(map(key, inline_recs)))


def test_submit_pb(detections_file, tmp_path):
    dets_path, _ = detections_file
    pb_path = str(tmp_path / "sub.pb")
    cli.main(["submit", dets_path, "--out", pb_path])
    back = subm.read_waymo_pb(pb_path)
    orig = subm.read_jsonl(dets_path)
    assert len(back) == len(orig)
    assert back[0].context_name == "ctx0"


def test_detect_cli_on_directory_segments(tmp_path, capsys):
    """detect subcommand: directory segment -> detections JSONL."""
    from waymo_2d_tracking_tpu.data import waymo

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 64, 96, 3), dtype=np.uint8)
    waymo.materialize_directory_segment(
        str(tmp_path / "segs"), "segD", frames, [100 * t for t in range(4)]
    )
    out = str(tmp_path / "dets.jsonl")
    cli.main([
        "detect", "--segments-dir", str(tmp_path / "segs"), "--out", out,
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01", "pipeline.chunk_frames=2",
    ])
    recs = subm.read_jsonl(out)
    assert recs, "no detections written"
    assert {r.timestamp_micros for r in recs} <= {0, 100, 200, 300}
    assert all(r.object_id.startswith("det_") for r in recs)

    # --sharded: same detections via the mesh fan-out, merged into --out
    out2 = str(tmp_path / "dets_shd.jsonl")
    cli.main([
        "detect", "--segments-dir", str(tmp_path / "segs"), "--out", out2,
        "--sharded",
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01", "pipeline.chunk_frames=2",
    ])
    assert subm.read_jsonl(out2) == recs
    assert os.path.isdir(out2 + ".d")

    # resumed rerun (manifest already complete -> zero segments run) must
    # still merge every completed segment's detections into --out
    out3 = str(tmp_path / "dets_resume.jsonl")
    cli.main([
        "detect", "--segments-dir", str(tmp_path / "segs"), "--out", out3,
        "--sharded", "--out-dir", out2 + ".d",
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01", "pipeline.chunk_frames=2",
    ])
    assert subm.read_jsonl(out3) == recs


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path, capsys):
    cli.main([
        "train", "--steps", "2",
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.embed_dim=0", "detector.dtype=float32",
        "train.batch_size=2", "train.warmup_steps=1", "train.total_steps=2",
        f"train.checkpoint_dir={tmp_path}/ckpt", "train.checkpoint_every=100",
    ])
    out = capsys.readouterr().out
    assert "step 2" in out and "loss=" in out
    import os
    assert os.path.isdir(f"{tmp_path}/ckpt/step_2")


def test_track_multicam_cli(tmp_path):
    """--multicam: cameras of one context batched through a shared backbone."""
    import json as _json
    import os

    from waymo_2d_tracking_tpu.data import waymo

    rng = np.random.default_rng(0)
    seg_dir = tmp_path / "segs" / "segM"
    os.makedirs(seg_dir / "frames", exist_ok=True)
    import cv2

    for t in range(4):
        for cam in (1, 2):
            img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
            cv2.imwrite(str(seg_dir / "frames" / f"{t}_{cam}.jpg"), img[:, :, ::-1])
    with open(seg_dir / "meta.json", "w") as f:
        _json.dump({"context_name": "segM",
                    "cameras": {"FRONT": 1, "FRONT_LEFT": 2},
                    "timestamps": [100 * t for t in range(4)]}, f)

    out_dir = str(tmp_path / "out")
    cli.main([
        "track", "--multicam", "--segments-dir", str(tmp_path / "segs"),
        "--out-dir", out_dir,
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_tracks=16", "tracker.max_detections=8",
        "tracker.embed_dim=0", "tracker.score_threshold=0.0",
        "tracker.birth_score_threshold=0.0", "tracker.n_init=1",
        "pipeline.chunk_frames=2",
        'pipeline.cameras=["FRONT","FRONT_LEFT"]',
    ])
    assert os.path.exists(os.path.join(out_dir, "segM_1.jsonl"))
    assert os.path.exists(os.path.join(out_dir, "segM_2.jsonl"))


def test_draw_renders_frames(tmp_path, capsys):
    """`w2t draw` writes one annotated JPEG per frame with boxes burned in."""
    import cv2
    import json as _json

    from waymo_2d_tracking_tpu.data.waymo import materialize_directory_segment

    rng = np.random.default_rng(0)
    frames = np.full((4, 64, 96, 3), 32, np.uint8)
    data = str(tmp_path / "data")
    materialize_directory_segment(data, "ctxv", frames,
                                  [1000 * t for t in range(4)])
    recs = [
        subm.TrackRecord.from_xyxy("ctxv", 1000 * t, 1, f"id{k}", 1,
                                   np.array([10 + 5 * k, 10, 40 + 5 * k, 40]),
                                   0.9)
        for t in range(4) for k in range(2)
    ]
    tracks = str(tmp_path / "tracks.jsonl")
    subm.write_jsonl(tracks, recs)
    out = str(tmp_path / "viz")
    cli.main(["draw", "--tracks", tracks, "--segments-dir", data,
              "--out-dir", out])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 4
    files = sorted(os.listdir(out))
    assert len(files) == 4
    img = cv2.imread(os.path.join(out, files[0]))
    # boxes were drawn: annotated image differs from the flat source
    assert img is not None and img.std() > 5.0

    # --video additionally encodes the annotated frames to one file
    video = str(tmp_path / "demo.avi")   # MJPG: always-available codec
    cli.main(["draw", "--tracks", tracks, "--segments-dir", data,
              "--out-dir", str(tmp_path / "viz2"), "--video", video])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["videos"] == [video]
    cap = cv2.VideoCapture(video)
    try:
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
        ok, vframe = cap.read()
        assert ok and vframe.std() > 5.0
    finally:
        cap.release()


def test_eval_det_cli(detections_file, tmp_path, capsys):
    """eval-det: detections JSONL scored against a GT JSONL via COCO AP."""
    dets_path, gt = detections_file
    gt_recs = []
    for t in range(30):
        for k in np.flatnonzero(gt["present"][t]):
            gt_recs.append(subm.TrackRecord.from_xyxy(
                "ctx0", 1000 * t, 1, f"gt{k}",
                subm.CLASS_TO_WAYMO_TYPE[int(gt["classes"][k])],
                gt["boxes"][t, k], 1.0))
    gt_path = str(tmp_path / "gt.jsonl")
    subm.write_jsonl(gt_path, gt_recs)

    cli.main(["eval-det", "--pred", dets_path, "--gt", gt_path])
    out = json.loads(capsys.readouterr().out)
    # synthetic detections are GT + small noise + 5% misses, so AP50 is high
    assert out["AP50"] > 0.8, out
    assert 0.0 < out["mAP"] <= 1.0, out


def test_track_online_cli(tmp_path, capsys):
    """--online: streaming serving path writes the same per-segment files
    and reports PER-SEGMENT latency percentiles in the stats line (the
    window resets between segments; a cumulative count was review finding
    r3-serve #5)."""
    from waymo_2d_tracking_tpu.data import waymo

    rng = np.random.default_rng(0)
    for name in ("segO1", "segO2"):
        frames = rng.integers(0, 255, (4, 64, 96, 3), dtype=np.uint8)
        waymo.materialize_directory_segment(
            str(tmp_path / "segs"), name, frames, [100 * t for t in range(4)]
        )
    out_dir = str(tmp_path / "out")
    cli.main([
        "track", "--online", "--segments-dir", str(tmp_path / "segs"),
        "--out-dir", out_dir,
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_tracks=16", "tracker.max_detections=8",
        "tracker.embed_dim=0", "tracker.score_threshold=0.0",
        "tracker.birth_score_threshold=0.0", "tracker.n_init=1",
    ])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        stats = json.loads(line)
        assert stats["frames"] == 4
        assert stats["latency"]["count"] == 4  # per-segment, not cumulative
        assert stats["latency"]["p50_ms"] > 0
    for name in ("segO1", "segO2"):
        assert os.path.exists(os.path.join(out_dir, f"{name}_1.jsonl"))


def test_track_video_cli(tmp_path, capsys):
    """--video streams a plain video file through the online path."""
    import cv2

    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (96, 64))
    assert w.isOpened(), "cv2 VideoWriter unavailable (MJPG/avi)"
    rng = np.random.default_rng(0)
    for _ in range(5):
        w.write(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    w.release()

    out_dir = str(tmp_path / "out")
    cli.main([
        "track", "--video", video, "--out-dir", out_dir,
        "--set", "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_tracks=16", "tracker.max_detections=8",
        "tracker.embed_dim=0", "tracker.score_threshold=0.0",
        "tracker.birth_score_threshold=0.0", "tracker.n_init=1",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 5
    assert stats["context"] == "clip"
    # timestamps synthesized at 10 fps -> 100ms spacing
    recs = subm.read_jsonl(os.path.join(out_dir, "clip_1.jsonl"))
    assert all(r.timestamp_micros % 100000 == 0 for r in recs)


def test_track_online_multicam_cli(tmp_path, capsys):
    """--online --multicam: one rig tick per timestamp through a shared
    detector batch; per-(context, camera) output files like the chunked
    multicam driver."""
    from waymo_2d_tracking_tpu.data import waymo

    rng = np.random.default_rng(0)
    for cam_id in (1, 2):
        frames = rng.integers(0, 255, (3, 64, 96, 3), dtype=np.uint8)
        waymo.materialize_directory_segment(
            str(tmp_path / "segs"), "segM", frames,
            [100 * t for t in range(3)], camera_id=cam_id,
        )
    out_dir = str(tmp_path / "out")
    cli.main([
        "track", "--online", "--multicam",
        "--segments-dir", str(tmp_path / "segs"), "--out-dir", out_dir,
        "--set", 'pipeline.cameras=["FRONT","FRONT_LEFT"]',
        "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=32", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_tracks=16", "tracker.max_detections=8",
        "tracker.embed_dim=0", "tracker.score_threshold=0.0",
        "tracker.birth_score_threshold=0.0", "tracker.n_init=1",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 3
    assert stats["cameras"] == [1, 2]
    assert stats["latency"]["count"] == 3
    for cam in (1, 2):
        f = os.path.join(out_dir, f"segM_{cam}.jsonl")
        assert os.path.exists(f), f
        for line in open(f):
            assert json.loads(line)["camera_name"] == cam


def test_doctor_reports_healthy_env(capsys):
    from waymo_2d_tracking_tpu import cli

    rc = cli.main(["doctor"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0 and report["status"] == "ok"
    assert report["jax"]["device_count"] == 8  # virtual CPU mesh
    assert set(report["native"]) == {"jpeg_decoder", "tfrecord_scanner"}
    assert "headline" in report["presets"]
    assert report["optional_deps"]["flax"] is not None


def test_eval_workers_matches_serial(tmp_path, capsys):
    """--workers N (process pool per key) must produce the identical
    report to the serial path."""
    rng = np.random.default_rng(9)
    pred, gt = [], []
    for ctx in ("c0", "c1", "c2"):
        for t in range(12):
            for j in range(4):
                box = rng.uniform(0, 100, 2)
                box = [*box, box[0] + 20, box[1] + 25]
                gt.append(subm.TrackRecord.from_xyxy(ctx, t, 1, f"g{j}", 1,
                                                     box, 1.0))
                if rng.uniform() > 0.2:
                    jbox = list(np.asarray(box) + rng.uniform(-3, 3, 4))
                    pred.append(subm.TrackRecord.from_xyxy(
                        ctx, t, 1, f"p{j}", 1, jbox, 0.9))
    p, g = str(tmp_path / "p.jsonl"), str(tmp_path / "g.jsonl")
    subm.write_jsonl(p, pred)
    subm.write_jsonl(g, gt)

    cli.main(["eval", "--pred", p, "--gt", g, "--hota"])
    serial = capsys.readouterr().out
    cli.main(["eval", "--pred", p, "--gt", g, "--hota", "--workers", "2"])
    parallel = capsys.readouterr().out
    assert json.loads(serial) == json.loads(parallel)
    assert "OVERALL" in json.loads(serial)
