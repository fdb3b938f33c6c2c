"""MOTChallenge interop (io_out/motchallenge.py + import-mot/export-mot CLI)."""
import json
import os

import numpy as np
import pytest

from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.io_out.motchallenge import (
    FRAME_PERIOD_US,
    MotImportStats,
    read_mot,
    read_mot_tree,
    write_mot,
)
from waymo_2d_tracking_tpu.io_out.submission import (
    TYPE_CYCLIST,
    TYPE_PEDESTRIAN,
    TYPE_VEHICLE,
    TrackRecord,
)


def _rec(ctx, frame, oid, box, score=0.9, otype=TYPE_PEDESTRIAN, cam=1):
    return TrackRecord.from_xyxy(
        context_name=ctx, timestamp_micros=frame * FRAME_PERIOD_US,
        camera_name=cam, object_id=oid, object_type=otype,
        box_xyxy=box, score=score)


def test_round_trip_preserves_boxes_frames_identity(tmp_path):
    recs = [
        _rec("seqA", 1, "a", (10.0, 20.0, 50.0, 80.0)),
        _rec("seqA", 1, "b", (100.0, 40.0, 160.0, 90.0), otype=TYPE_VEHICLE),
        _rec("seqA", 2, "a", (12.0, 22.0, 52.0, 82.0)),
        _rec("seqA", 3, "c", (0.0, 0.0, 8.0, 8.0), otype=TYPE_CYCLIST),
    ]
    written = write_mot(recs, str(tmp_path))
    assert written == {"seqA.txt": 4}
    back, stats = read_mot(str(tmp_path / "seqA.txt"))
    assert stats.kept == 4
    # same frames, same boxes (to the 0.01 px the format carries)
    for orig, rt in zip(sorted(recs, key=lambda r: (r.timestamp_micros,
                                                    r.object_id)), back):
        assert rt.context_name == "seqA"
        assert rt.timestamp_micros == orig.timestamp_micros
        np.testing.assert_allclose(rt.to_xyxy(), orig.to_xyxy(), atol=0.01)
    # identity structure survives: frames 1 and 2 of original id 'a' share
    # one exported id, 'b' and 'c' each get their own
    ids = {}
    for r in back:
        ids.setdefault(r.object_id, []).append(r.timestamp_micros)
    assert sorted(len(v) for v in ids.values()) == [1, 1, 2]
    # object types survive the round trip (class column emitted + honored)
    assert ([r.object_type for r in back]
            == [TYPE_PEDESTRIAN, TYPE_VEHICLE, TYPE_PEDESTRIAN,
                TYPE_CYCLIST])


def test_export_frame_numbers_are_rank_based(tmp_path):
    """Any timestamp convention (frame indices, epoch micros with jitter)
    must export to ordered, collision-free 1-based MOT frames."""
    recs = [
        TrackRecord.from_xyxy("s", ts, 1, "a", TYPE_PEDESTRIAN,
                              (0, 0, 10, 10), 0.9)
        for ts in (0, 1, 2)          # frame-index-style timestamps
    ]
    write_mot(recs, str(tmp_path))
    lines = (tmp_path / "s.txt").read_text().splitlines()
    assert [int(l.split(",")[0]) for l in lines] == [1, 2, 3]

    back, _ = read_mot(str(tmp_path / "s.txt"))
    assert [r.timestamp_micros for r in back] == [
        FRAME_PERIOD_US, 2 * FRAME_PERIOD_US, 3 * FRAME_PERIOD_US]


def test_result_import_ignores_world_coordinate_column(tmp_path):
    # third-party det/result files carry world X/Y/Z in columns 8-10
    # (10 fields): NEVER class-bearing, even when integral. Only our own
    # 9-field export signature (…,score,class,-1) maps the class column.
    p = tmp_path / "r.txt"
    p.write_text("1,1,0,0,10,10,0.9,-1,-1,-1\n"
                 "1,2,20,0,10,10,0.9,3.7,1.2,-1\n"
                 "1,3,40,0,10,10,0.9,3,-1,-1\n"
                 "1,4,60,0,10,10,0.9,3,-1\n")
    recs, _ = read_mot(str(p))
    assert recs[0].object_type == TYPE_PEDESTRIAN   # -1 -> default
    assert recs[1].object_type == TYPE_PEDESTRIAN   # 3.7 is a coordinate
    assert recs[2].object_type == TYPE_PEDESTRIAN   # 10-field: world-X 3.0
    assert recs[3].object_type == TYPE_VEHICLE      # our 9-field signature


def test_export_keeps_frame_slots_for_empty_frames(tmp_path):
    """A frame with no emitted records must keep its frame number in the
    export (grid-inferred), or external scorers shift every later box."""
    recs = [
        _rec("s", f, "a", (0, 0, 10, 10))
        for f in (1, 2, 3, 4, 6, 7)       # frame 5: no output
    ]
    write_mot(recs, str(tmp_path))
    frames = [int(l.split(",")[0])
              for l in (tmp_path / "s.txt").read_text().splitlines()]
    assert frames == [1, 2, 3, 4, 6, 7]


def test_multi_camera_context_gets_per_camera_files(tmp_path):
    recs = [_rec("ctx", 1, "a", (0, 0, 10, 10), cam=1),
            _rec("ctx", 1, "a", (5, 5, 15, 15), cam=2)]
    written = write_mot(recs, str(tmp_path))
    assert sorted(written) == ["ctx_cam1.txt", "ctx_cam2.txt"]


def test_gt_semantics_ignore_and_class_mapping(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text(
        "1,1,10,10,20,40,1,1,1.0\n"      # pedestrian, kept
        "1,2,50,10,20,40,0,1,1.0\n"      # consider flag 0 -> ignore region
        "1,3,90,10,60,30,1,3,1.0\n"      # car -> VEHICLE
        "1,4,10,60,20,20,1,8,1.0\n"      # distractor class -> ignore region
        "2,5,10,10,20,40,1,7,0.6\n"      # static person -> ignore region
        "2,6,40,10,20,40,1,4,1.0\n"      # bicycle -> CYCLIST
        "2,7,70,10,20,40,1,9,1.0\n"      # occluder -> dropped
    )
    recs, stats = read_mot(str(p), gt=True)
    # review r4: distractor classes (2/7/8/12) and zero-marked rows are
    # ignore REGIONS (returned, fed to suppress_ignored), not silently
    # dropped GT; static person (7) is NOT pedestrian ground truth
    assert (stats.kept, stats.skipped_ignore, stats.skipped_class) == (3, 3, 1)
    assert [r.object_type for r in recs] == [
        TYPE_PEDESTRIAN, TYPE_VEHICLE, TYPE_CYCLIST]
    assert all(r.score == 1.0 for r in recs)  # gt confidence is not a score
    assert len(stats.ignore) == 3
    assert {r.timestamp_micros for r in stats.ignore} == {100_000, 200_000}
    assert all(r.object_id.startswith("ignore_") for r in stats.ignore)


def test_detection_file_unique_ids_and_conf(tmp_path):
    p = tmp_path / "det.txt"
    p.write_text("1,-1,10,10,20,40,0.7\n1,-1,50,10,20,40,0.3\n")
    recs, _ = read_mot(str(p))
    assert recs[0].object_id != recs[1].object_id
    assert recs[0].score == pytest.approx(0.7)
    assert recs[1].score == pytest.approx(0.3)


def test_read_tree_official_layout_and_flat_layout(tmp_path):
    # official: <seq>/gt/gt.txt; flat: <seq>.txt
    off = tmp_path / "MOT17-02" / "gt"
    off.mkdir(parents=True)
    (off / "gt.txt").write_text("1,1,0,0,10,10,1,1,1.0\n")
    recs, _ = read_mot_tree(str(tmp_path), gt=True)
    assert [r.context_name for r in recs] == ["MOT17-02"]

    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "seqB.txt").write_text("1,1,0,0,10,10,0.9\n")
    recs, _ = read_mot_tree(str(flat))
    assert [r.context_name for r in recs] == ["seqB"]

    with pytest.raises(FileNotFoundError):
        read_mot_tree(str(tmp_path / "flat" / "empty-missing"))


def test_cli_import_eval_export_chain(tmp_path, capsys):
    """import-mot (gt + results) -> w2t eval scores them -> export-mot."""
    from waymo_2d_tracking_tpu import cli

    gt = tmp_path / "gt.txt"
    gt.write_text(
        "1,1,10,10,20,40,1,1,1.0\n"
        "1,2,100,10,20,40,1,1,1.0\n"
        "2,1,12,10,20,40,1,1,1.0\n"
        "2,2,102,10,20,40,1,1,1.0\n"
    )
    res = tmp_path / "res.txt"
    # perfect hypothesis with different ids
    res.write_text(
        "1,7,10,10,20,40,0.9\n1,8,100,10,20,40,0.9\n"
        "2,7,12,10,20,40,0.9\n2,8,102,10,20,40,0.9\n"
    )
    gt_jsonl = str(tmp_path / "gt.jsonl")
    res_jsonl = str(tmp_path / "res.jsonl")
    cli.main(["import-mot", str(gt), "--out", gt_jsonl, "--gt",
              "--context", "MOT-seq"])
    cli.main(["import-mot", str(res), "--out", res_jsonl,
              "--context", "MOT-seq"])
    capsys.readouterr()
    cli.main(["eval", "--pred", res_jsonl, "--gt", gt_jsonl])
    row = json.loads(capsys.readouterr().out)
    key = "MOT-seq/1"
    assert row[key]["mota"] == pytest.approx(1.0)
    assert row[key]["num_idsw"] == 0
    assert row[key]["num_matches"] == 4

    out_dir = str(tmp_path / "export")
    cli.main(["export-mot", res_jsonl, "--out-dir", out_dir])
    out = json.loads(capsys.readouterr().out)
    assert out["files"] == {"MOT-seq.txt": 4}
    assert os.path.isfile(os.path.join(out_dir, "MOT-seq.txt"))


def test_import_mot_context_rejected_for_directories(tmp_path):
    import pytest as _pytest

    from waymo_2d_tracking_tpu import cli

    d = tmp_path / "seqs"
    d.mkdir()
    (d / "a.txt").write_text("1,1,0,0,10,10,0.9\n")
    with _pytest.raises(SystemExit):
        cli.main(["import-mot", str(d), "--out", str(tmp_path / "o.jsonl"),
                  "--context", "X"])


def test_malformed_line_reports_file_and_lineno(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1,1,0,0,10,10,0.9\nnot-a-mot-line\n")
    with pytest.raises(ValueError, match=r"bad\.txt:2"):
        read_mot(str(p))


def test_mot_detections_to_tracker_chain(tmp_path, capsys):
    """The SORT-paper setup end-to-end: MOT det.txt (id=-1 public
    detections) -> import-mot -> track --from-detections -> export-mot.
    Three noisy moving objects must come back as exactly three track ids."""
    rng = np.random.default_rng(0)
    lines = []
    for t in range(1, 41):
        for k in range(3):
            x = 20 + 40 * k + 2.0 * t + rng.uniform(-1, 1)
            y = 30 + 30 * k + rng.uniform(-1, 1)
            lines.append(
                f"{t},-1,{x:.1f},{y:.1f},25,35,{rng.uniform(0.7, 0.95):.2f}")
    (tmp_path / "det.txt").write_text("\n".join(lines) + "\n")

    from waymo_2d_tracking_tpu import cli

    dets = str(tmp_path / "dets.jsonl")
    tracks = str(tmp_path / "tracks.jsonl")
    cli.main(["import-mot", str(tmp_path / "det.txt"), "--out", dets,
              "--context", "MOT-X"])
    cli.main(["track", "--from-detections", dets, "--out", tracks,
              "--config", "configs/config1_tracker_cpu.yaml"])
    out_dir = str(tmp_path / "mot_out")
    cli.main(["export-mot", tracks, "--out-dir", out_dir])
    capsys.readouterr()

    res = (tmp_path / "mot_out" / "MOT-X.txt").read_text().splitlines()
    assert len(res) == 120
    assert {l.split(",")[1] for l in res} == {"1", "2", "3"}
    frames = [int(l.split(",")[0]) for l in res]
    assert min(frames) == 1 and max(frames) == 40


def test_cli_ignore_sidecar_suppresses_fps(tmp_path, capsys):
    """import-mot --gt writes the .ignore.jsonl sidecar (distractor +
    zero-marked rows); w2t eval --ignore removes predictions on those
    regions from the FP penalty set (review r4 protocol fidelity)."""
    from waymo_2d_tracking_tpu import cli

    gt = tmp_path / "gt.txt"
    gt.write_text(
        "1,1,10,10,20,40,1,1,1.0\n"      # real pedestrian
        "1,2,200,10,20,40,1,7,1.0\n"     # static person -> ignore region
        "2,1,12,10,20,40,1,1,1.0\n"
        "2,2,200,10,20,40,0,1,1.0\n"     # zero-marked -> ignore region
    )
    res = tmp_path / "res.txt"
    # tracks the pedestrian AND the static person (a correct detection
    # the protocol must not penalize), plus one genuine FP
    res.write_text(
        "1,7,10,10,20,40,0.9\n1,8,200,10,20,40,0.9\n"
        "1,9,400,10,20,40,0.9\n"
        "2,7,12,10,20,40,0.9\n2,8,200,10,20,40,0.9\n"
        "2,9,400,10,20,40,0.9\n"
    )
    gt_jsonl = str(tmp_path / "gt.jsonl")
    res_jsonl = str(tmp_path / "res.jsonl")
    cli.main(["import-mot", str(gt), "--out", gt_jsonl, "--gt",
              "--context", "S"])
    info = json.loads(capsys.readouterr().out)
    assert info["ignore_records"] == 2
    assert os.path.isfile(info["ignore_out"])
    cli.main(["import-mot", str(res), "--out", res_jsonl, "--context", "S"])
    capsys.readouterr()

    # without --ignore: static-person + zero-marked dets count as FPs
    cli.main(["eval", "--pred", res_jsonl, "--gt", gt_jsonl])
    base = json.loads(capsys.readouterr().out)["S/1"]
    assert base["num_fp"] == 4

    cli.main(["eval", "--pred", res_jsonl, "--gt", gt_jsonl,
              "--ignore", info["ignore_out"]])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[0]) == {"suppressed_on_ignore_regions": 2}
    row = json.loads("\n".join(out[1:]))["S/1"]
    assert row["num_fp"] == 2            # only the genuine FPs remain
    assert row["num_matches"] == 2 and row["num_fn"] == 0
    assert row["mota"] == pytest.approx(0.0)  # 2 GT, 2 FP
