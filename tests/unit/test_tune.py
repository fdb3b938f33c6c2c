"""Tracker hyperparameter search (pipeline/tune.py, `w2t tune`).

Synthetic scene with a known good knob setting: clean detections carry
score 0.9, clutter carries 0.45, so trials whose score_threshold filters
the clutter dominate MOTA — the search must find and rank them first.
"""
import json

import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import load_config
from waymo_2d_tracking_tpu.io_out.submission import TrackRecord
from waymo_2d_tracking_tpu.pipeline import tune as tu

CTX = "ctx0"
CAM = 1
DT = 100_000  # 10 Hz frame grid


def _cfg():
    # birth gate below the clutter score so score_threshold is the knob
    # under test; n_init 1 lets persistent clutter confirm immediately
    return load_config(None, {
        "tracker": {"max_tracks": 16, "max_detections": 16, "embed_dim": 0,
                    "appearance_weight": 0.0, "reid_recovery": False,
                    "birth_score_threshold": 0.3, "n_init": 1},
    })


def _scene(num_frames=30, clutter_per_frame=2, seed=0):
    """GT: two constant-velocity objects. Detections: GT + PERSISTENT
    clutter at score 0.45 (static false objects present in every frame —
    they confirm into false tracks unless score_threshold filters them)."""
    rng = np.random.default_rng(seed)
    clutter = [(float(rng.uniform(600, 900)), float(rng.uniform(100, 500)))
               for _ in range(clutter_per_frame)]
    gt, det = [], []
    for t in range(num_frames):
        ts = 1_000_000 + t * DT
        for oid, (x0, y0, vx, vy) in enumerate(
                [(50.0, 60.0, 4.0, 1.0), (400.0, 300.0, -3.0, 2.0)]):
            x, y = x0 + vx * t, y0 + vy * t
            box = (x, y, x + 60.0, y + 40.0)
            gt.append(TrackRecord.from_xyxy(CTX, ts, CAM, f"obj{oid}", 1,
                                            box, 1.0))
            det.append(TrackRecord.from_xyxy(CTX, ts, CAM, "", 1, box, 0.9))
        for (x, y) in clutter:
            det.append(TrackRecord.from_xyxy(CTX, ts, CAM, "", 1,
                                             (x, y, x + 50, y + 35), 0.45))
    return det, gt


def test_apply_knobs_paths_and_errors():
    cfg = _cfg()
    out = tu.apply_knobs(cfg, {"tracker.max_age": 7,
                               "pipeline.interp_max_gap": 3})
    assert out.tracker.max_age == 7
    assert out.pipeline.interp_max_gap == 3
    assert cfg.tracker.max_age != 7 or cfg.tracker.max_age == 7  # frozen copy
    assert out is not cfg
    with pytest.raises(ValueError):
        tu.apply_knobs(cfg, {"tracker.not_a_knob": 1})
    with pytest.raises(ValueError):
        tu.apply_knobs(cfg, {"nosection.max_age": 1})


def test_sample_knobs_deterministic_and_consistent():
    a = tu.sample_knobs(np.random.default_rng(7), tu.DEFAULT_SPACE)
    b = tu.sample_knobs(np.random.default_rng(7), tu.DEFAULT_SPACE)
    assert a == b
    for seed in range(20):
        k = tu.sample_knobs(np.random.default_rng(seed), tu.DEFAULT_SPACE)
        assert (k["tracker.birth_score_threshold"]
                >= k["tracker.score_threshold"])


def test_evaluate_records_perfect_prediction():
    _, gt = _scene(num_frames=10, clutter_per_frame=0)
    pred = [TrackRecord.from_xyxy(r.context_name, r.timestamp_micros,
                                  r.camera_name, f"hyp-{r.object_id}", 1,
                                  r.to_xyxy(), 1.0) for r in gt]
    m = tu.evaluate_records(pred, gt)
    assert m["mota"] == pytest.approx(1.0)
    assert m["idf1"] == pytest.approx(1.0)
    assert m["num_idsw"] == 0


def test_tune_finds_clutter_filtering_threshold():
    det, gt = _scene()
    cfg = _cfg()
    # two-knob space keeps the test fast (each trial = a tracker compile);
    # the high-threshold half of the space is strictly better
    space = {
        "tracker.score_threshold":
            lambda rng: float(rng.choice([0.3, 0.6])),
        "tracker.max_age": lambda rng: int(rng.integers(1, 5)),
    }
    report = tu.tune_tracker(det, gt, cfg, trials=4, seed=0, space=space)
    results = report["results"]
    assert len(results) == 5  # 4 trials + baseline (-1)
    assert {r["trial"] for r in results} == {-1, 0, 1, 2, 3}
    # ranked by objective, best first
    motas = [r["mota"] for r in results]
    assert motas == sorted(motas, reverse=True)
    assert report["best"]["mota"] == motas[0]
    # the winner filtered the clutter and tracked both objects cleanly
    assert report["best"]["knobs"].get("tracker.score_threshold", 0.5) >= 0.5
    assert report["best"]["mota"] > 0.95
    # low-threshold trials drown in false positives
    low = [r for r in results if
           r["knobs"].get("tracker.score_threshold") == 0.3]
    assert low and all(r["mota"] < 0.5 for r in low)
    # reproducible: same seed, same ranking and numbers
    again = tu.tune_tracker(det, gt, cfg, trials=4, seed=0, space=space)
    assert again["results"] == results


def test_tune_rejects_appearance_config_and_bad_objective():
    det, gt = _scene(num_frames=4, clutter_per_frame=0)
    cfg = load_config(None, {
        "tracker": {"embed_dim": 64, "appearance_weight": 0.5}})
    with pytest.raises(ValueError):
        tu.tune_tracker(det, gt, cfg, trials=1)
    with pytest.raises(ValueError):
        tu.tune_tracker(det, gt, _cfg(), trials=1, objective="accuracy")


def test_cli_tune_end_to_end(tmp_path, capsys):
    from waymo_2d_tracking_tpu import cli
    from waymo_2d_tracking_tpu.io_out.submission import write_jsonl

    det, gt = _scene(num_frames=12, clutter_per_frame=1)
    det_f, gt_f = tmp_path / "det.jsonl", tmp_path / "gt.jsonl"
    write_jsonl(str(det_f), det)
    write_jsonl(str(gt_f), gt)
    out = tmp_path / "report.json"
    cli.main(["tune", "--from-detections", str(det_f), "--gt", str(gt_f),
              "--trials", "2", "--out", str(out),
              "--set", "tracker.max_tracks=16", "tracker.max_detections=16",
              "tracker.embed_dim=0"])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["objective"] == "mota"
    assert "set_flags" in line and line["baseline"] is not None
    report = json.loads(out.read_text())
    assert len(report["results"]) == 3
