"""Round-3 fixes (VERDICT r2 weak #4/#6, missing #5):

- `w2t detect` and `w2t track` must use the SAME detection path under a TTA
  preset (detect used to silently skip TTA);
- `w2t eval` must intern object ids (no salted-hash collisions) and emit a
  pooled OVERALL CLEAR-MOT row across all segments.
"""
import json

import numpy as np
import jax
import pytest

from waymo_2d_tracking_tpu.config import (
    Config,
    DetectorConfig,
    PipelineConfig,
    TrackerConfig,
)
from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.pipeline.run import SegmentPipeline

TTA_CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
        dtype="float32", score_threshold=0.01,
    ),
    tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=0,
                          score_threshold=0.0, birth_score_threshold=0.0,
                          n_init=1),
    pipeline=PipelineConfig(chunk_frames=2, tta_flip=True),
)


def test_detect_chunk_honors_tta():
    """The detection-only chunk must produce the TTA candidate union, not
    the plain forward, when the preset enables TTA (config-5 detect/track
    self-consistency)."""
    from waymo_2d_tracking_tpu.data.preprocess import letterbox_batch
    from waymo_2d_tracking_tpu.pipeline.tta import detect_tta_batch

    pipe = SegmentPipeline(TTA_CFG, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8)
    dets, _scale = pipe._detect_chunk(pipe.params, frames, (64, 96))

    images, _ = letterbox_batch(frames, (64, 96), (64, 96))
    expected = detect_tta_batch(
        pipe.detector.module, pipe.params, images, TTA_CFG.detector,
        scales=(1.0,), flip=True,
    )
    np.testing.assert_allclose(
        np.asarray(dets.boxes), np.asarray(expected.boxes), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(dets.valid), np.asarray(expected.valid)
    )


def _write_records(path, specs):
    """specs: list of (ctx, cam, ts, object_id, xyxy)."""
    records = [
        subm.TrackRecord.from_xyxy(ctx, ts, cam, oid, 1, box, 0.9)
        for ctx, cam, ts, oid, box in specs
    ]
    subm.write_jsonl(str(path), records)


def test_eval_pooled_overall_row(tmp_path, capsys):
    from waymo_2d_tracking_tpu import cli

    # two segments; ids deliberately REUSED across segments ("t0") — the
    # interner must namespace them per (context, camera)
    box = (10.0, 10.0, 30.0, 30.0)
    box2 = (50.0, 50.0, 80.0, 90.0)
    gt = []
    pred = []
    for ctx in ("segA", "segB"):
        for ts in (0, 1000):
            gt.append((ctx, 1, ts, "t0", box))
            gt.append((ctx, 1, ts, "t1", box2))
            pred.append((ctx, 1, ts, "t0", box))
            pred.append((ctx, 1, ts, "t1", box2))
    _write_records(tmp_path / "gt.jsonl", gt)
    _write_records(tmp_path / "pred.jsonl", pred)
    cli.main(["eval", "--pred", str(tmp_path / "pred.jsonl"),
              "--gt", str(tmp_path / "gt.jsonl")])
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"segA/1", "segB/1", "OVERALL"}
    ov = out["OVERALL"]
    assert ov["num_frames"] == 4
    assert ov["num_gt"] == 8
    assert ov["mota"] == 1.0 and ov["num_idsw"] == 0
    # pooled row is the exact sum of the per-segment accumulators
    assert ov["num_matches"] == sum(
        out[k]["num_matches"] for k in ("segA/1", "segB/1")
    )


def test_eval_single_segment_no_overall(tmp_path, capsys):
    from waymo_2d_tracking_tpu import cli

    box = (10.0, 10.0, 30.0, 30.0)
    _write_records(tmp_path / "gt.jsonl", [("seg", 1, 0, "a", box)])
    _write_records(tmp_path / "pred.jsonl", [("seg", 1, 0, "x", box)])
    cli.main(["eval", "--pred", str(tmp_path / "pred.jsonl"),
              "--gt", str(tmp_path / "gt.jsonl")])
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"seg/1"}
    assert out["seg/1"]["mota"] == 1.0
