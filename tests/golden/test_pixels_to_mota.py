"""Pixels-to-MOTA golden: the FULL product path with TRAINED weights.

Every other golden drives the tracker with scripted detection streams; this
one runs raw rendered pixels through the real serving stack — SegmentPipeline
(device letterbox -> trained r18slim detector -> top-k/NMS -> tracker scan ->
submission records in source pixels) — and holds a CLEAR-MOT floor against
the rendered ground truth. Catches whole-path regressions nothing else can:
letterbox scale composition, box decode geometry, NMS/threshold interactions
with the tracker's score gates, record emission.

Fixture: tests/fixtures/pixels_detector.msgpack — trained (not overfit) by
tools/train_pixels_fixture.py on random layouts drawn by the SAME
draw_rect_objects code that renders the clip; held-out recall recorded in
pixels_detector.json. Regenerate with that tool if the detector architecture
changes.

Measured at fixture-commit time (CPU, deterministic): see the floors below.
"""
import json
import os

import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import (
    Config,
    DetectorConfig,
    PipelineConfig,
    TrackerConfig,
)
from waymo_2d_tracking_tpu.data.synthetic import (
    SyntheticClipConfig,
    render_video_clip,
)
from waymo_2d_tracking_tpu.eval.mot import evaluate_mot, gt_to_frames

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")

# Must match tools/train_pixels_fixture.py PIXELS_DET.
PIXELS_DET = DetectorConfig(
    backbone="resnet18slim", image_size=(256, 384), fpn_channels=32,
    fpn_levels=(3, 4, 5), head_depth=2, head_channels=32,
    pre_nms_topk=128, nms_topk=256, max_detections=32, embed_dim=0,
    dtype="float32", score_threshold=0.3,
)

CLIP = SyntheticClipConfig(
    num_frames=80, num_objects=8, image_size=(1024, 1536), seed=5,
)


def _load_fixture():
    from flax import serialization

    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    path = os.path.join(FIXTURES, "pixels_detector.msgpack")
    if not os.path.exists(path):
        pytest.skip("pixels fixture not built (tools/train_pixels_fixture.py)")
    runner = DetectorRunner(PIXELS_DET)
    import jax

    template = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _records_to_frames(records, num_frames):
    """TrackRecords -> per-frame (ids, boxes xyxy); object_id interned."""
    ids = {}
    frames = [([], []) for _ in range(num_frames)]
    for r in records:
        ids.setdefault(r.object_id, len(ids))
        t = r.timestamp_micros
        x1 = r.center_x - r.length / 2
        y1 = r.center_y - r.width / 2
        frames[t][0].append(ids[r.object_id])
        frames[t][1].append([x1, y1, x1 + r.length, y1 + r.width])
    return [
        (np.asarray(i, np.int64), np.asarray(b, float).reshape(len(i), 4))
        for i, b in frames
    ]


def test_pixels_to_mota_floor():
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

    variables = _load_fixture()
    frames, gt = render_video_clip(CLIP)

    cfg = Config(
        detector=PIXELS_DET,
        tracker=TrackerConfig(
            max_tracks=32, max_detections=32, embed_dim=0,
            n_init=2, max_age=5, iou_threshold=0.3,
            # the trained fixture separates cleanly: real objects score
            # >=0.63, duplicate/junk candidates <=0.55 (measured at
            # fixture-commit time) — gate between the two bands
            score_threshold=0.55, birth_score_threshold=0.65,
            # duplicate detections the NMS kept (pair IoU < 0.6) otherwise
            # birth twin tracks: measured 19 idsw / 169 fp without this,
            # 0 idsw / 27 fp with it (MOTA 0.614 -> 0.882)
            birth_iou_threshold=0.3,
        ),
        pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
    )
    pipeline = SegmentPipeline(cfg, params=variables)
    segment = SegmentFrames(
        context_name="pixels", camera_name=1,
        timestamps=list(range(CLIP.num_frames)), frames=frames,
    )
    records, stats = pipeline.run_segment(segment)
    assert stats["frames"] == CLIP.num_frames

    m = evaluate_mot(
        gt_to_frames(gt), _records_to_frames(records, CLIP.num_frames)
    )
    # Floors just under the values measured at fixture-commit time. Round 5
    # diagnosed and removed the CPU<->TPU spread (tools/diag_backend_drift.py;
    # BASELINE.md "backend drift"): XLA:TPU's DEFAULT precision ran the f32
    # convs as single bf16 MXU passes, and the ~2^-8 stem error amplified
    # into score deltas up to 0.48 across the 0.55/0.65 gates. With
    # dtype='float32' now pinned to HIGHEST precision (models/detector.py
    # _precision_ctx) both backends measure mota 0.7971 / idf1 0.8853 /
    # idsw 5 / mt 8 — floors tightened to a few points under that.
    d = m.as_dict()
    assert m.mota >= 0.78, d
    assert m.idf1 >= 0.87, d
    assert m.num_idsw <= 6, d
    assert m.mostly_tracked >= 7, d


def test_multicam_pixels_to_mota_floor(tmp_path):
    """Config-4 composition of the pixels golden: TWO rendered cameras
    (the seed-5 clip and the seed-11 dense-occlusion clip) through the
    FULL multicam product path — shared-backbone detector batch,
    per-camera vmapped trackers, submission JSONL write + read-back —
    holding each camera to the SAME floors its single-camera golden
    holds. Catches config-4-only regressions: camera-axis mixups in the
    chunk reshape, per-camera record demux, scale composition through
    run_segments_group."""
    from waymo_2d_tracking_tpu.io_out.submission import read_jsonl
    from waymo_2d_tracking_tpu.pipeline.multicam import MultiCamPipeline
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames

    variables = _load_fixture()
    frames_a, gt_a = render_video_clip(CLIP)
    clip_b = SyntheticClipConfig(
        num_frames=80, num_objects=14, image_size=(1024, 1536), seed=11
    )
    frames_b, gt_b = render_video_clip(clip_b)

    cfg = Config(
        detector=PIXELS_DET,
        tracker=TrackerConfig(
            max_tracks=32, max_detections=32, embed_dim=0,
            n_init=2, max_age=5, iou_threshold=0.3,
            score_threshold=0.55, birth_score_threshold=0.65,
            birth_iou_threshold=0.3,
        ),
        pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
    )
    ts = list(range(CLIP.num_frames))
    segs = [
        SegmentFrames(context_name="mc", camera_name=1,
                      timestamps=ts, frames=frames_a),
        SegmentFrames(context_name="mc", camera_name=2,
                      timestamps=ts, frames=frames_b),
    ]
    pipeline = MultiCamPipeline(cfg, num_cams=2, params=variables)
    stats = pipeline.run_segments_group(segs, str(tmp_path))
    assert [s["camera"] for s in stats] == [1, 2]

    def mota_for(cam, gt):
        records = read_jsonl(str(tmp_path / f"mc_{cam}.jsonl"))
        return evaluate_mot(
            gt_to_frames(gt), _records_to_frames(records, CLIP.num_frames)
        )

    m1 = mota_for(1, gt_a)
    m2 = mota_for(2, gt_b)
    # same floors as the single-camera goldens above: the shared-backbone
    # batch must not change per-camera quality
    assert m1.mota >= 0.78 and m1.idf1 >= 0.87, m1.as_dict()
    assert m1.num_idsw <= 6 and m1.mostly_tracked >= 7, m1.as_dict()
    assert m2.mota >= 0.42 and m2.idf1 >= 0.66, m2.as_dict()
    assert m2.num_idsw <= 7, m2.as_dict()


@pytest.mark.parametrize("clip_name", ["seed5", "dense"])
def test_int8_quality_through_trained_fixture(clip_name):
    """Int8 PTQ quality through TRAINED weights (round 5, VERDICT r4
    Missing #2): both rendered clips through the FULL product path with
    detector.quant='int8' (auto-calibration on the first chunk — the
    serving path) at the committed quant_scope='trunk'.

    The measurement that set the scope default
    (tools/measure_pixels_quality.py, CPU==TPU within noise for f32
    HIGHEST): on seed-5, scope 'all' collapses MOTA 0.797 -> 0.634/0.641
    (tower quant noise lands directly on the sigmoid/exp score decode and
    flips the 0.55/0.65 gates: FP 81 -> ~146, IDSW 5 -> 14), while 'trunk'
    holds 0.691/0.850 — still a real, honest cost (~0.11 MOTA on a clip
    whose scores sit AT the gates; the dense clip, whose scores sit far
    from the gates, is quant-insensitive: 0.425-0.446 across all scopes vs
    0.435 float). Floors are set under the trunk measurement on both
    backends."""
    import dataclasses

    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

    variables = _load_fixture()
    clip_cfg = CLIP if clip_name == "seed5" else SyntheticClipConfig(
        num_frames=80, num_objects=14, image_size=(1024, 1536), seed=11)
    frames, gt = render_video_clip(clip_cfg)

    cfg = Config(
        detector=dataclasses.replace(PIXELS_DET, quant="int8",
                                     quant_scope="trunk"),
        tracker=TrackerConfig(
            max_tracks=32, max_detections=32, embed_dim=0,
            n_init=2, max_age=5, iou_threshold=0.3,
            score_threshold=0.55, birth_score_threshold=0.65,
            birth_iou_threshold=0.3,
        ),
        pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
    )
    pipeline = SegmentPipeline(cfg, params=variables)
    records, _ = pipeline.run_segment(SegmentFrames(
        context_name=clip_name, camera_name=1,
        timestamps=list(range(clip_cfg.num_frames)), frames=frames,
    ))
    m = evaluate_mot(
        gt_to_frames(gt), _records_to_frames(records, clip_cfg.num_frames)
    )
    d = m.as_dict()
    if clip_name == "seed5":
        # measured: CPU 0.6912 / 0.8504 / 8 idsw (trunk scope)
        assert m.mota >= 0.66, d
        assert m.idf1 >= 0.82, d
        assert m.num_idsw <= 10, d
    else:
        # measured: CPU 0.4246 / 0.6746 / 6 idsw (trunk scope)
        assert m.mota >= 0.40, d
        assert m.idf1 >= 0.65, d
        assert m.num_idsw <= 8, d


def test_dense_occlusion_birth_suppression_regime():
    """The regime lock for tracker.birth_iou_threshold THROUGH the real
    detector (no scripted scores): a dense 14-object clip where solid
    rectangles genuinely occlude each other. The trained detector emits
    near-duplicate boxes NMS keeps; without birth suppression they spawn
    twin tracks (measured base: MOTA 0.208, 63 IDSW, 481 FP — identical
    CPU and TPU). With birth_iou_threshold=0.3: MOTA 0.435, 5 IDSW.
    BYTE measurably HURTS on this clip (MOTA 0.083: the low-score band is
    detector junk, not occluded objects) — recorded in BASELINE.md; the
    ordering floor here pins the knob's regime, not a tuned best."""
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

    variables = _load_fixture()
    clip = SyntheticClipConfig(
        num_frames=80, num_objects=14, image_size=(1024, 1536), seed=11
    )
    frames, gt = render_video_clip(clip)
    gf = gt_to_frames(gt)

    def run(**tracker_kw):
        cfg = Config(
            detector=PIXELS_DET,
            tracker=TrackerConfig(
                max_tracks=32, max_detections=32, embed_dim=0,
                n_init=2, max_age=5, iou_threshold=0.3,
                score_threshold=0.55, birth_score_threshold=0.65,
                **tracker_kw,
            ),
            pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
        )
        pipeline = SegmentPipeline(cfg, params=variables)
        records, _ = pipeline.run_segment(SegmentFrames(
            context_name="dense", camera_name=1,
            timestamps=list(range(clip.num_frames)), frames=frames,
        ))
        return evaluate_mot(gf, _records_to_frames(records, clip.num_frames))

    base = run()
    sup = run(birth_iou_threshold=0.3)
    # ordering floors (the regime claim), with margin under the measured
    # gap: +0.225 MOTA, IDSW 63 -> 5, FP 481 -> 260
    assert sup.mota >= base.mota + 0.15, (base.as_dict(), sup.as_dict())
    assert sup.num_idsw * 3 <= base.num_idsw, (base.num_idsw, sup.num_idsw)
    assert sup.num_fp < base.num_fp, (base.num_fp, sup.num_fp)
    # absolute floors just under measurement (0.4352 / 0.677 / 5, identical
    # CPU and TPU once float32 runs HIGHEST precision — see BASELINE.md
    # "backend drift", round 5)
    assert sup.mota >= 0.42, sup.as_dict()
    assert sup.idf1 >= 0.66, sup.as_dict()
    assert sup.num_idsw <= 7, sup.as_dict()
