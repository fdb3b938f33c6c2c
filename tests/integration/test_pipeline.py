"""Integration tests (SURVEY.md §4): run_segment end-to-end on a tiny
synthetic segment with the slim detector — asserts the plumbing (prefetch,
chunked jit, submission serialization, manifest resume), not detection
quality (random weights).
"""
import json
import os

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
from waymo_2d_tracking_tpu.pipeline.run import (
    SegmentFrames,
    SegmentPipeline,
    run_segments,
)

CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=64,
        head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
        dtype="float32", score_threshold=0.01,
    ),
    tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=0,
                          score_threshold=0.0, birth_score_threshold=0.0,
                          n_init=1),
    pipeline=PipelineConfig(chunk_frames=4),
)


@pytest.fixture(scope="module")
def pipeline():
    return SegmentPipeline(CFG, rng=jax.random.PRNGKey(0))


def make_segment(name="seg0", t=10, h=96, w=128, cam=1, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)
    return SegmentFrames(
        context_name=name, camera_name=cam,
        timestamps=[1000 * i for i in range(t)], frames=frames,
    )


def test_run_segment_end_to_end(pipeline, tmp_path):
    records, stats = pipeline.run_segment(make_segment(t=10))
    assert stats["frames"] == 10
    # submission file round-trips
    path = str(tmp_path / "seg.jsonl")
    subm.write_jsonl(path, records)
    back = subm.read_jsonl(path)
    assert back == records
    # ids temporally consistent: same object_id never appears twice per frame
    per_frame = {}
    for r in records:
        key = (r.timestamp_micros, r.object_id)
        assert key not in per_frame, "duplicate id in one frame"
        per_frame[key] = r


def test_chunk_padding_no_phantom_frames(pipeline):
    # 10 frames with chunk 4 -> padded to 12; no records past last timestamp
    records, _ = pipeline.run_segment(make_segment(t=10))
    assert all(r.timestamp_micros <= 9000 for r in records)


def test_manifest_resume_and_fault_injection(pipeline, tmp_path):
    out = str(tmp_path / "out")
    segs = [make_segment(f"seg{i}", t=6, seed=i) for i in range(3)]

    with pytest.raises(RuntimeError, match="fault injection"):
        run_segments(pipeline, segs, out, fail_after=2)
    manifest = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert len(manifest) == 2

    # resume: only the remaining segment runs
    stats = run_segments(pipeline, segs, out)
    assert len(stats) == 1
    manifest = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert {m["key"] for m in manifest} == {f"seg{i}/1" for i in range(3)}
    # idempotent rerun: nothing to do
    assert run_segments(pipeline, segs, out) == []


@pytest.mark.slow
def test_run_segment_with_tta(tmp_path):
    """Config-5 shape: pipeline TTA settings actually drive the detection
    path (multi-scale + flip candidate union) end-to-end."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        detector=dataclasses.replace(CFG.detector, embed_dim=16),
        tracker=dataclasses.replace(CFG.tracker, embed_dim=16,
                                    appearance_weight=0.2,
                                    reid_recovery=True),
        pipeline=dataclasses.replace(CFG.pipeline, tta_flip=True,
                                     tta_scales=(0.5, 1.0)),
    )
    pipe = SegmentPipeline(cfg, rng=jax.random.PRNGKey(0))
    assert pipe._tta_active
    records, stats = pipe.run_segment(make_segment(t=6))
    assert stats["frames"] == 6


def test_pad_tail_does_not_kill_final_track_table():
    """Regression (round-2 review): the last chunk's padding frames used to
    be ZEROS; a tail longer than tracker.max_age aged every live track out
    of the carried table, so pipeline.last_state — the source of the
    .gallery.npz sidecars that `w2t link` consumes — was always empty.
    Padding now repeats the final real frame, which keeps the table alive.
    """
    import dataclasses

    # 9 frames, chunk 8 -> 7 pad frames >> max_age=2
    cfg = dataclasses.replace(
        CFG,
        tracker=dataclasses.replace(CFG.tracker, max_age=2),
        pipeline=dataclasses.replace(CFG.pipeline, chunk_frames=8),
    )
    p = SegmentPipeline(cfg, rng=jax.random.PRNGKey(0))
    records, _stats = p.run_segment(make_segment(t=9))
    if not records:
        pytest.skip("random-weight detector produced no detections at all")
    from waymo_2d_tracking_tpu.types import SLOT_EMPTY

    state = p.last_state
    live = (np.asarray(state.status) != SLOT_EMPTY) & (
        np.asarray(state.track_id) >= 0
    )
    assert live.any(), "pad tail wiped the final track table"


def test_decode_scale_denom_outputs_in_original_pixels(tmp_path):
    """pipeline.decode_scale_denom=2: half-res decode feeds the detector,
    but track outputs map back to ORIGINAL source pixels (letterbox scale
    composed with the decode scale)."""
    import dataclasses

    from waymo_2d_tracking_tpu.data.waymo import (
        iter_segments, materialize_directory_segment,
    )

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (6, 96, 128, 3), np.uint8)
    materialize_directory_segment(
        str(tmp_path), "ctxs", frames, [1000 * t for t in range(6)])

    cfg = dataclasses.replace(
        CFG, pipeline=dataclasses.replace(
            CFG.pipeline, chunk_frames=4, decode_scale_denom=2),
    )
    p = SegmentPipeline(cfg, rng=jax.random.PRNGKey(0))
    (seg,) = list(iter_segments(str(tmp_path)))
    records, stats = p.run_segment(seg)
    assert stats["frames"] == 6
    if records:
        xs = [r.center_x for r in records]
        ys = [r.center_y for r in records]
        # network input is (64, 96) on a 48x64 scaled source; original-pixel
        # outputs may exceed the scaled frame but stay in the 128x96 original
        assert max(xs) <= 128.0 + 1e-3 and max(ys) <= 96.0 + 1e-3
        # at least some coordinates land beyond the scaled-source extent,
        # proving the decode scale was composed back in
        assert max(xs) > 48.0 or max(ys) > 64.0 or len(records) < 3


def test_run_segment_centernet_family(tmp_path):
    """The centernet head family composes with the full pipeline — chunked
    run_segment, TTA candidate union, submission serialization — through
    the shared (boxes, scores, classes) candidate contract."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        detector=dataclasses.replace(
            CFG.detector, head_family="centernet", centernet_level=3,
            fpn_levels=(3, 4, 5),
        ),
        pipeline=dataclasses.replace(CFG.pipeline, tta_flip=True),
    )
    pipe = SegmentPipeline(cfg, rng=jax.random.PRNGKey(0))
    records, stats = pipe.run_segment(make_segment(t=6))
    assert stats["frames"] == 6
    # random weights: records may be sparse, but serialization must round-trip
    path = str(tmp_path / "cn.jsonl")
    subm.write_jsonl(path, records)
    assert len(subm.read_jsonl(path)) == len(records)
