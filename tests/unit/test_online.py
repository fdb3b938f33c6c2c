"""Online serving surface (pipeline/online.py): per-frame latency path.

The online step must produce the SAME tracks as the chunked throughput
path (SegmentPipeline) — same detector params, same frames, one frame per
dispatch instead of chunk_frames — and must expose latency stats and a
reset() for stream restarts.

Module-scoped fixtures share the compiled sessions across tests (each
OnlineTracker instance re-jits, ~10 s on CPU).
"""
import jax
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import (
    Config, DetectorConfig, PipelineConfig, TrackerConfig,
)
from waymo_2d_tracking_tpu.pipeline.online import (
    OnlineMultiCamTracker, OnlineTracker,
)
from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
        dtype="float32", score_threshold=0.01,
    ),
    tracker=TrackerConfig(
        max_tracks=16, max_detections=8, embed_dim=0, n_init=1,
        score_threshold=0.0, birth_score_threshold=0.0,
    ),
    pipeline=PipelineConfig(chunk_frames=4),
)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (8, 64, 96, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def pipe():
    return SegmentPipeline(CFG, rng=jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def sess(pipe):
    s = OnlineTracker(CFG, params=pipe.params, context_name="ctx",
                      camera_name=1)
    warm_s = s.warmup((64, 96))
    assert warm_s > 0.0
    return s


def _key(r):
    return (r.timestamp_micros, r.object_id)


def test_online_matches_chunked_pipeline(frames, pipe, sess):
    seg = SegmentFrames("ctx", 1, [100 * t for t in range(8)], frames=frames)
    chunked_recs, _ = pipe.run_segment(seg)

    sess.reset()
    online_recs = []
    for t in range(8):
        online_recs.append(sess.step(frames[t], 100 * t))
    online_flat = [r for rs in online_recs for r in rs]

    # identical identity structure frame-for-frame; boxes match to float
    # tolerance (batch-1 vs batch-4 conv tiling may differ in the last ulp)
    assert sorted(map(_key, online_flat)) == sorted(map(_key, chunked_recs))
    by_key = {_key(r): r for r in chunked_recs}
    for r in online_flat:
        c = by_key[_key(r)]
        np.testing.assert_allclose(
            [r.center_x, r.center_y, r.length, r.width],
            [c.center_x, c.center_y, c.length, c.width], rtol=1e-3, atol=0.5,
        )

    stats = sess.latency_stats()
    assert stats["count"] >= 8
    assert 0 < stats["p50_ms"] <= stats["p99_ms"] <= stats["max_ms"]


def test_online_reset_restarts_ids(frames, sess):
    sess.reset()
    for t in range(3):
        sess.step(frames[t], t)
    assert sess.frames_seen == 3
    sess.reset()
    assert sess.frames_seen == 0
    recs = sess.step(frames[0], 0)
    # fresh table: ids start over from 0 for whatever confirms
    assert all(int(r.object_id.split("_")[-1]) < CFG.tracker.max_tracks
               for r in recs)


def test_online_jpeg_bytes_input(frames, sess):
    import cv2

    sess.reset()
    ok, buf = cv2.imencode(".jpg", frames[0][:, :, ::-1])
    assert ok
    recs_bytes = sess.step(buf.tobytes(), 0)
    assert isinstance(recs_bytes, list)  # decode path exercised end-to-end


def test_online_multicam_rig(frames, pipe):
    rig = OnlineMultiCamTracker(CFG, camera_names=[1, 2], params=None,
                                context_name="ctx")
    rig.warmup((64, 96))
    all_recs = []
    for t in range(6):
        recs = rig.step([frames[t], frames[(t + 1) % 8]], 100 * t)
        all_recs.extend(recs)
    cams = {r.camera_name for r in all_recs}
    assert cams <= {1, 2}
    # per-camera identity persistence: some id appears on multiple frames
    spans = {}
    for r in all_recs:
        spans.setdefault((r.camera_name, r.object_id), set()).add(
            r.timestamp_micros)
    assert max(len(v) for v in spans.values()) >= 3
    with pytest.raises(ValueError, match="expected 2 frames"):
        rig.step([frames[0]], 999)
    stats = rig.latency_stats()
    assert stats["count"] == 6
