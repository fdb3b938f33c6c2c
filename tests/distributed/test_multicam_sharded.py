"""Sharded x multicam composition (round 3, VERDICT r2 item 3): contexts
fanned across the mesh, one shared-backbone multi-camera context per device.
Must produce EXACTLY the single-device MultiCamPipeline outputs (pure
fan-out, zero collectives) INCLUDING the .gallery.npz sidecars — which also
pins the exhausted-shard state-freeze fix (ADVICE r2: repeat-padding a
shorter member of a lockstep group must not keep EMA-updating its gallery).
"""
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
from waymo_2d_tracking_tpu.pipeline.multicam import MultiCamPipeline
from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames
from waymo_2d_tracking_tpu.pipeline.sharded import run_context_groups_sharded

CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=64,
        head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=8,
        dtype="float32", score_threshold=0.01,
    ),
    tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=8,
                          appearance_weight=0.2, score_threshold=0.0,
                          birth_score_threshold=0.0, n_init=1),
    pipeline=PipelineConfig(chunk_frames=4),
)
NUM_CAMS = 2


def make_context(name, t, seed, h=96, w=128):
    rng = np.random.default_rng(seed)
    stamps = [1000 * i for i in range(t)]
    return [
        SegmentFrames(
            context_name=name, camera_name=cam,
            timestamps=stamps,
            frames=rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8),
        )
        for cam in range(1, NUM_CAMS + 1)
    ]


@pytest.fixture(scope="module")
def pipeline():
    return MultiCamPipeline(CFG, num_cams=NUM_CAMS, rng=jax.random.PRNGKey(0))


@pytest.mark.slow
def test_sharded_multicam_matches_single_device(pipeline, tmp_path):
    # 3 contexts of unequal length on the 8-device mesh: exercises the
    # partial group + repeat-pad + end-snapshot paths
    contexts = [make_context(f"ctx{i}", t=6 if i % 2 else 9, seed=i)
                for i in range(3)]
    out_ref = str(tmp_path / "ref")
    out_shd = str(tmp_path / "shd")
    os.makedirs(out_ref)
    for ctx in contexts:
        pipeline.run_segments_group(ctx, out_ref)
    flat = [s for ctx in contexts for s in ctx]
    stats = run_context_groups_sharded(pipeline, flat, out_shd)
    assert len(stats) == 3 * NUM_CAMS

    for ctx in contexts:
        for seg in ctx:
            fname = f"{seg.context_name}_{seg.camera_name}.jsonl"
            ref = subm.read_jsonl(os.path.join(out_ref, fname))
            shd = subm.read_jsonl(os.path.join(out_shd, fname))
            assert shd == ref, f"{fname}: sharded != single-device"
            gname = fname[: -len(".jsonl")] + ".gallery.npz"
            gr = np.load(os.path.join(out_ref, gname))
            gs = np.load(os.path.join(out_shd, gname))
            for key in ("track_id", "status", "embed"):
                np.testing.assert_array_equal(
                    gs[key], gr[key], err_msg=f"{gname}:{key}"
                )

    # manifest resume: rerun is a no-op
    assert run_context_groups_sharded(pipeline, flat, out_shd) == []


@pytest.mark.slow
def test_sharded_segment_gallery_freeze_matches_single(tmp_path):
    """ADVICE r2 (sharded.py lockstep padding): in a single-camera sharded
    group with unequal lengths, the SHORTER segment's gallery sidecar must
    equal the non-sharded run_segments sidecar (state frozen at its true
    end, not EMA-drifted over the repeat tail)."""
    from waymo_2d_tracking_tpu.pipeline.run import SegmentPipeline, run_segments
    from waymo_2d_tracking_tpu.pipeline.sharded import run_segments_sharded

    pipe = SegmentPipeline(CFG, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    segs = []
    for i, t in enumerate([5, 13]):   # 13 forces 2 extra chunks on seg0
        segs.append(SegmentFrames(
            context_name=f"s{i}", camera_name=1,
            timestamps=[1000 * k for k in range(t)],
            frames=rng.integers(0, 255, size=(t, 96, 128, 3), dtype=np.uint8),
        ))
    out_ref = str(tmp_path / "ref")
    out_shd = str(tmp_path / "shd")
    run_segments(pipe, segs, out_ref)
    run_segments_sharded(pipe, segs, out_shd)
    for seg in segs:
        gname = f"{seg.context_name}_{seg.camera_name}.gallery.npz"
        gr = np.load(os.path.join(out_ref, gname))
        gs = np.load(os.path.join(out_shd, gname))
        for key in ("track_id", "status", "embed"):
            np.testing.assert_array_equal(
                gs[key], gr[key], err_msg=f"{gname}:{key}"
            )


@pytest.mark.slow
def test_multicam_sharded_cli_flag(tmp_path, capsys):
    """`w2t track --multicam --sharded` end-to-end over a two-camera dir."""
    from waymo_2d_tracking_tpu import cli
    from waymo_2d_tracking_tpu.data.waymo import materialize_directory_segment

    data = str(tmp_path / "data")
    rng = np.random.default_rng(0)
    for i in range(2):
        for cam in (1, 2):
            frames = rng.integers(0, 255, size=(5, 64, 96, 3), dtype=np.uint8)
            materialize_directory_segment(
                data, f"ctx{i}", frames, [1000 * t for t in range(5)],
                camera_id=cam,
            )
    out = str(tmp_path / "out")
    cli.main([
        "track", "--segments-dir", data, "--out-dir", out,
        "--multicam", "--sharded", "--set",
        "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=64", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=8", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_detections=8", "tracker.embed_dim=8", "tracker.n_init=1",
        'pipeline.cameras=["FRONT","FRONT_LEFT"]',
        "pipeline.chunk_frames=4",
    ])
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) == 4   # 2 contexts x 2 cameras
    manifest = os.path.join(out, "manifest.jsonl")
    assert len(open(manifest).read().strip().splitlines()) == 4
    # gallery sidecars exist for every (context, camera)
    galleries = [f for f in os.listdir(out) if f.endswith(".gallery.npz")]
    assert len(galleries) == 4
