"""Sharded per-segment inference fan-out on the product surface (round 2:
VERDICT r1 next-step #6): ``run_segments_sharded`` / ``w2t track --sharded``
runs groups of mesh-size segments in lockstep, one per device via shard_map,
and must produce EXACTLY the same per-segment outputs as the single-device
``run_segments`` path (embarrassing parallelism — zero collectives)."""
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
from waymo_2d_tracking_tpu.pipeline.sharded import run_segments_sharded

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


def make_segment(name, t, seed, h=96, w=128, cam=1):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)
    return SegmentFrames(
        context_name=name, camera_name=cam,
        timestamps=[1000 * i for i in range(t)], frames=frames,
    )


@pytest.fixture(scope="module")
def pipeline():
    return SegmentPipeline(CFG, rng=jax.random.PRNGKey(0))


@pytest.mark.slow
def test_sharded_fanout_matches_single_device(pipeline, tmp_path):
    # 9 segments on an 8-device mesh -> one full group + one partial group;
    # unequal lengths exercise the zero-pad + trim path
    segs = [
        make_segment(f"seg{i}", t=6 if i % 3 else 9, seed=i) for i in range(9)
    ]
    out_ref = str(tmp_path / "ref")
    out_shd = str(tmp_path / "shd")
    run_segments(pipeline, segs, out_ref)
    stats = run_segments_sharded(pipeline, segs, out_shd)
    assert len(stats) == 9

    for seg in segs:
        fname = f"{seg.context_name}_{seg.camera_name}.jsonl"
        ref = subm.read_jsonl(os.path.join(out_ref, fname))
        shd = subm.read_jsonl(os.path.join(out_shd, fname))
        assert shd == ref, f"{fname}: sharded != single-device"

    # manifest written with every key; rerun is a no-op
    manifest = [
        json.loads(l)
        for l in open(os.path.join(out_shd, "manifest.jsonl"))
    ]
    assert {m["key"] for m in manifest} == {f"seg{i}/1" for i in range(9)}
    assert run_segments_sharded(pipeline, segs, out_shd) == []


@pytest.mark.slow
def test_sharded_cli_flag(pipeline, tmp_path, capsys):
    """`w2t track --sharded` end-to-end over a directory of segments."""
    from waymo_2d_tracking_tpu import cli
    from waymo_2d_tracking_tpu.data.waymo import materialize_directory_segment

    data = str(tmp_path / "data")
    rng = np.random.default_rng(0)
    for i in range(2):
        frames = rng.integers(0, 255, size=(5, 64, 96, 3), dtype=np.uint8)
        materialize_directory_segment(
            data, f"ctx{i}", frames, [1000 * t for t in range(5)]
        )
    out = str(tmp_path / "out")
    cli.main([
        "track", "--segments-dir", data, "--out-dir", out, "--sharded",
        "--set",
        "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
        "detector.fpn_channels=64", "detector.head_depth=1",
        "detector.pre_nms_topk=32", "detector.max_detections=8",
        "detector.embed_dim=0", "detector.dtype=float32",
        "detector.score_threshold=0.01",
        "tracker.max_detections=8", "tracker.embed_dim=0", "tracker.n_init=1",
        "pipeline.chunk_frames=4",
    ])
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) == 2
    manifest = os.path.join(out, "manifest.jsonl")
    assert os.path.exists(manifest)
    assert len(open(manifest).read().strip().splitlines()) == 2


def test_sharded_grouping_by_resolution_lazy_and_fault_injection(tmp_path, monkeypatch):
    """run_segments_sharded logic (no device work — run_group is stubbed):
    - groups NEVER mix source resolutions (one stacked batch per group);
    - segments are consumed lazily from a generator;
    - fail_after raises after N completed segments, manifest keeps the rest.
    """
    import numpy as np
    import pytest as _pytest

    from waymo_2d_tracking_tpu.pipeline import sharded as sh
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames

    groups_run = []

    class FakeRunner:
        n_shards = 2

        def __init__(self, pipeline, mesh):
            pass

        def run_group(self, group, out_dir, detections_only=False):
            groups_run.append([(s.context_name, s.frames.shape[1:3]) for s in group])
            return [
                {"context": s.context_name, "camera": s.camera_name,
                 "frames": s.num_frames, "tracks": 0, "records": 0, "shard": i}
                for i, s in enumerate(group)
            ]

    monkeypatch.setattr(sh, "ShardedSegmentRunner", FakeRunner)

    def make(name, hw):
        return SegmentFrames(
            context_name=name, camera_name=1, timestamps=[0, 1000],
            frames=np.zeros((2,) + hw + (3,), np.uint8),
        )

    consumed = []

    def seg_gen():
        # FRONT-sized and SIDE-sized segments interleaved
        for name, hw in [("a", (12, 16)), ("b", (8, 16)), ("c", (12, 16)),
                         ("d", (8, 16)), ("e", (12, 16))]:
            consumed.append(name)
            yield make(name, hw)

    out = str(tmp_path / "out")
    stats = sh.run_segments_sharded(object(), seg_gen(), out, mesh=object())
    assert len(stats) == 5
    for g in groups_run:
        assert len({hw for _n, hw in g}) == 1, f"mixed resolutions: {g}"
    # full groups flush as soon as they fill (lazy consume): the (a, c)
    # 12x16 group must have run before segment e was generated
    assert groups_run[0] == [("a", (12, 16)), ("c", (12, 16))]

    # fault injection: fresh dir, stop after 2 completed segments
    groups_run.clear()
    out2 = str(tmp_path / "out2")
    with _pytest.raises(RuntimeError, match="fault injection"):
        sh.run_segments_sharded(object(), seg_gen(), out2, mesh=object(),
                                fail_after=2)
    import json as _json

    with open(out2 + "/manifest.jsonl") as f:
        done = [_json.loads(l)["key"] for l in f if l.strip()]
    assert len(done) == 2   # the first full group committed before the stop


@pytest.mark.slow
def test_sharded_detect_matches_single_device(pipeline, tmp_path):
    """`w2t detect --sharded` parity: stateless detect fan-out produces the
    same per-segment detections as run_segment(detections_only=True)."""
    segs = [make_segment(f"dseg{i}", t=6 if i % 2 else 9, seed=100 + i)
            for i in range(9)]
    out_dir = str(tmp_path / "det_shd")
    stats = run_segments_sharded(pipeline, segs, out_dir,
                                 detections_only=True)
    assert len(stats) == 9

    for seg in segs:
        ref, _ = pipeline.run_segment(seg, detections_only=True)
        fname = f"{seg.context_name}_{seg.camera_name}.jsonl"
        shd = subm.read_jsonl(os.path.join(out_dir, fname))
        assert shd == ref, f"{fname}: sharded detect != single-device"
        # stateless path writes no gallery sidecars
        assert not os.path.exists(
            os.path.join(out_dir, fname[:-6] + ".gallery.npz"))
