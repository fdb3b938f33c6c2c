"""Measure pixels-to-MOTA quality of the trained fixture, float vs int8.

Verdict-r4 Missing #2: the int8 landing was perf-complete but its quality
case was structural (a config diff) plus a random-weights score delta.
This tool runs BOTH rendered golden clips (seed-5 and the seed-11 dense-
occlusion clip) through the FULL product path — SegmentPipeline with the
trained pixels fixture — with detector.quant='off' and 'int8' (auto-
calibration on the first chunk, the product path), and prints one JSON
line per (clip, quant) with the CLEAR-MOT metrics. Run on CPU (the test
harness backend) and on the real TPU chip; the measured values back the
floors in tests/golden/test_pixels_to_mota.py and the BASELINE.md rows.

Usage:
    # CPU (matches pytest harness numerics)
    env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/measure_pixels_quality.py
    # TPU
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_pixels_quality.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from waymo_2d_tracking_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    from flax import serialization

    from waymo_2d_tracking_tpu.config import (
        Config, PipelineConfig, TrackerConfig,
    )
    from waymo_2d_tracking_tpu.data.synthetic import (
        SyntheticClipConfig, render_video_clip,
    )
    from waymo_2d_tracking_tpu.eval.mot import evaluate_mot, gt_to_frames
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner
    from waymo_2d_tracking_tpu.pipeline.run import SegmentFrames, SegmentPipeline

    # import the golden's configs so the measurement IS the test's scenario
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from golden.test_pixels_to_mota import (  # noqa: E402
        CLIP, PIXELS_DET, _records_to_frames,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    runner = DetectorRunner(PIXELS_DET)
    template = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    with open(os.path.join(fixtures, "pixels_detector.msgpack"), "rb") as f:
        variables = serialization.from_bytes(template, f.read())

    clips = {
        "seed5": (CLIP, dict(birth_iou_threshold=0.3)),
        "dense": (
            SyntheticClipConfig(num_frames=80, num_objects=14,
                                image_size=(1024, 1536), seed=11),
            dict(birth_iou_threshold=0.3),
        ),
    }

    backend = jax.default_backend()
    for clip_name, (clip_cfg, tracker_kw) in clips.items():
        frames, gt = render_video_clip(clip_cfg)
        gf = gt_to_frames(gt)
        for quant, scope in (("off", "trunk"), ("int8", "trunk"),
                             ("int8", "all")):
            cfg = Config(
                detector=dataclasses.replace(PIXELS_DET, quant=quant,
                                             quant_scope=scope),
                tracker=TrackerConfig(
                    max_tracks=32, max_detections=32, embed_dim=0,
                    n_init=2, max_age=5, iou_threshold=0.3,
                    score_threshold=0.55, birth_score_threshold=0.65,
                    **tracker_kw,
                ),
                pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
            )
            pipeline = SegmentPipeline(cfg, params=variables)
            records, stats = pipeline.run_segment(SegmentFrames(
                context_name=clip_name, camera_name=1,
                timestamps=list(range(clip_cfg.num_frames)), frames=frames,
            ))
            m = evaluate_mot(
                gf, _records_to_frames(records, clip_cfg.num_frames)
            )
            d = m.as_dict()
            print(json.dumps({
                "backend": backend, "clip": clip_name, "quant": quant,
                "scope": scope,
                "mota": round(d["mota"], 4), "idf1": round(d["idf1"], 4),
                "idsw": d["num_idsw"], "fp": d["num_fp"], "fn": d["num_fn"],
                "mt": d["mostly_tracked"],
            }), flush=True)


if __name__ == "__main__":
    main()
