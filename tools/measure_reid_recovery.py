"""Measure ReID stage-2 recovery through the TRAINED reid pixels fixture.

Verdict-r4 Missing #3: appearance cost, EMA embedding updates, the gallery
ring and stage-2 recovery — the config-3/5 quality story — had only ever
been exercised by scripted embedding streams; the pixels fixture was
embed_dim=0. This tool runs the RECOVERY clip (seed 29: objects 0 and 1
fully occluded for frames [30, 52) — long enough for a max_age=5 track to
die into LOST, short enough for max_lost_age=30 survival — with measured
appearance margins >= 0.24 brightness vs same-class objects) through the
FULL product path with the ReID-enabled fixture
(tests/fixtures/pixels_detector_reid.msgpack, embed_dim=32), comparing
reid_recovery OFF vs ON across appearance_gate / gallery_size /
recovery_momentum. The measured values back the ordering floors in
tests/golden/test_reid_recovery.py and the BASELINE.md row.

Usage:
    env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/measure_reid_recovery.py
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_reid_recovery.py
"""
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

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from golden.test_reid_recovery import (  # noqa: E402
        PIXELS_DET_REID, RECOVERY_CLIP, _records_to_frames, base_tracker_kw,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    runner = DetectorRunner(PIXELS_DET_REID)
    template = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    with open(os.path.join(fixtures, "pixels_detector_reid.msgpack"), "rb") as f:
        variables = serialization.from_bytes(template, f.read())

    frames, gt = render_video_clip(RECOVERY_CLIP)
    gf = gt_to_frames(gt)
    backend = jax.default_backend()

    variants = [("off", {})]
    for gate in (0.2, 0.3, 0.4):
        for gallery in (1, 4):
            variants.append((
                f"on_g{gate}_k{gallery}",
                dict(reid_recovery=True, appearance_gate=gate,
                     gallery_size=gallery),
            ))
    variants.append((
        "on_g0.3_k4_mom",
        dict(reid_recovery=True, appearance_gate=0.3, gallery_size=4,
             recovery_momentum=True),
    ))

    for name, kw in variants:
        cfg = Config(
            detector=PIXELS_DET_REID,
            tracker=TrackerConfig(**{**base_tracker_kw(), **kw}),
            pipeline=PipelineConfig(chunk_frames=16, interp_max_gap=0),
        )
        pipeline = SegmentPipeline(cfg, params=variables)
        records, _ = pipeline.run_segment(SegmentFrames(
            context_name="recovery", camera_name=1,
            timestamps=list(range(RECOVERY_CLIP.num_frames)), frames=frames,
        ))
        m = evaluate_mot(
            gf, _records_to_frames(records, RECOVERY_CLIP.num_frames)
        )
        d = m.as_dict()
        print(json.dumps({
            "backend": backend, "variant": name,
            "mota": round(d["mota"], 4), "idf1": round(d["idf1"], 4),
            "idsw": d["num_idsw"], "fp": d["num_fp"], "fn": d["num_fn"],
            "mt": d["mostly_tracked"],
        }), flush=True)


if __name__ == "__main__":
    main()
