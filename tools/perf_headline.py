"""Round-3 headline sweep: quality-bearing (ReID-on) >=1500 fps candidates.

VERDICT.md round-2 item 1: build the r18+reid128 point the round-2 sweep
licenses (BASELINE.md: r18 s2d d2 noP7 + reid128 @512x768 bs32 = 1090
detect-fps) and measure END-TO-END at chunk 128 with the greedy tracker.

Candidates all share: resnet18, s2d stem, 128-wide FPN/head/ReID towers,
head depth 2, P3-P6, embed_dim 128, greedy assignment, chunk 128. Swept:
input size (384x576 / 448x672 / 512x768).

Measurement per the repo's tunnel rules (memory: tpu-tunnel-benchmarking):
one process, each candidate via run_detect_track_bench (best-of-3 in-process
groups, chained dispatches, single host sync).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waymo_2d_tracking_tpu.config import (
    Config,
    DetectorConfig,
    PipelineConfig,
    TrackerConfig,
)
from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_detect_track_bench


def candidate(image_hw, chunk=128, assignment="greedy", embed_dim=128):
    return Config(
        detector=DetectorConfig(
            image_size=image_hw,
            backbone="resnet18",
            stem="s2d",
            fpn_channels=128,
            fpn_levels=(3, 4, 5, 6),
            head_depth=2,
            head_channels=128,
            reid_channels=128,
            embed_dim=embed_dim,
        ),
        tracker=TrackerConfig(
            max_tracks=64,
            embed_dim=embed_dim,
            appearance_weight=0.3 if embed_dim else 0.0,
            assignment=assignment,
        ),
        pipeline=PipelineConfig(chunk_frames=chunk),
    )


if __name__ == "__main__":
    results = {}
    for name, cfg in [
        ("r18_reid128_384x576_c128_greedy", candidate((384, 576))),
        ("r18_reid128_448x672_c128_greedy", candidate((448, 672))),
        ("r18_reid128_512x768_c128_greedy", candidate((512, 768))),
    ]:
        r = run_detect_track_bench(num_frames=128, repeats=5, config=cfg,
                                   metric=name)
        results[name] = r
        print(json.dumps(r), flush=True)
    best = max(results.values(), key=lambda r: r["value"])
    print("BEST:", json.dumps(best))
