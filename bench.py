"""Benchmark harness (component C27). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.md): >= 1500 frames/sec/chip end-to-end
detect+track on TPU. Until the detector is wired into the pipeline this
reports the detect+track path that exists; the metric name says which.

Run: python bench.py            (uses the real TPU chip via the default env)
     python bench.py --config1  (tracker-only over precomputed detections)
"""
import json
import sys
import time

BASELINE_FPS = 1500.0


def bench_tracker_only(num_frames=200, repeats=20):
    """BASELINE config 1: SORT-style tracking over precomputed detections."""
    import jax

    from waymo_2d_tracking_tpu.config import TrackerConfig
    from waymo_2d_tracking_tpu.data.synthetic import (
        SyntheticClipConfig,
        generate_clip,
    )
    from waymo_2d_tracking_tpu.tracker import Tracker

    dets, _ = generate_clip(
        SyntheticClipConfig(num_frames=num_frames, num_objects=12, seed=0)
    )
    tracker = Tracker(
        TrackerConfig(max_tracks=64, max_detections=64, embed_dim=0)
    )
    # warm up jit
    state, outs = tracker.run(dets)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(repeats):
        state, outs = tracker.run(dets)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / repeats
    fps = num_frames / dt
    return {
        "metric": "tracker_only_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }


def bench_detect_track(num_frames=64, repeats=5):
    """End-to-end detect+track on synthetic frames (the headline metric)."""
    import jax

    from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_detect_track_bench

    return run_detect_track_bench(num_frames=num_frames, repeats=repeats)


def main():
    tracker_only = "--config1" in sys.argv
    if not tracker_only:
        try:
            result = bench_detect_track()
        except ImportError:
            tracker_only = True
    if tracker_only:
        result = bench_tracker_only()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
