"""Round-2 sweep 4: production/fast preset variations around the committed
bench points (chunk size, assignment method, slot count).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sweep4.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waymo_2d_tracking_tpu.config import load_config  # noqa: E402
from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_detect_track_bench  # noqa: E402

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs")


def variant(cfg, *, chunk=None, assignment=None, max_tracks=None):
    pl, tr = cfg.pipeline, cfg.tracker
    if chunk:
        pl = dataclasses.replace(pl, chunk_frames=chunk)
    if assignment:
        tr = dataclasses.replace(tr, assignment=assignment)
    if max_tracks:
        tr = dataclasses.replace(tr, max_tracks=max_tracks)
    return dataclasses.replace(cfg, pipeline=pl, tracker=tr)


def main():
    prod = load_config(os.path.join(CONFIGS, "production.yaml"))
    fast = load_config(os.path.join(CONFIGS, "fast.yaml"))
    rows = {
        "prod chunk48": variant(prod, chunk=48),
        "prod chunk64": variant(prod, chunk=64),
        "prod greedy": variant(prod, assignment="greedy"),
        "prod S=48": variant(prod, max_tracks=48),
        "fast chunk128": variant(fast, chunk=128),
        "fast S=48": variant(fast, max_tracks=48),
    }
    for name, cfg in rows.items():
        n = max(128, cfg.pipeline.chunk_frames * 2)
        r = run_detect_track_bench(num_frames=n, repeats=5, config=cfg,
                                   metric=name)
        print(f"{name:>14}: {r['value']} fps", flush=True)


if __name__ == "__main__":
    main()
