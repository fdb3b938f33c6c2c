"""Chunk-size sweep for the config-4 multicam deployment shape.

Round-4 question (VERDICT r3 item 3b follow-up): `run_multicam_bench`
hard-coded chunk=8, a 40-image detector batch — while the single-camera
headline point runs chunk 128 (batch 128), and round 2 measured +33-48%
going 64->128 on the detector batch alone. A 5-camera chunk of C frames
gives a 5C-image shared-backbone batch, so chunk 24-32 should recover the
single-cam batch efficiency. This sweeps chunk x {preset} in one process
(A/B within one tunnel session; best-of-3 groups inside run_multicam_bench
already handles contention).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_multicam_chunk.py
"""
import json

from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_multicam_bench


def main():
    rows = []
    for chunk, num_frames in ((8, 64), (16, 64), (32, 64), (64, 128)):
        r = run_multicam_bench(
            num_frames=num_frames, chunk=chunk,
            preset="headline", src_hw=(640, 960),
        )
        r["chunk"] = chunk
        rows.append(r)
        print(json.dumps(r), flush=True)
    best = max(rows, key=lambda r: r["value"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
