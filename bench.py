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


def bench_detect_track(num_frames=128, repeats=5, preset="headline",
                       src_hw=None, metric=None):
    """End-to-end detect+track on synthetic frames (the headline metric).

    preset: name of a configs/<preset>.yaml. 'headline' (default since
    round 3) is the quality-bearing >=1500 fps/chip point: r18 s2d +
    reid128, appearance association AND long-horizon re-ID recovery ON,
    golden-clip tracker quality identical to config-3 (see that file).
    'production' is the larger r34 point (851-922 fps); 'fast' the IoU-only
    speed demonstration. src_hw=(1280,1920) additionally runs the
    device-side letterbox/resize from Waymo-native frames.
    """
    import os

    from waymo_2d_tracking_tpu.config import load_config
    from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_detect_track_bench

    cfg = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", f"{preset}.yaml")
    )
    return run_detect_track_bench(
        num_frames=num_frames, repeats=repeats, config=cfg, src_hw=src_hw,
        metric=metric or f"detect_track_{preset}_frames_per_sec_per_chip",
    )


def bench_tta(num_frames=32, repeats=3):
    """BASELINE config 5: multi-scale + flip TTA detect+track."""
    from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_detect_track_bench

    return run_detect_track_bench(
        num_frames=num_frames, repeats=repeats, image_hw=(640, 960),
        chunk=8, tta=True,
        metric="detect_track_tta_frames_per_sec_per_chip",
    )


def bench_host_ingestion(num_frames=64, hw=(1280, 1920), repeats=5):
    """Host-side JPEG decode throughput (SURVEY.md §7: 1500 fps/chip x 8
    chips needs ~12k decodes/sec on the host). Measures the native C++
    thread-pool decoder on Waymo-native-size frames."""
    import cv2
    import numpy as np

    from waymo_2d_tracking_tpu.data.jpeg import BatchJpegDecoder

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (num_frames,) + hw + (3,), np.uint8)
    jpegs = [
        cv2.imencode(".jpg", f[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])[1].tobytes()
        for f in frames
    ]
    import os

    dec = BatchJpegDecoder(hw[0], hw[1])
    native = dec.is_native
    try:
        dec.decode(jpegs[:4])  # warm the pool
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = dec.decode(jpegs)
        dt = (time.perf_counter() - t0) / repeats
    finally:
        dec.close()
    per_sec = num_frames / dt
    cores = os.cpu_count() or 1
    # The 12k/s budget (SURVEY.md §7) assumes a real multi-core TPU host;
    # this container exposes a single core, so the honest scalable number is
    # decodes/sec/core (the pool scales linearly until memory bandwidth).
    return {
        "metric": "host_jpeg_decodes_per_sec",
        "value": round(per_sec, 1),
        "unit": (
            f"decodes/sec ({hw[0]}x{hw[1]}, native={native}, cores={cores}, "
            f"per_core={per_sec / cores:.1f})"
        ),
        "vs_baseline": round(per_sec / 12000.0, 3),
    }


def bench_online_latency(multicam: bool = False):
    """Per-frame serving latency (p50 ms) of `w2t track --online` on the
    headline preset; vs_baseline is the real-time margin against the 10 Hz
    Waymo camera period. multicam=True times the 5-camera rig tick
    (`--online --multicam`) instead — one shared-backbone batch per tick.
    See pipeline/bench_e2e.run_online_latency_bench."""
    from waymo_2d_tracking_tpu.pipeline.bench_e2e import (
        run_online_latency_bench,
    )

    return run_online_latency_bench(multicam=multicam)


def _fallback_to_cpu_config1(reason: str):
    """Restart this bench on the CPU tracker-only row (backend choice is
    pinned pre-import via JAX_PLATFORMS, so a clean re-exec is the only
    reliable switch)."""
    import os

    print(f"# TPU backend unavailable, falling back to CPU tracker-only: "
          f"{reason}", file=sys.stderr)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the TPU plugin dials its tunnel during jax init even under
    # JAX_PLATFORMS=cpu (it hangs when the tunnel is wedged — the very
    # condition that got us here), so drop it from the child's path
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__), "--config1"], env)


def _device_backend_alive(timeout_s: float = 300.0) -> bool:
    """Probe jax device init in a SUBPROCESS with a hard timeout.

    The tunneled backend has two failure modes: raising
    'Unable to initialize backend' (handled in main) and HANGING
    indefinitely during init (observed in round 3) — a hang in-process
    would wedge the whole bench, so the probe must be killable.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True  # explicitly CPU: nothing to probe
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # persistent XLA compile cache (utils/compile_cache): the timed regions
    # warm up first so this never touches the numbers, but it cuts the
    # multi-minute tunnel compile out of repeat harness runs
    try:
        from waymo_2d_tracking_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()
    except Exception:
        pass
    if "--host" in sys.argv:
        print(json.dumps(bench_host_ingestion()))
        return
    if "--latency" in sys.argv:
        print(json.dumps(bench_online_latency(
            multicam="--multicam" in sys.argv)))
        return
    if "--fast" in sys.argv:
        print(json.dumps(bench_detect_track(preset="fast")))
        return
    if "--production" in sys.argv:
        print(json.dumps(bench_detect_track(preset="production")))
        return
    if "--int8" in sys.argv and "--config4" not in sys.argv:
        print(json.dumps(bench_detect_track(preset="headline_int8",
                                            src_hw=(640, 960))))
        return
    if "--config4" in sys.argv:
        from waymo_2d_tracking_tpu.pipeline.bench_e2e import run_multicam_bench

        # --config4 --headline = THE v5e deployment shape: 5 cameras on
        # the >=1500 single-cam point, staged at the post-decode source
        # size (VERDICT r3 item 3b); default stays the production row.
        # chunk 16 = an 80-image shared-backbone batch: the round-4 chunk
        # sweep (tools/perf_multicam_chunk.py) measured 8->16 as
        # 1381.6 -> 1529.7 cam-fps/chip, and chunk 32 (160-image batch)
        # exhausts v5e HBM with the scan carry resident.
        if "--int8" in sys.argv:
            # int8 x multicam composition: the 5-camera deployment shape
            # on the PTQ detector (run_multicam_bench runs the driver's
            # ensure_calibrated hook before the timed region)
            print(json.dumps(run_multicam_bench(
                num_frames=64, chunk=16, preset="headline_int8",
                src_hw=(640, 960))))
        elif "--headline" in sys.argv:
            print(json.dumps(run_multicam_bench(
                num_frames=64, chunk=16, preset="headline",
                src_hw=(640, 960))))
        else:
            # production row, round-4 methodology: realistic 640x960
            # staging (post decode_scale_denom=2) + chunk 16 — measured
            # 991.1 cam-fps vs 627.4 at the old chunk-8 network-size
            # staging, despite now including the device letterbox
            print(json.dumps(run_multicam_bench(
                num_frames=64, chunk=16, src_hw=(640, 960))))
        return
    if "--config5" in sys.argv:
        print(json.dumps(bench_tta()))
        return
    # Default headline staging is the REALISTIC deployment source: Waymo
    # 1280x1920 after the preset's decode_scale_denom=2 DCT-scaled decode
    # = 640x960, letterboxed to 448x672 ON DEVICE — so the committed number
    # includes the device-side resize (VERDICT r3 item 3a). --src-net
    # stages at the network input size (the pre-round-4 methodology);
    # --src-full at full 1280x1920 (decode_scale_denom=1 deployments).
    src_hw = (640, 960)
    if "--src-full" in sys.argv:
        src_hw = (1280, 1920)
    elif "--src-net" in sys.argv:
        src_hw = None
    tracker_only = "--config1" in sys.argv
    if not tracker_only and not _device_backend_alive():
        _fallback_to_cpu_config1("device init probe hung or failed")
    if not tracker_only:
        try:
            # keep the round-1 metric name for the headline row so the
            # driver's BENCH_r* series stays comparable
            result = bench_detect_track(
                src_hw=src_hw, metric="detect_track_frames_per_sec_per_chip"
            )
        except ImportError:
            tracker_only = True
        except RuntimeError as e:
            # a dead device tunnel ("Unable to initialize backend ...")
            # should degrade to the CPU tracker-only row, not crash the
            # harness; anything else is a real failure. The backend choice
            # is pinned pre-import (JAX_PLATFORMS), so restart on CPU.
            if "backend" not in str(e).lower():
                raise
            _fallback_to_cpu_config1(str(e))
    if tracker_only:
        result = bench_tracker_only()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
