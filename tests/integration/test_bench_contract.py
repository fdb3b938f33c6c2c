"""Driver contract: bench.py prints exactly one JSON line with the required
keys (SURVEY.md C27). Runs the config-1 CPU path (tracker-only)."""
import json
import os

import pytest
import subprocess
import sys


def test_bench_config1_json_contract():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--config1"],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines}"
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["unit"] == "frames/sec/chip"


@pytest.mark.slow
def test_bench_config1_regression_floor():
    """SURVEY §4 'Benchmark regression': assert the config-1 CPU tracker
    throughput stays above a floor that only trips on catastrophic
    regressions (a shape change forcing recompiles inside the frame loop
    reads < 5 fps: 200 frames x ~0.4 s compile). The floor must NOT encode
    machine speed: this container measured 1000+ fps in round 2 and 65 fps
    in round 3 on IDENTICAL code (round-2 tree re-benchmarked side by side
    — host CPU degradation, not a regression), so any absolute
    "healthy-machine" floor is meaningless here. The chip-gated headline
    floor below covers real performance regressions."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--config1"],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["value"] >= 20.0, payload


def _tpu_env(repo):
    """Subprocess env targeting the REAL default backend (conftest pins this
    process to CPU and scrubs the axon plugin from PYTHONPATH; restore the
    original plugin path so the child sees the TPU)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    tpu_pp = env.get("W2T_TPU_PYTHONPATH", env.get("PYTHONPATH", ""))
    env["PYTHONPATH"] = repo + os.pathsep + tpu_pp
    return env


import pytest as _pytest


@_pytest.mark.slow
def test_bench_headline_floor_on_tpu():
    """Per-preset floor at HALF the measured headline number (1573-1721
    fps/chip round 3): catches a 2x regression whenever a real chip is
    present, instead of only the catastrophic config-1 floor. Skips off-TPU.
    Marked slow: one tunnel compile is minutes."""
    import pytest

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env = _tpu_env(repo)
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    platform = probe.stdout.strip().lower()
    if probe.returncode != 0 or platform in ("", "cpu"):
        pytest.skip(f"no TPU backend here (platform={platform!r})")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "detect_track_frames_per_sec_per_chip"
    assert payload["value"] >= 800.0, payload


def test_online_latency_bench_contract():
    """bench.py --latency payload shape (runs in-process on a tiny config)."""
    from waymo_2d_tracking_tpu.config import (
        Config,
        DetectorConfig,
        TrackerConfig,
    )
    from waymo_2d_tracking_tpu.pipeline.bench_e2e import (
        run_online_latency_bench,
    )

    cfg = Config(
        detector=DetectorConfig(
            backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
            head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
            dtype="float32", score_threshold=0.01,
        ),
        tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=0),
    )
    out = run_online_latency_bench(num_frames=4, config=cfg)
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["metric"] == "online_serving_latency_p50_ms"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0


def test_online_multicam_latency_bench_contract():
    """bench.py --latency --multicam payload shape (rig tick timing)."""
    from waymo_2d_tracking_tpu.config import (
        Config,
        DetectorConfig,
        TrackerConfig,
    )
    from waymo_2d_tracking_tpu.pipeline.bench_e2e import (
        run_online_latency_bench,
    )

    cfg = Config(
        detector=DetectorConfig(
            backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
            head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
            dtype="float32", score_threshold=0.01,
        ),
        tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=0),
    )
    out = run_online_latency_bench(num_frames=3, config=cfg, multicam=True,
                                   num_cams=2)
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["metric"] == "online_multicam_serving_latency_p50_ms"
    assert "rig tick (2 cams)" in out["unit"]
    assert out["value"] > 0
