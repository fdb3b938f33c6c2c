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


def _require_tpu(env):
    """Probe the real backend; skip when no chip is reachable."""
    import pytest

    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    platform = probe.stdout.strip().lower()
    if probe.returncode != 0 or platform in ("", "cpu"):
        pytest.skip(f"no TPU backend here (platform={platform!r})")


# Floors at ~0.75x the best measured reading (VERDICT r3 item 5: the
# driver-observed cross-process spread is +-10-20%, so 0.75x is safe AND
# meaningful — the old 800 floor let a 2.2x headline regression pass).
# Measurement history (BASELINE.md "Measured" sections, rounds 2-4; the
# round-4 full-sweep readings are the 2026-08-19 column):
#   headline (default): 1741.5-1967.4 (r4 int8 A/B), 1798.2 (r4 sweep,
#       640x960-staged sources incl. device letterbox); floor 1400
#   --int8:             1953.7-1999.1 (r4);                 floor 1500
#   --fast:             2492.6 (r3, D=64) / 2243.3 (r4);    floor 1850
#   --production:       953.1 (r3, D=64) / 887.6 (r4);      floor 700
#   --config4 (prod):   991.1 (r4: chunk 16 + 640x960-staged realistic
#       sources; was 620.2/653.3 at chunk 8 network-size);  floor 740
#   --config4 --headline: 1529.7 (r4 chunk sweep: 8/16/32 ->
#       1381.6/1529.7/1305.7 — 80-image batch is the HBM sweet spot);
#       floor 1150
_PRESET_FLOORS = [
    ([], "detect_track_frames_per_sec_per_chip", 1400.0),
    (["--int8"], "detect_track_headline_int8_frames_per_sec_per_chip",
     1500.0),
    (["--fast"], "detect_track_fast_frames_per_sec_per_chip", 1850.0),
    (["--production"], "detect_track_production_frames_per_sec_per_chip",
     700.0),
    (["--config4"], "detect_track_multicam_camframes_per_sec_per_chip",
     740.0),
    (["--config4", "--headline"],
     "detect_track_multicam_headline_camframes_per_sec_per_chip", 1150.0),
]


@_pytest.mark.slow
@_pytest.mark.parametrize(
    "flags,metric,floor", _PRESET_FLOORS,
    ids=["headline", "int8", "fast", "production", "config4",
         "config4-headline"],
)
def test_bench_preset_floor_on_tpu(flags, metric, floor):
    """Per-preset TPU regression floors (table above). Skips off-TPU.
    Marked slow: each preset pays one tunnel compile (minutes)."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env = _tpu_env(repo)
    _require_tpu(env)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), *flags],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metric"] == metric, payload
    assert payload["value"] >= floor, payload


@_pytest.mark.slow
def test_bench_latency_ceiling_on_tpu():
    """Online serving p50 ceiling: measured 29.6 ms/frame on the headline
    preset over the tunnel (round 3). 60 ms (2x) only trips on a real
    serving regression, not tunnel dispatch jitter. Skips off-TPU."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env = _tpu_env(repo)
    _require_tpu(env)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--latency"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "online_serving_latency_p50_ms"
    assert payload["value"] <= 60.0, payload


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
