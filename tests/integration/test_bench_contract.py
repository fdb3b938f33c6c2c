"""Driver contract: bench.py prints exactly one JSON line with the required
keys (SURVEY.md C27). Runs the config-1 CPU path (tracker-only)."""
import json
import os
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


def test_bench_config1_regression_floor():
    """SURVEY §4 'Benchmark regression': assert the config-1 CPU tracker
    throughput stays above a conservative floor. The floor is ~20x below the
    measured CPU number, so it only trips on catastrophic regressions
    (e.g. a shape change forcing recompiles inside the frame loop), never on
    machine variance."""
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
    assert payload["value"] >= 1000.0, payload
