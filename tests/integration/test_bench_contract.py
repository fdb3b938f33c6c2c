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
