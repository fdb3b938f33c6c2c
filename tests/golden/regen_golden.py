"""Regenerate the frozen golden outputs for the config-1 clip.

Run deliberately (CPU backend, matching CI) after an intended tracker
behavior change:  cd /root/repo && python tests/golden/regen_golden.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

from tests.golden.test_golden_clip import (  # noqa: E402
    GOLDEN3_PATH,
    GOLDEN_PATH,
    run_config1,
    run_config3,
)

outs, _ = run_config1()
valid = np.asarray(outs.valid)
np.savez_compressed(
    GOLDEN_PATH,
    valid=valid,
    track_id=np.where(valid, np.asarray(outs.track_id), -1),
    boxes=np.where(valid[..., None], np.asarray(outs.boxes), 0.0),
)
print(f"wrote {GOLDEN_PATH}: {valid.sum()} emissions over {valid.shape[0]} frames")

outs3, _ = run_config3()
valid3 = np.asarray(outs3.valid)
np.savez_compressed(
    GOLDEN3_PATH,
    valid=valid3,
    track_id=np.where(valid3, np.asarray(outs3.track_id), -1),
)
print(f"wrote {GOLDEN3_PATH}: {valid3.sum()} emissions")
