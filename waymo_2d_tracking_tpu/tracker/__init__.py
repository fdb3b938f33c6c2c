"""On-device SORT-family tracker (components C12-C17).

The reference tracker runs per-frame numpy/scipy on the host with a per-track
Python Kalman loop (SURVEY.md §3.1); here every stage — Kalman predict/update
vectorized across all live track slots, batched IoU+cosine cost fusion,
auction linear assignment, and masked lifecycle — is a fixed-shape JAX
computation, so a whole segment runs as ``lax.scan`` on device.
"""
from waymo_2d_tracking_tpu.tracker.tracker import (  # noqa: F401
    Tracker,
    init_state,
    track_step,
    track_segment,
)
