"""waymo_2d_tracking_tpu — TPU-native video detect-and-track framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``xuyuan/waymo_2d_tracking`` Waymo Open Dataset 2D-tracking pipeline
(reference mount at /root/reference was empty this build — see SURVEY.md §0;
capability list derives from the BASELINE.json north-star spec).

Subpackages
-----------
- ``data``      — Waymo segment ingestion, preprocessing, prefetch, synthetic fixtures
- ``models``    — flax detector: ResNet-50 backbone, FPN, heads, ReID embedding
- ``ops``       — device ops & Pallas kernels: IoU, NMS, top-k, RoIAlign, assignment
- ``tracker``   — fully on-device SORT-family tracker: vectorized Kalman,
                  cost fusion, lifecycle, ``track_step`` / ``lax.scan``
- ``parallel``  — mesh / sharding helpers (pjit data-parallel fan-out)
- ``pipeline``  — per-segment orchestration, multi-camera batching, TTA
- ``io_out``    — submission-format writer
- ``eval``      — CLEAR-MOT (MOTA/MOTP) evaluation
- ``train``     — detector training loop (optax, orbax checkpointing)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import waymo_2d_tracking_tpu` light)."""
    if name in ("Config", "DetectorConfig", "TrackerConfig", "PipelineConfig",
                "TrainConfig", "load_config"):
        from waymo_2d_tracking_tpu import config as _m
    elif name in ("Detections", "TrackerState", "TrackOutputs"):
        from waymo_2d_tracking_tpu import types as _m
    elif name == "Tracker":
        from waymo_2d_tracking_tpu import tracker as _m
    elif name == "DetectorRunner":
        from waymo_2d_tracking_tpu.models import detector as _m
    elif name in ("SegmentPipeline", "SegmentFrames", "run_segments"):
        from waymo_2d_tracking_tpu.pipeline import run as _m
    elif name == "MultiCamPipeline":
        from waymo_2d_tracking_tpu.pipeline import multicam as _m
    elif name == "DetectorTrainer":
        from waymo_2d_tracking_tpu.train import train as _m
    elif name in ("config", "types", "data", "models", "ops", "tracker",
                  "parallel", "pipeline", "io_out", "eval", "train", "utils",
                  "cli"):
        import importlib

        return importlib.import_module(f"waymo_2d_tracking_tpu.{name}")
    else:
        raise AttributeError(name)
    return getattr(_m, name)
