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
