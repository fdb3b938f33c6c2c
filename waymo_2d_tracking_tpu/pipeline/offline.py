"""Tracker-only offline runs over precomputed detections (config 1).

The reference's equivalent surface is its tracker script run over saved
detector outputs (SURVEY.md §3.2: `track --from-detections`); here that
core is a library function so both the CLI verb and the tracker
hyperparameter search (`pipeline/tune.py`) drive the identical path.
Pure-JAX tracker => runs on the CPU backend with no TPU attached.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def check_no_appearance(cfg) -> None:
    """Fail fast when a from-detections run would feed zero embeddings
    into an appearance-using tracker (the output silently collapses —
    observed MOTA 0.94 -> 0.005; see cli history)."""
    uses_appearance = cfg.tracker.embed_dim > 0 and (
        cfg.tracker.appearance_weight > 0.0 or cfg.tracker.reid_recovery
    )
    if uses_appearance:
        raise ValueError(
            "track --from-detections: detection files have no embeddings, "
            "but the tracker config enables appearance association "
            f"(embed_dim={cfg.tracker.embed_dim}, appearance_weight="
            f"{cfg.tracker.appearance_weight}, reid_recovery="
            f"{cfg.tracker.reid_recovery}) over zero vectors. "
            "Add --set tracker.embed_dim=0 (IoU-only, config-1 semantics)."
        )


def group_rows_by_segment(rows) -> Dict[Tuple[str, int], list]:
    """Detection/track records -> {(context_name, camera_name): rows}."""
    by_seg: Dict[Tuple[str, int], list] = {}
    for r in rows:
        by_seg.setdefault((r.context_name, r.camera_name), []).append(r)
    return by_seg


def rows_to_detections(cfg, rows_for_segment) -> Tuple[List[int], "Detections"]:
    """One segment's detection rows -> (frame timestamps, padded Detections).

    The frame grid is inferred from the timestamps (io_out/postprocess
    infer_frame_grid): a frame where the detector emitted zero detections
    must still step the tracker (aging/coasting) and must be visible to
    interp_max_gap.
    """
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.io_out.postprocess import infer_frame_grid
    from waymo_2d_tracking_tpu.types import Detections

    d = cfg.tracker.max_detections
    stamps = infer_frame_grid([r.timestamp_micros for r in rows_for_segment])
    t_idx = {ts: i for i, ts in enumerate(stamps)}
    t = len(stamps)
    boxes = np.zeros((t, d, 4), np.float32)
    scores = np.zeros((t, d), np.float32)
    classes = np.zeros((t, d), np.int32)
    valid = np.zeros((t, d), bool)
    counts = [0] * t
    for r in rows_for_segment:
        i = t_idx[r.timestamp_micros]
        j = counts[i]
        if j >= d:
            continue
        boxes[i, j] = r.to_xyxy()
        scores[i, j] = r.score
        classes[i, j] = {1: 0, 2: 1, 4: 2}.get(r.object_type, 0)
        valid[i, j] = True
        counts[i] += 1
    dets = Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
        classes=jnp.asarray(classes),
        embeds=jnp.zeros((t, d, max(cfg.tracker.embed_dim, 1)), jnp.float32),
        valid=jnp.asarray(valid),
    )
    return stamps, dets


def track_detection_rows(cfg, rows) -> list:
    """Run the tracker over detection records; returns TrackRecords.

    Groups rows by (context, camera), scans the tracker over each
    segment's frame grid, and applies the configured offline gap
    interpolation (pipeline.interp_max_gap) — byte-identical to the
    `w2t track --from-detections` output path.
    """
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.tracker import Tracker

    check_no_appearance(cfg)
    tracker = Tracker(cfg.tracker)
    all_records: list = []
    for (ctx, cam), rs in sorted(group_rows_by_segment(rows).items()):
        stamps, dets = rows_to_detections(cfg, rs)
        _, outputs = tracker.run(dets)
        all_records.extend(
            subm.records_from_track_outputs(
                outputs, ctx, stamps, cam,
                interp_max_gap=cfg.pipeline.interp_max_gap,
            )
        )
    return all_records
