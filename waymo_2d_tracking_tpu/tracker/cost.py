"""Association cost fusion (component C13).

Fuses batched pairwise IoU (C12), appearance cosine distance (C11 embeddings),
class consistency, and gating into a single (S, D) cost + forbid pair for the
auction assignment — all one fused XLA computation on device, vs the
reference's per-frame host numpy (SURVEY.md §3.1).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.ops.iou import pairwise_iou
from waymo_2d_tracking_tpu.tracker.kalman import gating_distance
from waymo_2d_tracking_tpu.types import (
    Detections,
    TrackerState,
    boxes_cxcywh_to_xyxy,
    boxes_xyxy_to_cxcywh,
)


def cosine_distance(track_embeds: jnp.ndarray, det_embeds: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity. Inputs are L2-normalized: (S, E) x (D, E) -> (S, D).

    One MXU matmul — this is the op that makes on-device appearance
    association essentially free next to the detector forward.
    """
    return 1.0 - track_embeds @ det_embeds.T


def _buffer_boxes(boxes_xyxy: jnp.ndarray, b: float) -> jnp.ndarray:
    """Expand each xyxy box's width/height by ``b`` on every side (C-BIoU).

    A box of size (w, h) becomes (w*(1+2b), h*(1+2b)) around the same center,
    so two boxes separated by up to ~2b box-widths still overlap — the cheap
    way to keep fast movers associable without touching the motion model.
    """
    dx = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * b
    dy = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) * b
    return jnp.stack(
        [
            boxes_xyxy[..., 0] - dx,
            boxes_xyxy[..., 1] - dy,
            boxes_xyxy[..., 2] + dx,
            boxes_xyxy[..., 3] + dy,
        ],
        axis=-1,
    )


def stage1_cost(
    state: TrackerState,
    dets: Detections,
    det_valid: jnp.ndarray,
    track_mask: jnp.ndarray,
    cfg: TrackerConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Motion+appearance cost for active (tentative/confirmed) tracks.

    Returns (cost (S, D), forbid (S, D)). Gating: IoU below threshold,
    class mismatch, (if appearance is on) cosine distance above gate, and
    (if ``motion_gate`` > 0) squared Mahalanobis distance of the detection
    to the track's Kalman prediction above the chi-square gate
    (DeepSORT-style motion gating — kills IoU-plausible but
    dynamics-implausible matches during fast maneuvers).
    """
    track_boxes = boxes_cxcywh_to_xyxy(state.mean[:, :4])
    det_boxes = dets.boxes
    if cfg.iou_buffer > 0.0:
        track_boxes = _buffer_boxes(track_boxes, cfg.iou_buffer)
        det_boxes = _buffer_boxes(det_boxes, cfg.iou_buffer)
    iou = pairwise_iou(track_boxes, det_boxes)           # (S, D)
    cost = 1.0 - iou
    forbid = iou < cfg.iou_threshold

    lam = cfg.appearance_weight
    if lam > 0.0 and cfg.embed_dim > 0:
        cos = cosine_distance(state.embed, dets.embeds)  # (S, D)
        cost = (1.0 - lam) * cost + lam * cos
        forbid = jnp.logical_or(forbid, cos > cfg.appearance_gate)

    if cfg.motion_gate > 0.0:
        meas = boxes_xyxy_to_cxcywh(dets.boxes)          # (D, 4)
        d2 = gating_distance(state.mean, state.cov, meas,
                             cfg.kalman)                 # (S, D)
        forbid = jnp.logical_or(forbid, d2 > cfg.motion_gate)

    forbid = jnp.logical_or(forbid, state.classes[:, None] != dets.classes[None, :])
    forbid = jnp.logical_or(forbid, jnp.logical_not(track_mask[:, None]))
    forbid = jnp.logical_or(forbid, jnp.logical_not(det_valid[None, :]))
    return cost, forbid


def byte_cost(
    state: TrackerState,
    dets: Detections,
    det_valid: jnp.ndarray,
    track_mask: jnp.ndarray,
    cfg: TrackerConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoU-only cost for the BYTE low-score second association.

    Rows are CONFIRMED tracks stage-1 left unmatched; columns are detections
    with ``byte_low_threshold <= score < score_threshold``. Appearance is
    deliberately excluded — low-score detections are typically partially
    occluded, so their embeddings are unreliable (the ByteTrack finding).
    The IoU gate is ``byte_iou_threshold`` (stricter than stage 1).
    """
    track_boxes = boxes_cxcywh_to_xyxy(state.mean[:, :4])
    iou = pairwise_iou(track_boxes, dets.boxes)          # (S, D)
    forbid = iou < cfg.byte_iou_threshold
    forbid = jnp.logical_or(forbid, state.classes[:, None] != dets.classes[None, :])
    forbid = jnp.logical_or(forbid, jnp.logical_not(track_mask[:, None]))
    forbid = jnp.logical_or(forbid, jnp.logical_not(det_valid[None, :]))
    return 1.0 - iou, forbid


def stage2_cost(
    state: TrackerState,
    dets: Detections,
    det_valid: jnp.ndarray,
    track_mask: jnp.ndarray,
    cfg: TrackerConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Appearance-only recovery cost for LOST tracks (config 5, long-horizon re-ID).

    Lost tracks have stale motion state, so IoU is meaningless; matching is by
    embedding cosine distance alone, gated by ``appearance_gate`` and class.
    With ``gallery_size > 1`` the distance is the best (minimum) over the
    track's ring buffer of recent raw appearances AND its EMA embedding —
    appearance can drift over an occlusion, and any past view may match.
    """
    cos = cosine_distance(state.embed, dets.embeds)
    if state.gallery.shape[1] > 1:
        # (S, K, E) x (D, E) -> (S, K, D)
        cos_g = 1.0 - jnp.einsum("ske,de->skd", state.gallery, dets.embeds)
        k = state.gallery.shape[1]
        k_valid = (
            jnp.arange(k)[None, :] < jnp.minimum(state.gallery_count, k)[:, None]
        )                                                        # (S, K)
        cos_g = jnp.where(k_valid[..., None], cos_g, 2.0)
        cos = jnp.minimum(cos, jnp.min(cos_g, axis=1))
    forbid = cos > cfg.appearance_gate
    forbid = jnp.logical_or(forbid, state.classes[:, None] != dets.classes[None, :])
    forbid = jnp.logical_or(forbid, jnp.logical_not(track_mask[:, None]))
    forbid = jnp.logical_or(forbid, jnp.logical_not(det_valid[None, :]))
    return cos, forbid
