"""Tracker top level: ``track_step`` and segment-level ``lax.scan`` (component C17).

One fully-jitted function advances the fixed-capacity track table by one
frame: Kalman predict (vectorized) -> fused cost -> auction assignment ->
masked lifecycle. ``track_segment`` scans it over a whole clip so the host
touches the device once per segment (or chunk), not once per frame — the
core inversion of the reference's per-frame host loop (SURVEY.md §3.1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.ops.assign import auction_assign, greedy_assign
from waymo_2d_tracking_tpu.ops.iou import pairwise_iou
from waymo_2d_tracking_tpu.tracker import cost as cost_mod
from waymo_2d_tracking_tpu.tracker import kalman, lifecycle
from waymo_2d_tracking_tpu.types import (
    SLOT_CONFIRMED,
    SLOT_EMPTY,
    SLOT_LOST,
    SLOT_TENTATIVE,
    Detections,
    TrackOutputs,
    TrackerState,
    boxes_cxcywh_to_xyxy,
)


def init_state(cfg: TrackerConfig, dtype=jnp.float32) -> TrackerState:
    """Fresh empty track table."""
    s, e = cfg.max_tracks, max(cfg.embed_dim, 1)
    k = max(cfg.gallery_size, 1)
    return TrackerState(
        mean=jnp.zeros((s, kalman.STATE_DIM), dtype),
        cov=jnp.tile(jnp.eye(kalman.STATE_DIM, dtype=dtype), (s, 1, 1)),
        track_id=jnp.full((s,), -1, jnp.int32),
        status=jnp.full((s,), SLOT_EMPTY, jnp.int8),
        hits=jnp.zeros((s,), jnp.int32),
        time_since_update=jnp.zeros((s,), jnp.int32),
        age=jnp.zeros((s,), jnp.int32),
        classes=jnp.zeros((s,), jnp.int32),
        score=jnp.zeros((s,), dtype),
        embed=jnp.zeros((s, e), dtype),
        gallery=jnp.zeros((s, k, e), dtype),
        gallery_count=jnp.zeros((s,), jnp.int32),
        next_id=jnp.int32(0),
        frame_idx=jnp.int32(0),
    )


def _assign(cost, forbid, row_mask, col_mask, cfg: TrackerConfig):
    if cfg.assignment == "greedy":
        return greedy_assign(cost, row_mask=row_mask, col_mask=col_mask,
                             forbid=forbid)
    return auction_assign(
        cost,
        row_mask=row_mask,
        col_mask=col_mask,
        forbid=forbid,
        eps_scale=cfg.auction_eps_scale,
        eps_min=cfg.auction_eps_min,
        max_iters=cfg.auction_max_iters,
    )


def track_step(
    state: TrackerState, dets: Detections, cfg: TrackerConfig
) -> Tuple[TrackerState, TrackOutputs]:
    """Advance the tracker by one frame. Fully jittable / scannable."""
    det_valid = jnp.logical_and(dets.valid, dets.scores >= cfg.score_threshold)

    # 1. Kalman predict for active (tentative/confirmed) tracks. LOST tracks
    # keep a frozen motion state — only appearance can recover them.
    active = jnp.logical_or(
        state.status == SLOT_TENTATIVE, state.status == SLOT_CONFIRMED
    )
    mean_p, cov_p = kalman.predict(state.mean, state.cov, cfg.kalman)
    state = state.replace(
        mean=jnp.where(active[:, None], mean_p, state.mean),
        cov=jnp.where(active[:, None, None], cov_p, state.cov),
    )

    # 2. Stage-1 association: active tracks x detections (IoU + appearance).
    # A fully-fused Pallas cost+gate+auction kernel was built and measured
    # slower than this two-call form (683 vs 645 µs/frame; DESIGN.md
    # "Closed roadmap items" #3) — removed in round 4, recoverable from git
    # history (ops/fused_assoc.py).
    c1, f1 = cost_mod.stage1_cost(state, dets, det_valid, active, cfg)
    row_to_col, col_to_row = _assign(c1, f1, active, det_valid, cfg)

    embed_update = None
    if cfg.byte_low_threshold > 0.0:
        # 2b. BYTE second association (ByteTrack): low-score detections vs
        # CONFIRMED tracks stage-1 left unmatched, IoU-only. Low matches
        # sustain the track (Kalman update, lifecycle hit) but do not update
        # appearance, and — because they stay below birth_score_threshold —
        # never birth new tracks.
        det_low = jnp.logical_and(
            dets.valid,
            jnp.logical_and(
                dets.scores >= cfg.byte_low_threshold,
                dets.scores < cfg.score_threshold,
            ),
        )
        trk_free = jnp.logical_and(
            state.status == SLOT_CONFIRMED, row_to_col < 0
        )
        cb, fb = cost_mod.byte_cost(state, dets, det_low, trk_free, cfg)
        rtcb, ctrb = _assign(cb, fb, trk_free, det_low, cfg)
        low_matched = rtcb >= 0
        row_to_col = jnp.where(low_matched, rtcb, row_to_col)
        col_to_row = jnp.maximum(col_to_row, ctrb)
        embed_update = jnp.logical_not(low_matched)

    recovered = jnp.zeros((cfg.max_tracks,), dtype=bool)
    if cfg.reid_recovery and cfg.embed_dim > 0:
        # 3. Stage-2: LOST tracks x still-unmatched detections, appearance only.
        lost = state.status == SLOT_LOST
        det_free = jnp.logical_and(det_valid, col_to_row < 0)
        c2, f2 = cost_mod.stage2_cost(state, dets, det_free, lost, cfg)
        rtc2, ctr2 = _assign(c2, f2, lost, det_free, cfg)
        recovered = rtc2 >= 0
        row_to_col = jnp.where(recovered, rtc2, row_to_col)
        col_to_row = jnp.maximum(col_to_row, ctr2)

    # 4. Lifecycle: update matched, age/kill missed, birth leftovers.
    state = lifecycle.apply_matches(
        state, dets, row_to_col, recovered, cfg, embed_update=embed_update
    )
    state = lifecycle.apply_misses(state, row_to_col >= 0, cfg)
    birth_ok = col_to_row < 0
    if cfg.birth_iou_threshold < 1.0:
        # Duplicate-birth suppression: a detection that heavily overlaps a
        # live track is a duplicate the detector's NMS kept (pair IoU under
        # nms_iou_threshold) — birthing it spawns a twin track that later
        # steals the identity (FP + ID switch). Gate births on max IoU vs
        # live slots AFTER this frame's matches/misses, so the comparison is
        # against each track's updated box. SAME-CLASS slots only: the NMS
        # this knob mops up after is per-class (detector.py class-offset
        # trick), so a cross-class overlap is a genuinely new object (e.g.
        # a cyclist emerging over a tracked vehicle), not a duplicate —
        # suppressing it would be a persistent false negative (review r4).
        live = jnp.logical_or(
            state.status == SLOT_TENTATIVE, state.status == SLOT_CONFIRMED
        )
        same_class = dets.classes[:, None] == state.classes[None, :]
        trk_boxes = boxes_cxcywh_to_xyxy(state.mean[:, :4])
        overlap = pairwise_iou(dets.boxes, trk_boxes)            # (D, S)
        max_iou = jnp.max(
            jnp.where(jnp.logical_and(live[None, :], same_class),
                      overlap, 0.0),
            axis=1,
        )
        birth_ok = jnp.logical_and(
            birth_ok, max_iou < cfg.birth_iou_threshold
        )
    state = lifecycle.apply_births(state, dets, birth_ok, cfg)
    state = state.replace(frame_idx=state.frame_idx + 1)

    # 5. Emit: confirmed tracks matched this frame; during the first n_init
    # frames tentative tracks are emitted too (SORT's warm-up rule, so output
    # starts at frame 1 instead of frame n_init).
    emit = jnp.logical_and(state.time_since_update == 0, state.status == SLOT_CONFIRMED)
    warmup = jnp.logical_and(
        state.status == SLOT_TENTATIVE, state.frame_idx <= cfg.n_init
    )
    emit = jnp.logical_or(emit, jnp.logical_and(warmup, state.time_since_update == 0))

    outputs = TrackOutputs(
        track_id=jnp.where(emit, state.track_id, -1),
        boxes=boxes_cxcywh_to_xyxy(state.mean[:, :4]),
        scores=state.score,
        classes=state.classes,
        valid=emit,
    )
    return state, outputs


def track_segment(
    state: TrackerState, det_seq: Detections, cfg: TrackerConfig
) -> Tuple[TrackerState, TrackOutputs]:
    """Scan ``track_step`` over a time-major stacked Detections pytree.

    det_seq fields have a leading time axis (T, ...). Returns the final state
    and time-stacked TrackOutputs (T, S, ...). O(1) memory in T via lax.scan.
    """

    def step(carry, dets):
        return track_step(carry, dets, cfg)

    return jax.lax.scan(step, state, det_seq)


class Tracker:
    """Convenience OO wrapper holding config + jitted step/segment functions."""

    def __init__(self, cfg: Optional[TrackerConfig] = None):
        self.cfg = cfg or TrackerConfig()
        self._step = jax.jit(lambda s, d: track_step(s, d, self.cfg))
        self._segment = jax.jit(lambda s, d: track_segment(s, d, self.cfg))

    def init(self) -> TrackerState:
        return init_state(self.cfg)

    def step(self, state: TrackerState, dets: Detections):
        return self._step(state, dets)

    def run(self, det_seq: Detections, state: Optional[TrackerState] = None):
        if state is None:
            state = self.init()
        return self._segment(state, det_seq)
