"""Track lifecycle: masked birth / death / confirmation (component C16).

The reference manages tracks as a Python list of objects appended/removed per
frame (SURVEY.md §1.1 L3); that is unjittable. Here the track table is a
fixed-capacity slot array and every lifecycle event is a masked vectorized
update, so the whole thing lives inside the jitted ``track_step``:

- birth: unmatched high-score detections claim EMPTY slots in detection order
  (detections arrive score-sorted from NMS, so slot pressure drops the lowest
  scores — deterministic eviction, SURVEY.md §7 hard-parts).
- confirmation: TENTATIVE -> CONFIRMED after ``n_init`` hits.
- miss: TENTATIVE dies on its first miss; CONFIRMED survives ``max_age``
  misses, then becomes LOST (kept for re-ID recovery) or EMPTY.
- LOST tracks die after ``max_lost_age`` further frames.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.tracker import kalman
from waymo_2d_tracking_tpu.types import (
    SLOT_CONFIRMED,
    SLOT_EMPTY,
    SLOT_LOST,
    SLOT_TENTATIVE,
    Detections,
    TrackerState,
    boxes_xyxy_to_cxcywh,
)


def apply_matches(
    state: TrackerState,
    dets: Detections,
    row_to_col: jnp.ndarray,
    recovered: jnp.ndarray,
    cfg: TrackerConfig,
    embed_update: jnp.ndarray | None = None,
) -> TrackerState:
    """Kalman-update matched slots and advance their lifecycle counters.

    row_to_col: (S,) det index matched to each slot, -1 if unmatched.
    recovered:  (S,) bool — slot was LOST and re-identified this frame
                (stage-2); its motion state re-initializes at the detection
                instead of a Kalman update against a stale prediction.
    embed_update: optional (S,) bool — slots allowed to EMA/gallery-update
                their appearance this frame. None means all matched slots;
                the BYTE pass masks out low-score matches (their embeddings
                are unreliable).
    """
    matched = row_to_col >= 0
    emb_ok = matched if embed_update is None else jnp.logical_and(
        matched, embed_update
    )
    det_idx = jnp.clip(row_to_col, 0, dets.max_detections - 1)
    meas = boxes_xyxy_to_cxcywh(dets.boxes[det_idx])        # (S, 4)

    up_mean, up_cov = kalman.update(
        state.mean, state.cov, meas, cfg.kalman, score=dets.scores[det_idx]
    )
    re_mean, re_cov = kalman.init_track(meas, cfg.kalman)
    if cfg.recovery_momentum:
        # Observation-centric momentum (OC-SORT-style, arXiv:2203.14360
        # ORU/OCM idea): a LOST track's motion state is frozen at its last
        # posterior (track_step skips predict for LOST), so at recovery the
        # velocity across the occlusion is directly observable:
        #   v = (recovery_box - last_box) / gap_frames,
        # gap = time_since_update + 1 (tsu counts the missed frames; the
        # displacement spans one more interval). Without this the re-init
        # starts at zero velocity and a fast mover un-overlaps its own
        # prediction within a frame or two of recovering, re-fragmenting.
        gap = (state.time_since_update + 1).astype(meas.dtype)
        vel = (meas - state.mean[..., :4]) / gap[:, None]
        re_mean = jnp.concatenate([meas, vel], axis=-1)
    new_mean = jnp.where(recovered[:, None], re_mean, up_mean)
    new_cov = jnp.where(recovered[:, None, None], re_cov, up_cov)

    mean = jnp.where(matched[:, None], new_mean, state.mean)
    cov = jnp.where(matched[:, None, None], new_cov, state.cov)

    hits = jnp.where(matched, state.hits + 1, state.hits)
    tsu = jnp.where(matched, 0, state.time_since_update)
    score = jnp.where(matched, dets.scores[det_idx], state.score)

    if cfg.embed_dim > 0:
        det_e = dets.embeds[det_idx]
        ema = cfg.embed_ema * state.embed + (1.0 - cfg.embed_ema) * det_e
        norm = jnp.maximum(jnp.linalg.norm(ema, axis=-1, keepdims=True), 1e-8)
        embed = jnp.where(emb_ok[:, None], ema / norm, state.embed)
        # gallery ring write: matched slots record the raw detection embed
        k = state.gallery.shape[1]
        slot_pos = jnp.mod(state.gallery_count, k)                  # (S,)
        onehot = jax.nn.one_hot(slot_pos, k, dtype=state.gallery.dtype)  # (S, K)
        write = onehot * emb_ok[:, None]                            # (S, K)
        gallery = (
            state.gallery * (1.0 - write[..., None])
            + write[..., None] * det_e[:, None, :]
        )
        gallery_count = jnp.where(emb_ok, state.gallery_count + 1,
                                  state.gallery_count)
    else:
        embed = state.embed
        gallery = state.gallery
        gallery_count = state.gallery_count

    # Matched TENTATIVE confirms at n_init hits; matched LOST re-confirms.
    status = state.status
    confirm = jnp.logical_and(
        matched,
        jnp.logical_or(
            jnp.logical_and(status == SLOT_TENTATIVE, hits >= cfg.n_init),
            status == SLOT_LOST,
        ),
    )
    status = jnp.where(confirm, SLOT_CONFIRMED, status).astype(jnp.int8)

    return state.replace(
        mean=mean, cov=cov, hits=hits, time_since_update=tsu,
        score=score, embed=embed, status=status,
        gallery=gallery, gallery_count=gallery_count,
    )


def apply_misses(state: TrackerState, was_matched: jnp.ndarray, cfg: TrackerConfig) -> TrackerState:
    """Age unmatched slots and apply death transitions."""
    live = state.status != SLOT_EMPTY
    missed = jnp.logical_and(live, jnp.logical_not(was_matched))
    tsu = jnp.where(missed, state.time_since_update + 1, state.time_since_update)
    age = jnp.where(live, state.age + 1, state.age)

    status = state.status
    # Tentative tracks die on their first miss.
    status = jnp.where(
        jnp.logical_and(missed, status == SLOT_TENTATIVE), SLOT_EMPTY, status
    )
    # Confirmed tracks exceeding max_age become LOST (re-ID on) or die.
    expired = jnp.logical_and(status == SLOT_CONFIRMED, tsu > cfg.max_age)
    status = jnp.where(
        expired, SLOT_LOST if cfg.reid_recovery else SLOT_EMPTY, status
    )
    # Lost tracks die after max_lost_age.
    status = jnp.where(
        jnp.logical_and(status == SLOT_LOST, tsu > cfg.max_age + cfg.max_lost_age),
        SLOT_EMPTY,
        status,
    ).astype(jnp.int8)

    track_id = jnp.where(status == SLOT_EMPTY, -1, state.track_id)
    return state.replace(status=status, time_since_update=tsu, age=age, track_id=track_id)


def apply_births(
    state: TrackerState,
    dets: Detections,
    det_unmatched: jnp.ndarray,
    cfg: TrackerConfig,
) -> TrackerState:
    """Birth unmatched high-score detections into EMPTY slots.

    Deterministic: the k-th birthing detection (in detection order) claims the
    k-th empty slot (in slot order); surplus births are dropped.
    """
    d = dets.max_detections
    s = state.max_tracks

    is_birth = jnp.logical_and(
        jnp.logical_and(dets.valid, det_unmatched),
        dets.scores >= cfg.birth_score_threshold,
    )                                                           # (D,)
    empty = state.status == SLOT_EMPTY                          # (S,)

    birth_rank = jnp.cumsum(is_birth.astype(jnp.int32)) - 1     # (D,) rank among births
    empty_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1        # (S,)
    n_births = jnp.sum(is_birth.astype(jnp.int32))
    n_empty = jnp.sum(empty.astype(jnp.int32))
    n_placed = jnp.minimum(n_births, n_empty)

    # det index of the birth with rank r (scatter by rank; out-of-range drops).
    det_by_rank = jnp.full((d,), -1, dtype=jnp.int32).at[
        jnp.where(is_birth, birth_rank, d)
    ].set(jnp.arange(d, dtype=jnp.int32), mode="drop")

    slot_det = det_by_rank[jnp.clip(empty_rank, 0, d - 1)]      # (S,)
    place = jnp.logical_and(jnp.logical_and(empty, empty_rank < n_placed), slot_det >= 0)
    det_idx = jnp.clip(slot_det, 0, d - 1)

    meas = boxes_xyxy_to_cxcywh(dets.boxes[det_idx])
    new_mean, new_cov = kalman.init_track(meas, cfg.kalman)

    mean = jnp.where(place[:, None], new_mean, state.mean)
    cov = jnp.where(place[:, None, None], new_cov, state.cov)
    track_id = jnp.where(place, state.next_id + empty_rank, state.track_id)
    status = jnp.where(place, SLOT_TENTATIVE, state.status).astype(jnp.int8)
    hits = jnp.where(place, 1, state.hits)
    tsu = jnp.where(place, 0, state.time_since_update)
    age = jnp.where(place, 0, state.age)
    classes = jnp.where(place, dets.classes[det_idx], state.classes)
    score = jnp.where(place, dets.scores[det_idx], state.score)
    if cfg.embed_dim > 0:
        embed = jnp.where(place[:, None], dets.embeds[det_idx], state.embed)
        fresh = jnp.zeros_like(state.gallery).at[:, 0, :].set(dets.embeds[det_idx])
        gallery = jnp.where(place[:, None, None], fresh, state.gallery)
        gallery_count = jnp.where(place, 1, state.gallery_count)
    else:
        embed = state.embed
        gallery = state.gallery
        gallery_count = state.gallery_count

    return state.replace(
        mean=mean, cov=cov, track_id=track_id, status=status, hits=hits,
        time_since_update=tsu, age=age, classes=classes, score=score,
        embed=embed, gallery=gallery, gallery_count=gallery_count,
        next_id=state.next_id + n_placed,
    )
