"""Core pytree types shared across the framework.

Everything that crosses a ``jit`` boundary is a fixed-shape pytree: detections
are padded to ``max_detections`` with a validity mask, and the tracker state is
a fixed-capacity slot table (SURVEY.md §2 C16 — "fixed-capacity slot table,
masked, functional").

Boxes are ``[x1, y1, x2, y2]`` in pixel coordinates throughout, matching the
Waymo 2D-label convention (center/size converted at the edges only).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Track slot states (int8 codes in TrackerState.status).
SLOT_EMPTY = 0      # free slot
SLOT_TENTATIVE = 1  # born, not yet confirmed (hits < n_init)
SLOT_CONFIRMED = 2  # confirmed, actively tracked
SLOT_LOST = 3       # missed > max_age as confirmed; kept for re-ID recovery


@struct.dataclass
class Detections:
    """Fixed-size per-frame detections (padded; ``valid`` masks real entries).

    Shapes (D = max detections per frame, E = embedding dim):
      boxes  (D, 4) f32 [x1,y1,x2,y2]
      scores (D,)   f32
      classes(D,)   i32
      embeds (D, E) f32 L2-normalized appearance embeddings (zeros if no ReID)
      valid  (D,)   bool
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    embeds: jnp.ndarray
    valid: jnp.ndarray

    @property
    def max_detections(self) -> int:
        return self.boxes.shape[-2]


@struct.dataclass
class TrackerState:
    """Fixed-capacity functional track table (S slots, E embed dim).

    Scan-carry budget (SURVEY.md §7 hard-parts): at the default S=64, E=128,
    K=1 the carried pytree is ~57 KB (cov 16 KB + embed/gallery 32+32 KB
    dominate) — three orders below HBM spill territory, and small enough
    that donating it (pipeline chunk step) makes the per-chunk update
    allocation-free. S=128 with K=4 is still < 400 KB.

    Kalman state per slot is 8-dim constant-velocity on [cx, cy, w, h]:
      mean (S, 8)    f32 [cx, cy, w, h, vcx, vcy, vw, vh]
      cov  (S, 8, 8) f32
    Lifecycle / identity:
      track_id          (S,) i32  global id, -1 for empty slots
      status            (S,) i8   SLOT_* codes
      hits              (S,) i32  total matched updates
      time_since_update (S,) i32  frames since last matched update
      age               (S,) i32  frames since birth
      classes           (S,) i32  class of the track (from birth detection)
      score             (S,) f32  EMA of matched detection scores
      embed             (S, E) f32 EMA appearance embedding (L2-normalized)
      gallery           (S, K, E) f32 ring buffer of recent raw appearance
                        embeddings (K = gallery_size; stage-2 re-ID recovery
                        scores against all of them, not just the EMA)
      gallery_count     (S,) i32  embeddings ever written to the ring
    Scalars:
      next_id   () i32  next global track id to assign
      frame_idx () i32  frames processed
    """

    mean: jnp.ndarray
    cov: jnp.ndarray
    track_id: jnp.ndarray
    status: jnp.ndarray
    hits: jnp.ndarray
    time_since_update: jnp.ndarray
    age: jnp.ndarray
    classes: jnp.ndarray
    score: jnp.ndarray
    embed: jnp.ndarray
    gallery: jnp.ndarray
    gallery_count: jnp.ndarray
    next_id: jnp.ndarray
    frame_idx: jnp.ndarray

    @property
    def max_tracks(self) -> int:
        return self.mean.shape[-2]


@struct.dataclass
class TrackOutputs:
    """Per-frame tracker emissions, fixed shape (S slots).

    Only ``valid`` slots are real, reported tracks (confirmed & matched
    this frame, per SORT's reporting rule).
    """

    track_id: jnp.ndarray  # (S,)  i32
    boxes: jnp.ndarray     # (S,4) f32 [x1,y1,x2,y2]
    scores: jnp.ndarray    # (S,)  f32
    classes: jnp.ndarray   # (S,)  i32
    valid: jnp.ndarray     # (S,)  bool


def boxes_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[x1,y1,x2,y2] -> [cx,cy,w,h] (last-dim 4)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def boxes_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[cx,cy,w,h] -> [x1,y1,x2,y2] (last-dim 4)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)
