"""Deterministic synthetic detection clips (SURVEY.md §4 golden/parity tests).

Generates a scripted multi-object clip — constant-velocity objects with
detection noise, crossings, occlusion gaps, missed/false detections — as a
time-stacked Detections pytree plus ground-truth object ids. This is the
fake-backend stand-in for the Waymo front-camera clip of BASELINE.json
config 1, letting every tracker/pipeline/eval test (and the tracker bench)
run without Waymo data or detector weights.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.types import Detections


@dataclasses.dataclass(frozen=True)
class SyntheticClipConfig:
    num_frames: int = 200
    num_objects: int = 12
    image_size: Tuple[int, int] = (1280, 1920)  # (H, W): Waymo front cam
    max_detections: int = 64
    embed_dim: int = 128
    det_noise_px: float = 2.0       # box center/size jitter
    miss_prob: float = 0.05         # random per-frame missed detection
    false_pos_per_frame: float = 0.5
    occlusion_gap: Tuple[int, int] = (60, 90)   # frames [a, b): objects 0,1 hidden
    embed_noise: float = 0.05
    # Score-dip window: during frames [a, b) the first ``dip_objects`` objects
    # are still detected but with a low score drawn from ``dip_score_range``
    # — the partial-occlusion regime the BYTE second association targets.
    # (0, 0) disables.
    dip_window: Tuple[int, int] = (0, 0)
    dip_objects: int = 2
    dip_score_range: Tuple[float, float] = (0.15, 0.4)
    seed: int = 0


def generate_clip(cfg: SyntheticClipConfig = SyntheticClipConfig()):
    """Returns (dets: Detections stacked (T, D, ...), gt: dict of numpy arrays).

    gt arrays: boxes (T, K, 4), present (T, K) bool, ids (K,) — the clean
    ground truth before noise/misses, for MOTA evaluation oracles.
    """
    rng = np.random.default_rng(cfg.seed)
    t_total, k, d = cfg.num_frames, cfg.num_objects, cfg.max_detections
    h_img, w_img = cfg.image_size

    # Scripted trajectories: spawn at random edges, constant velocity.
    cx0 = rng.uniform(0.1 * w_img, 0.9 * w_img, k)
    cy0 = rng.uniform(0.1 * h_img, 0.9 * h_img, k)
    # velocities chosen so some pairs cross mid-clip
    vx = rng.uniform(-6, 6, k)
    vy = rng.uniform(-3, 3, k)
    bw = rng.uniform(60, 180, k)
    bh = rng.uniform(60, 180, k)
    # canonical appearance embedding per object
    emb_true = rng.normal(0, 1, (k, max(cfg.embed_dim, 1)))
    emb_true /= np.linalg.norm(emb_true, axis=1, keepdims=True)

    t_axis = np.arange(t_total)
    cx = cx0[None, :] + vx[None, :] * t_axis[:, None]          # (T, K)
    cy = cy0[None, :] + vy[None, :] * t_axis[:, None]
    gt_boxes = np.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )                                                           # (T, K, 4)

    in_frame = (
        (cx > -bw) & (cx < w_img + bw) & (cy > -bh) & (cy < h_img + bh)
    )
    present = in_frame.copy()
    a, b = cfg.occlusion_gap
    if k >= 2 and b > a:
        present[a:b, 0] = False
        present[a:b, 1] = False

    boxes = np.zeros((t_total, d, 4), np.float32)
    scores = np.zeros((t_total, d), np.float32)
    classes = np.zeros((t_total, d), np.int32)
    embeds = np.zeros((t_total, d, max(cfg.embed_dim, 1)), np.float32)
    valid = np.zeros((t_total, d), bool)

    for t in range(t_total):
        rows = []
        for obj in range(k):
            if not present[t, obj] or rng.uniform() < cfg.miss_prob:
                continue
            noise = rng.normal(0, cfg.det_noise_px, 4)
            box = gt_boxes[t, obj] + noise
            e = emb_true[obj] + rng.normal(0, cfg.embed_noise, emb_true.shape[1])
            e /= np.linalg.norm(e)
            da, db = cfg.dip_window
            if da <= t < db and obj < cfg.dip_objects:
                score = rng.uniform(*cfg.dip_score_range)
            else:
                score = rng.uniform(0.8, 1.0)
            rows.append((box, score, obj % 3, e))
        # false positives: small random boxes with low-ish score
        n_fp = rng.poisson(cfg.false_pos_per_frame)
        for _ in range(n_fp):
            x = rng.uniform(0, w_img - 80)
            y = rng.uniform(0, h_img - 80)
            e = rng.normal(0, 1, emb_true.shape[1])
            e /= np.linalg.norm(e)
            rows.append(
                (np.array([x, y, x + 80, y + 80]), rng.uniform(0.5, 0.7), 0, e)
            )
        # score-sorted, like NMS output
        rows.sort(key=lambda r: -r[1])
        for i, (box, sc, cl, e) in enumerate(rows[:d]):
            boxes[t, i] = box
            scores[t, i] = sc
            classes[t, i] = cl
            embeds[t, i] = e
            valid[t, i] = True

    dets = Detections(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(scores),
        classes=jnp.asarray(classes),
        embeds=jnp.asarray(embeds),
        valid=jnp.asarray(valid),
    )
    gt = {
        "boxes": gt_boxes.astype(np.float32),
        "present": present,
        "ids": np.arange(k, dtype=np.int32),
        "classes": (np.arange(k) % 3).astype(np.int32),
    }
    return dets, gt


def render_detection_batch(
    rng: np.random.Generator,
    batch_size: int,
    image_hw: Tuple[int, int],
    max_gt: int = 8,
    num_classes: int = 3,
):
    """Synthetic detector-training batch: images with solid colored
    rectangles on noise, plus padded GT (for overfit/training tests —
    the 'COCO-converted Waymo' stand-in when no real data is mounted).

    Returns dict(images (N,H,W,3) f32, gt_boxes (N,G,4), gt_classes (N,G),
    gt_valid (N,G)).
    """
    h, w = image_hw
    images = rng.normal(0.45, 0.08, (batch_size, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch_size, max_gt), np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)
    colors = np.array([[0.9, 0.2, 0.2], [0.2, 0.9, 0.2], [0.2, 0.2, 0.9]])
    for n in range(batch_size):
        for g in range(rng.integers(1, max_gt + 1)):
            bw = rng.uniform(0.1 * w, 0.4 * w)
            bh = rng.uniform(0.1 * h, 0.4 * h)
            x1 = rng.uniform(0, w - bw)
            y1 = rng.uniform(0, h - bh)
            cls = int(rng.integers(0, num_classes))
            images[n, int(y1): int(y1 + bh), int(x1): int(x1 + bw)] = colors[cls]
            gt_boxes[n, g] = [x1, y1, x1 + bw, y1 + bh]
            gt_classes[n, g] = cls
            gt_valid[n, g] = True
    return {
        "images": jnp.asarray(images),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }


def scripted_detections(frames):
    """Hand-written per-frame detection lists -> stacked Detections.

    frames: list of lists of (box4, score, cls) tuples; embeds are zeros.
    For lifecycle scenario-table tests.
    """
    d = max(max((len(f) for f in frames), default=1), 1)
    t_total = len(frames)
    boxes = np.zeros((t_total, d, 4), np.float32)
    scores = np.zeros((t_total, d), np.float32)
    classes = np.zeros((t_total, d), np.int32)
    valid = np.zeros((t_total, d), bool)
    for t, frame in enumerate(frames):
        for i, (box, sc, cl) in enumerate(frame):
            boxes[t, i] = box
            scores[t, i] = sc
            classes[t, i] = cl
            valid[t, i] = True
    return Detections(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(scores),
        classes=jnp.asarray(classes),
        embeds=jnp.zeros((t_total, d, 1), jnp.float32),
        valid=jnp.asarray(valid),
    )
