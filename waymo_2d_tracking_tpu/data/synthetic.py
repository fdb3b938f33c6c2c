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
    # ---- hostile-regime knobs (round 4, VERDICT r3 item 6). The
    # constant-velocity / uniform-score default family left every opt-in
    # association knob (BYTE, buffered IoU, NSA, momentum) measuring as a
    # no-op; these add the regimes those knobs exist for.
    # Per-object acceleration, |a| <= accel px/frame^2: curved trajectories
    # the constant-velocity Kalman under-predicts (buffered IoU / NSA /
    # recovery-momentum regime).
    accel: float = 0.0
    # Sinusoidal camera pan: every box translates by pan_amplitude *
    # sin(2*pi*t/pan_period) px in x (half in y) — global motion the
    # per-object motion model cannot see coming at direction reversals.
    pan_amplitude: float = 0.0
    pan_period: float = 60.0
    # Occlusion-coupled degradation: an object whose GT box overlaps a
    # LARGER present box at IoU > occlusion_dip_iou is "partially occluded"
    # that frame — its detection score drops into dip_score_range, its box
    # noise triples, and its miss probability gains occlusion_miss_boost.
    # Score dips now CORRELATE with hard association frames (BYTE's regime,
    # and the score structure NSA's adaptive R assumes).
    occlusion_dip: bool = False
    occlusion_dip_iou: float = 0.25
    occlusion_miss_boost: float = 0.25
    # Birth/death storm: each object lives a random [frac_lo, frac_hi]
    # fraction of the clip at a random offset (default: whole clip).
    lifespan_frac: Tuple[float, float] = (1.0, 1.0)
    # Distance-coupled localization noise: per-object noise scales by
    # (160 / box side), clipped to [0.5x, 4x] — small (far) objects are
    # localized worse, like a real detector.
    distance_noise: bool = False
    # Ghost clutter (round 5, motion_gate's regime): with this per-object
    # per-frame probability, the object's TRUE detection is suppressed and
    # replaced by a high-score (0.85-0.95) ghost of the same class and size
    # offset by ghost_offset_frac * box_height in a random direction —
    # IoU-overlapping enough to match (IoU ~0.2-0.45) but dynamically
    # implausible (offset magnitude f*h reads d^2 = (f/0.0955)^2 on the
    # projected-innovation Mahalanobis statistic for a converged track:
    # 13.4-27.4 over the default range, all above the chi2-95% gate
    # 9.4877, while IoU stays 0.26-0.48). Ungated, the ghost drags the
    # track off its trajectory; the motion gate forbids the steal.
    ghost_prob: float = 0.0
    ghost_offset_frac: Tuple[float, float] = (0.35, 0.5)
    # Rendered-clip texture (round 5): per-object sinusoidal grating
    # amplitude for render_video_clip / draw_rect_objects. 0.0 = the
    # original solid rectangles (existing pixel goldens byte-identical).
    # >0 gives each object an identity-bearing appearance an instance-
    # normalized ReID embedding can actually represent — see
    # draw_rect_objects' docstring for the measured collapse that
    # motivated this.
    texture_amp: float = 0.0
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
    # trajectories: constant velocity + optional per-object acceleration
    ax = rng.uniform(-cfg.accel, cfg.accel, k) if cfg.accel else np.zeros(k)
    ay = rng.uniform(-cfg.accel, cfg.accel, k) if cfg.accel else np.zeros(k)
    tt = t_axis[:, None].astype(np.float64)
    cx = cx0[None, :] + vx[None, :] * tt + 0.5 * ax[None, :] * tt**2  # (T, K)
    cy = cy0[None, :] + vy[None, :] * tt + 0.5 * ay[None, :] * tt**2
    if cfg.pan_amplitude:
        pan = cfg.pan_amplitude * np.sin(
            2.0 * np.pi * t_axis / cfg.pan_period
        )
        cx = cx + pan[:, None]
        cy = cy + 0.5 * pan[:, None]
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
    lo, hi = cfg.lifespan_frac
    if hi < 1.0 or lo < 1.0:
        # birth/death storm: staggered random lifespans
        life = rng.uniform(lo, hi, k)
        start = rng.uniform(0, 1.0 - life, k)
        s_f = np.round(start * t_total).astype(int)
        e_f = np.round((start + life) * t_total).astype(int)
        alive = (t_axis[:, None] >= s_f[None, :]) & (
            t_axis[:, None] < e_f[None, :]
        )
        present &= alive

    # partial-occlusion mask: overlapped by a LARGER present box this frame
    occluded = np.zeros((t_total, k), bool)
    if cfg.occlusion_dip:
        areas = bw * bh                                         # (K,)
        for t in range(t_total):
            live = np.where(present[t])[0]
            for i in live:
                for j in live:
                    if j == i or areas[j] <= areas[i]:
                        continue
                    bi, bj = gt_boxes[t, i], gt_boxes[t, j]
                    ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
                    ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
                    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
                    union = areas[i] + areas[j] - inter
                    if union > 0 and inter / union > cfg.occlusion_dip_iou:
                        occluded[t, i] = True
                        break

    boxes = np.zeros((t_total, d, 4), np.float32)
    scores = np.zeros((t_total, d), np.float32)
    classes = np.zeros((t_total, d), np.int32)
    embeds = np.zeros((t_total, d, max(cfg.embed_dim, 1)), np.float32)
    valid = np.zeros((t_total, d), bool)

    for t in range(t_total):
        rows = []
        for obj in range(k):
            miss_p = cfg.miss_prob
            if occluded[t, obj]:
                miss_p = min(miss_p + cfg.occlusion_miss_boost, 0.95)
            if not present[t, obj] or rng.uniform() < miss_p:
                continue
            if cfg.ghost_prob > 0.0 and rng.uniform() < cfg.ghost_prob:
                # ghost clutter: suppress the true det, emit an offset twin
                # carrying the OBJECT'S OWN appearance (a reflection /
                # double-detection of the same object) — the appearance
                # gate cannot reject it; only the motion gate can
                frac = rng.uniform(*cfg.ghost_offset_frac)
                ang = rng.uniform(0, 2 * np.pi)
                off = frac * bh[obj] * np.array(
                    [np.cos(ang), np.sin(ang), np.cos(ang), np.sin(ang)]
                )
                e = emb_true[obj] + rng.normal(
                    0, cfg.embed_noise, emb_true.shape[1]
                )
                e /= np.linalg.norm(e)
                rows.append(
                    (gt_boxes[t, obj] + off, rng.uniform(0.85, 0.95),
                     obj % 3, e)
                )
                continue
            noise_px = cfg.det_noise_px
            if cfg.distance_noise:
                side = float(np.sqrt(bw[obj] * bh[obj]))
                noise_px *= float(np.clip(160.0 / max(side, 1.0), 0.5, 4.0))
            if occluded[t, obj]:
                noise_px *= 3.0
            noise = rng.normal(0, noise_px, 4)
            box = gt_boxes[t, obj] + noise
            e = emb_true[obj] + rng.normal(0, cfg.embed_noise, emb_true.shape[1])
            e /= np.linalg.norm(e)
            da, db = cfg.dip_window
            if (da <= t < db and obj < cfg.dip_objects) or occluded[t, obj]:
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


# Committed hostile-regime clips (VERDICT r3 item 6): the scripted regimes
# where the opt-in association knobs measurably win — shared by the knob
# sweep (tools/perf_hostile_knobs.py), the golden floors
# (tests/golden/test_hostile_quality.py), and `w2t tune`'s clip registry.
# Measured round 4 (BASELINE.md hostile-clip table): on occl_dips BYTE
# lifts MOTA 0.658->0.776 / IDF1 0.770->0.870; on curved_pan buffered IoU
# lifts IDF1 0.831->0.859 (IDSW 7->4) and byte+biou reaches 0.788/0.873.
HOSTILE_CLIPS = {
    "occl_dips": SyntheticClipConfig(
        num_frames=150, num_objects=36, image_size=(640, 960),
        det_noise_px=3.0, miss_prob=0.05, false_pos_per_frame=1.0,
        occlusion_dip=True, occlusion_gap=(0, 0), seed=23,
    ),
    "curved_pan": SyntheticClipConfig(
        num_frames=150, num_objects=24, image_size=(640, 960),
        det_noise_px=4.0, miss_prob=0.08, false_pos_per_frame=1.0,
        accel=0.35, pan_amplitude=90.0, pan_period=40.0,
        occlusion_dip=True, occlusion_gap=(0, 0), seed=29,
    ),
    "storm": SyntheticClipConfig(
        num_frames=150, num_objects=40, image_size=(640, 960),
        det_noise_px=3.0, miss_prob=0.08, false_pos_per_frame=1.5,
        lifespan_frac=(0.2, 0.7), distance_noise=True,
        occlusion_gap=(0, 0), seed=31,
    ),
    # motion_gate's regime (round 5): high-score ghost twins replace the
    # true detection ~12% of object-frames — IoU-matchable, dynamically
    # implausible. Measured (tools/perf_hostile_knobs.py): the gate is the
    # only knob that wins here, and it HURTS on curved_pan (IDSW 7 -> 62):
    # enable it for clutter-heavy feeds with a sound motion model, never
    # under unmodeled global motion.
    "ghost_clutter": SyntheticClipConfig(
        num_frames=150, num_objects=24, image_size=(640, 960),
        det_noise_px=3.0, miss_prob=0.05, false_pos_per_frame=0.5,
        ghost_prob=0.12, occlusion_gap=(0, 0), seed=37,
    ),
}


RENDER_COLORS = np.array(
    [[0.9, 0.2, 0.2], [0.2, 0.9, 0.2], [0.2, 0.2, 0.9]], np.float32
)


def draw_rect_objects(image, boxes, classes, brightness=None,
                      tex_theta=None, tex_lambda=None, tex_amp=0.0):
    """Draw class-colored rectangles onto a float image IN PLACE.

    image (H, W, 3) f32; boxes (N, 4) xyxy in image pixels (clipped here);
    classes (N,) ints into RENDER_COLORS; brightness (N,) optional
    per-object color scale. Later boxes draw on top (deterministic
    occlusion order). Shared by the trained-fixture batch generator and
    render_video_clip so the train and eval pixel distributions are one
    code path.

    Texture (round 5, the ReID-fixture finding): with ``tex_amp > 0`` each
    rectangle is modulated by an object-anchored sinusoidal grating of
    per-object orientation ``tex_theta`` (rad) and wavelength
    ``tex_lambda`` (px) — color * (1 + amp * sin). Solid rectangles are
    INFORMATIONLESS to an instance-normalized appearance embedding: the
    ReID tower's GroupNorm maps any spatially-constant RoI to the same
    output (measured: embeddings collapsed to cosine distances ~1e-4 at
    init and triplet training could not escape — the GN of a constant is
    epsilon noise with ~zero gradient). A grating carries identity in its
    orientation/frequency/phase structure, which survives instance
    normalization — like real-object texture does. The grating is anchored
    to the box corner, so it MOVES WITH the object across frames (the same
    object looks the same; that is what makes it a re-id signal).
    """
    h, w = image.shape[:2]
    for i in range(len(boxes)):
        x1, y1, x2, y2 = boxes[i]
        fx1, fy1 = float(boxes[i][0]), float(boxes[i][1])
        x1 = int(max(x1, 0)); y1 = int(max(y1, 0))
        x2 = int(min(x2, w)); y2 = int(min(y2, h))
        if x2 <= x1 or y2 <= y1:
            continue
        color = RENDER_COLORS[int(classes[i]) % len(RENDER_COLORS)]
        if brightness is not None:
            color = np.clip(color * float(brightness[i]), 0.0, 1.0)
        if tex_amp > 0.0 and tex_theta is not None:
            yy, xx = np.mgrid[y1:y2, x1:x2].astype(np.float32)
            # object-local coordinates: the pattern rides the box
            xx -= fx1
            yy -= fy1
            th = float(tex_theta[i])
            lam = max(float(tex_lambda[i]), 2.0)
            phase = 2.0 * np.pi * (xx * np.cos(th) + yy * np.sin(th)) / lam
            mod = 1.0 + tex_amp * np.sin(phase)
            image[y1:y2, x1:x2] = np.clip(
                color[None, None, :] * mod[:, :, None], 0.0, 1.0
            )
        else:
            image[y1:y2, x1:x2] = color
    return image


def render_video_clip(
    cfg: SyntheticClipConfig,
    render_hw: Tuple[int, int] = (256, 384),
    bg_mean: float = 0.45,
    bg_noise: float = 0.08,
):
    """Render a temporally-consistent RGB clip from scripted trajectories.

    The pixels-to-MOTA golden path: generate_clip provides the GT
    trajectories (at cfg.image_size), which are scaled to ``render_hw``
    and drawn as solid class-colored rectangles (class = id % 3, a
    deterministic per-object brightness so same-class objects differ) on a
    per-frame noise background. The scripted DETECTIONS are ignored — a
    trained detector supplies them from the pixels instead
    (tests/golden/test_pixels_to_mota.py).

    Returns (frames_u8 (T, H, W, 3), gt) where gt boxes are in RENDER
    pixels, clipped to the frame, and ``present`` additionally requires
    >= 40% of the box area inside the frame (a mostly-off-screen object
    is not detectable and must not count as a miss).
    """
    _, gt = generate_clip(cfg)
    t_total = gt["boxes"].shape[0]
    k = gt["boxes"].shape[1]
    hr, wr = render_hw
    hc, wc = cfg.image_size
    sxy = np.array([wr / wc, hr / hc, wr / wc, hr / hc], np.float32)
    boxes = gt["boxes"] * sxy                                   # (T, K, 4)

    rng = np.random.default_rng(cfg.seed + 7777)
    brightness = rng.uniform(0.75, 1.15, k)
    # texture params drawn ONLY when enabled: drawing them unconditionally
    # would advance this rng and change every committed golden clip's
    # background noise (the floors are measured on exact pixels)
    tex_theta = tex_lambda = None
    if cfg.texture_amp > 0.0:
        tex_theta = rng.uniform(0.0, np.pi, k)
        tex_lambda = rng.uniform(4.0, 12.0, k)

    clipped = boxes.copy()
    clipped[..., 0::2] = np.clip(clipped[..., 0::2], 0, wr)
    clipped[..., 1::2] = np.clip(clipped[..., 1::2], 0, hr)
    area = np.maximum(boxes[..., 2] - boxes[..., 0], 0) * np.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )
    area_in = np.maximum(clipped[..., 2] - clipped[..., 0], 0) * np.maximum(
        clipped[..., 3] - clipped[..., 1], 0
    )
    visible = area_in >= 0.4 * np.maximum(area, 1e-6)
    present = gt["present"] & visible

    frames = np.empty((t_total, hr, wr, 3), np.uint8)
    for t in range(t_total):
        img = rng.normal(bg_mean, bg_noise, (hr, wr, 3)).astype(np.float32)
        live = np.where(present[t])[0]
        draw_rect_objects(
            img, clipped[t, live], gt["classes"][live], brightness[live],
            tex_theta=None if tex_theta is None else tex_theta[live],
            tex_lambda=None if tex_lambda is None else tex_lambda[live],
            tex_amp=cfg.texture_amp,
        )
        frames[t] = (np.clip(img, 0, 1) * 255).astype(np.uint8)

    gt_render = {
        "boxes": clipped.astype(np.float32),
        "present": present,
        "ids": gt["ids"],
        "classes": gt["classes"],
    }
    return frames, gt_render


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
