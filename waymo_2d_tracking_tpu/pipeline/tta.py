"""Test-time augmentation (component C19): multi-scale + horizontal flip.

BASELINE config 5 requires "multi-scale/TTA detection". Design: every view
(scale s, flip f) of an image goes through the same jitted forward; each
view's per-level top-k candidates are mapped back to original-image
coordinates (unflip, unscale) and concatenated; ONE class-aware NMS merges
the union — the standard box-union TTA (no weighted box fusion; NMS keeps
the best-scoring view of each object). Everything stays fixed-shape: V views
x C candidates -> (V*C) candidate set.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.detector import (
    Detector,
    gather_candidates,
    select_detections,
)


def flip_image(images: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip, NHWC."""
    return images[:, :, ::-1, :]


def unflip_boxes(boxes: jnp.ndarray, width: float) -> jnp.ndarray:
    """Map xyxy boxes detected on a flipped image back to original coords."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([width - x2, y1, width - x1, y2], axis=-1)


def scale_image(images: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Bilinear resize by `scale` (separable matmul; same family as
    data/preprocess). Output size rounded to multiples of 128 strides is the
    caller's concern; here plain rounding."""
    from waymo_2d_tracking_tpu.data.preprocess import _resize_matrix

    n, h, w, c = images.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ry = _resize_matrix(h, nh, scale)
    rx = _resize_matrix(w, nw, scale)
    x = jnp.einsum("eh,nhwc->newc", ry, images)
    return jnp.einsum("fw,newc->nefc", rx, x)


def detect_tta_batch(
    module: Detector,
    params,
    images: jnp.ndarray,           # (N, H, W, 3)
    cfg: DetectorConfig,
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    interpret: bool | None = None,
):
    """TTA detection for a batch -> tracker-ready Detections (N, D, ...).

    ReID embeddings (when enabled) pool from the unflipped 1.0-scale pyramid
    using the final merged boxes — augmentation affects candidate generation,
    not the appearance features.
    """
    from waymo_2d_tracking_tpu.ops.roi_align import roi_align
    from waymo_2d_tracking_tpu.types import Detections

    n = images.shape[0]
    # base forward (also provides the ReID feature pyramid)
    _, p_feats = module.apply(params, images)
    lvl0 = min(cfg.fpn_levels)

    per_image = []
    for i in range(n):
        boxes, scores, classes, valid = detect_tta_single(
            module, params, images[i], cfg, scales=scales, flip=flip,
            interpret=interpret,
        )
        if cfg.embed_dim > 0:
            pooled = roi_align(
                p_feats[lvl0][i], boxes, spatial_scale=1.0 / (2 ** lvl0),
                output_size=7,
            )
            embeds = module.apply(params, pooled, method=Detector.embed)
            embeds = embeds * valid[:, None]
        else:
            embeds = jnp.zeros((boxes.shape[0], 1), jnp.float32)
        per_image.append(Detections(
            boxes=boxes, scores=scores, classes=classes,
            embeds=embeds, valid=valid,
        ))
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_image)


def detect_tta_single(
    module: Detector,
    params,
    image: jnp.ndarray,            # (H, W, 3) one image
    cfg: DetectorConfig,
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    interpret: bool | None = None,
):
    """TTA detection for one image -> (boxes (D,4), scores, classes, valid).

    Note: each distinct scale triggers its own jit specialization of the
    forward (static shapes) — use a small scale set.
    """
    h, w = image.shape[:2]
    views: List[Tuple[jnp.ndarray, bool, float]] = []
    for s in scales:
        img_s = scale_image(image[None], s)[0] if s != 1.0 else image
        views.append((img_s, False, s))
        if flip:
            views.append((flip_image(img_s[None])[0], True, s))

    all_boxes, all_scores, all_classes = [], [], []
    for img_v, flipped, s in views:
        head_out, _ = module.apply(params, img_v[None])
        per_img = {
            lvl: tuple(t[0] for t in head_out[lvl]) for lvl in cfg.fpn_levels
        }
        boxes, scores, classes = gather_candidates(per_img, cfg)
        if flipped:
            boxes = unflip_boxes(boxes, img_v.shape[1])
        boxes = boxes / s                       # back to original scale
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_classes.append(classes)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    classes = jnp.concatenate(all_classes, axis=0)
    return select_detections(boxes, scores, classes, cfg, interpret=interpret)
