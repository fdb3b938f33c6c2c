"""Frame preprocessing (component C2): device-side resize/normalize/letterbox.

The reference does JPEG decode + resize + normalize + letterbox per frame on
the host with PIL/cv2 (BASELINE north-star orders this "fused into JAX/XLA
device-side preprocessing"). Split of labor here:

- host: JPEG decode only (cv2/libjpeg-turbo — compressed bytes are the only
  thing that should cross PCIe, SURVEY.md §3.1), producing uint8 HWC frames;
- device: everything after decode — uint8->f32, ImageNet normalize, bilinear
  resize (separable matmuls, MXU work), letterbox pad — as jitted JAX fused
  into the same graph as the detector forward, so the preprocessed tensor
  never round-trips to HBM separately.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _resize_matrix(src: int, dst: int, scale: float) -> jnp.ndarray:
    """(dst, src) bilinear interpolation matrix for align_corners=False
    resizing by ``scale`` (dst pixel i samples src at (i + 0.5)/scale - 0.5).
    Resize-as-matmul: runs on the MXU instead of gather units."""
    pos = (jnp.arange(dst, dtype=jnp.float32) + 0.5) / scale - 0.5
    pos = jnp.clip(pos, 0.0, src - 1.0)
    grid = jnp.arange(src, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)


@functools.partial(
    jax.jit, static_argnames=("src_hw", "dst_hw", "out_dtype")
)
def letterbox_batch(
    frames: jnp.ndarray,          # (N, Hs, Ws, 3) uint8
    src_hw: Tuple[int, int],
    dst_hw: Tuple[int, int],
    out_dtype=jnp.float32,
):
    """uint8 frames -> normalized letterboxed (N, Hd, Wd, 3) + scale.

    Scale preserves aspect ratio; the image is anchored top-left and the
    remainder padded with zeros (post-normalization), the usual letterbox
    convention. Returns (images, scale) where ``boxes_image = boxes_net /
    scale`` maps detections back to source pixels.
    """
    hs, ws = src_hw
    hd, wd = dst_hw
    scale = min(hd / hs, wd / ws)
    eff_h, eff_w = int(round(hs * scale)), int(round(ws * scale))

    x = frames.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std

    if (eff_h, eff_w) != (hs, ws):
        ry = _resize_matrix(hs, eff_h, scale)               # (eff_h, Hs)
        rx = _resize_matrix(ws, eff_w, scale)               # (eff_w, Ws)
        hp = jax.lax.Precision.DEFAULT
        x = jnp.einsum("eh,nhwc->newc", ry, x, precision=hp)
        x = jnp.einsum("fw,newc->nefc", rx, x, precision=hp)

    x = jnp.pad(x, ((0, 0), (0, hd - eff_h), (0, wd - eff_w), (0, 0)))
    return x.astype(out_dtype), jnp.float32(scale)


def decode_jpeg_host(jpeg_bytes: bytes) -> np.ndarray:
    """Host JPEG decode via cv2 (libjpeg-turbo under the hood) -> RGB uint8."""
    import cv2

    buf = np.frombuffer(jpeg_bytes, np.uint8)
    bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if bgr is None:
        raise ValueError("JPEG decode failed")
    return bgr[:, :, ::-1]  # BGR -> RGB


def unletterbox_boxes(boxes: jnp.ndarray, scale) -> jnp.ndarray:
    """Map network-space xyxy boxes back to source-image pixels."""
    return boxes / scale
