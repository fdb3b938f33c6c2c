"""Batched pairwise IoU (component C12).

The reference computes per-frame IoU matrices with numpy on the host
(BASELINE.json north-star: "per-frame scipy/numpy on host"); here it is a
fully vectorized device op — an (N, M) matrix from two box sets in one fused
XLA computation, batchable over leading dims and usable inside Pallas kernels.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [x1,y1,x2,y2] boxes; clamped at 0 for degenerate boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas. a: (..., N, 4), b: (..., M, 4) -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU. a: (..., N, 4), b: (..., M, 4) -> (..., N, M) in [0, 1]."""
    inter = pairwise_intersection(a, b)
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, eps)
