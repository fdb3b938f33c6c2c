"""RoIAlign (component C10) — TPU-first separable-matmul formulation.

The reference uses torchvision's CUDA ``roi_align`` extension (SURVEY.md
§2.1), which bilinearly samples 4 neighbors per sample point — a
gather-heavy pattern that is hostile to TPU memory. This implementation
restates RoIAlign as dense linear algebra:

bilinear interpolation is separable, so average-pooled RoIAlign is exactly

    out[r] = Wy[r] @ F @ Wx[r]^T          (per channel)

where Wy[r] (P, H) / Wx[r] (P, W) are per-RoI interpolation matrices whose
rows are averaged hat functions ``max(0, 1 - |y_sample - h|)`` evaluated on
the feature grid (each row has <= 2(s) nonzeros but is materialized dense).
No gathers; the work lands on the MXU as batched matmuls — the op the TPU
is built for. Matches the aligned=True (half-pixel) RoIAlign convention,
oracle-tested against a direct numpy implementation.

A Pallas variant (feature map resident in VMEM across the RoI grid) is the
planned perf-pass upgrade; this XLA version already compiles to fused
batched matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_matrix(
    start: jnp.ndarray,    # (R,) roi start in feature coords (pre -0.5 shift)
    bin_size: jnp.ndarray, # (R,)
    num_bins: int,
    sampling_ratio: int,
    size: int,
) -> jnp.ndarray:
    """(R, num_bins, size) averaged bilinear weights along one axis."""
    s = sampling_ratio
    offs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s                 # (s,)
    bins = jnp.arange(num_bins, dtype=jnp.float32)                      # (P,)
    # sample positions (R, P, s)
    pos = (
        start[:, None, None]
        + (bins[None, :, None] + offs[None, None, :]) * bin_size[:, None, None]
    )
    in_range = jnp.logical_and(pos >= -1.0, pos <= size)                # tv rule
    posc = jnp.clip(pos, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)                          # (Z,)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(posc[..., None] - grid))       # (R,P,s,Z)
    hat = jnp.where(in_range[..., None], hat, 0.0)
    return jnp.sum(hat, axis=2) / s                                     # (R,P,Z)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "roi_chunk")
)
def roi_align(
    features: jnp.ndarray,   # (H, W, C)
    boxes: jnp.ndarray,      # (R, 4) [x1,y1,x2,y2] in image coords
    spatial_scale: float | jnp.ndarray = 1.0,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 16,
) -> jnp.ndarray:
    """Pooled features (R, P, P, C), aligned=True convention.

    Computation is chunked over RoIs (``roi_chunk`` at a time via lax.map)
    to bound the (chunk, P, W, C) intermediate.
    """
    h, w, c = features.shape
    r = boxes.shape[0]
    p = output_size
    # pool in the features' own dtype (bf16 in the detector): the pooling
    # matmuls are the hot path and the ReID head downstream is bf16 anyway
    feats = features

    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    bin_w = (x2 - x1) / p
    bin_h = (y2 - y1) / p

    wy = _interp_matrix(y1, bin_h, p, sampling_ratio, h)    # (R, P, H)
    wx = _interp_matrix(x1, bin_w, p, sampling_ratio, w)    # (R, P, W)

    pad = (-r) % roi_chunk
    if pad:
        wy = jnp.concatenate([wy, jnp.zeros((pad, p, h), wy.dtype)], axis=0)
        wx = jnp.concatenate([wx, jnp.zeros((pad, p, w), wx.dtype)], axis=0)
    wy = wy.reshape(-1, roi_chunk, p, h)
    wx = wx.reshape(-1, roi_chunk, p, w)

    hp = (
        jax.lax.Precision.HIGHEST
        if features.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    wdt = features.dtype

    def chunk_fn(args):
        wy_c, wx_c = args                                   # (K, P, H), (K, P, W)
        rows = jnp.einsum("kph,hwc->kpwc", wy_c.astype(wdt), feats, precision=hp)
        return jnp.einsum("kqw,kpwc->kpqc", wx_c.astype(wdt), rows, precision=hp)

    out = jax.lax.map(chunk_fn, (wy, wx))                   # (R/K, K, P, P, C)
    out = out.reshape(-1, p, p, c)[:r]
    return out.astype(features.dtype)


def roi_align_multilevel(
    feature_levels,          # dict level -> (H_l, W_l, C)
    boxes: jnp.ndarray,      # (R, 4) image coords
    level_strides,           # dict level -> stride
    canonical_level: int = 4,
    canonical_size: float = 224.0,
    output_size: int = 7,
    sampling_ratio: int = 2,
):
    """FPN-style RoIAlign: each box pools from the pyramid level matched to
    its scale (k = k0 + log2(sqrt(area)/224), Lin et al. FPN eq.1), computed
    as a masked sum over levels — fixed shapes, no data-dependent routing.
    """
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    target = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8)
    )
    levels = sorted(feature_levels.keys())
    target = jnp.clip(target, min(levels), max(levels)).astype(jnp.int32)

    out = None
    for lvl in levels:
        pooled = roi_align(
            feature_levels[lvl],
            boxes,
            spatial_scale=1.0 / level_strides[lvl],
            output_size=output_size,
            sampling_ratio=sampling_ratio,
        )
        mask = (target == lvl).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
