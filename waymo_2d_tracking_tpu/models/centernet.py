"""CenterNet-style head family (Zhou et al., "Objects as Points",
arXiv:1904.07850): per-class center heatmap + size + sub-pixel offset.

Second detection head family next to FCOS (``DetectorConfig.head_family``).
Where FCOS scores every location on every pyramid level and relies on NMS
to dedupe, CenterNet detects local maxima of one heatmap — peak extraction
is a 3x3 max-pool equality test, which is exactly the shape TPUs like:
one ``reduce_window`` + elementwise compare, no sequential suppression at
all. Candidates still flow through the shared ``select_detections_batched``
(Pallas NMS) so TTA candidate-union, ReID pooling, multicam batching and
the tracker compose unchanged; for a plain (non-TTA) forward the NMS pass
is a near-no-op since peaks rarely overlap.

The reference stack is single-family (backbone+FPN+heads, SURVEY.md §1.1
L1); this module is capability breadth on our side, demonstrating the
framework's head-family seam.

Head runs on ONE pyramid level (``centernet_level``, default P3/stride 8
— the classic single-resolution CenterNet design mapped onto our FPN).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.models.heads import HeadTower


class CenterNetHeads(nn.Module):
    """heat (N,H,W,K), wh (N,H,W,2) in stride units, offset (N,H,W,2)."""

    num_classes: int = 3
    depth: int = 2
    channels: int = 256
    level: int = 3
    dtype: Any = jnp.bfloat16
    quant: str = "off"   # tower-only; predictor convs stay float (heads.py)

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]):
        x = feats[self.level]
        tower = HeadTower(self.depth, self.channels, self.dtype,
                          quant=self.quant, name="tower")(x)
        heat = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),  # prior p=0.01
            name="heat",
        )(tower)
        # wh predicted in log-space stride units (exp at decode): keeps the
        # regression target O(1) across object scales, like the FCOS branch
        wh = nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                     name="wh")(tower)
        off = nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                      name="offset")(tower)
        return {self.level: (heat, wh, off)}


def heat_peaks(prob: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3-neighborhood maxima of (N, H, W, K) heat probabilities.

    ``reduce_window`` max over 3x3 per class, then equality — ties keep
    both peaks (the following top-k/NMS dedupes), which matches the
    maxpool-based "nms" of the paper.
    """
    pooled = jax.lax.reduce_window(
        prob, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return jnp.where(prob == pooled, prob, 0.0)


def gather_centernet_candidates_batched(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Peak top-k decode: (boxes (N,C,4) xyxy image px, scores, classes).

    Same contract as the FCOS ``gather_candidates_batched`` so the shared
    NMS/TTA/ReID machinery applies verbatim.
    """
    (lvl, (heat, wh, off)), = head_out.items()
    stride = 2 ** lvl
    n, h, w, k = heat.shape
    prob = heat_peaks(jax.nn.sigmoid(heat.astype(jnp.float32)))
    flat = prob.reshape(n, -1)                              # (N, H*W*K)
    k_eff = min(cfg.pre_nms_topk, flat.shape[1])
    scores, idx = jax.lax.top_k(flat, k_eff)
    loc = idx // k
    cls = (idx % k).astype(jnp.int32)
    ci = loc // w                                           # (N, C)
    cj = loc % w

    off_f = off.astype(jnp.float32).reshape(n, -1, 2)
    wh_f = jnp.exp(wh.astype(jnp.float32)).reshape(n, -1, 2)
    o = jnp.take_along_axis(off_f, loc[..., None], axis=1)  # (N, C, 2)
    s_wh = jnp.take_along_axis(wh_f, loc[..., None], axis=1) * stride
    cx = (cj.astype(jnp.float32) + 0.5 + o[..., 0]) * stride
    cy = (ci.astype(jnp.float32) + 0.5 + o[..., 1]) * stride
    boxes = jnp.stack(
        [cx - s_wh[..., 0] / 2, cy - s_wh[..., 1] / 2,
         cx + s_wh[..., 0] / 2, cy + s_wh[..., 1] / 2], axis=-1,
    )
    return boxes, scores, cls


# ---------------------------------------------------------------------------
# training targets + loss


def gaussian_radius(box_h: jnp.ndarray, box_w: jnp.ndarray,
                    min_overlap: float = 0.7) -> jnp.ndarray:
    """CornerNet radius rule: largest r such that a corner displaced by r
    still yields IoU >= min_overlap with the annotation (three quadratic
    cases, take the min). Inputs in feature-map units."""
    a1 = 1.0
    b1 = box_h + box_w
    c1 = box_w * box_h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / 2

    a2 = 4.0
    b2 = 2 * (box_h + box_w)
    c2 = (1 - min_overlap) * box_w * box_h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (box_h + box_w)
    c3 = (min_overlap - 1) * box_w * box_h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.maximum(jnp.minimum(jnp.minimum(r1, r2), r3), 0.0)


def centernet_targets(
    gt_boxes: jnp.ndarray,    # (G, 4) xyxy image px
    gt_classes: jnp.ndarray,  # (G,) int
    gt_valid: jnp.ndarray,    # (G,) bool
    h: int, w: int, stride: int, num_classes: int,
):
    """Per-image targets, fixed shape:
      heat_t (H, W, K) splatted Gaussians (exactly 1.0 at centers),
      wh_t   (G, 2) log stride-unit sizes,  off_t (G, 2) sub-pixel offsets,
      loc    (G,) flat center indices,      pos (G,) validity.
    Regression targets stay per-object (gathered at ``loc`` against the
    flattened prediction maps) — no dense scatter needed.
    """
    x1, y1, x2, y2 = [gt_boxes[:, i] for i in range(4)]
    bw = jnp.maximum(x2 - x1, 1e-3) / stride
    bh = jnp.maximum(y2 - y1, 1e-3) / stride
    cx = (x1 + x2) / 2 / stride                   # feature-map units
    cy = (y1 + y2) / 2 / stride
    cj = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 1)
    ci = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 1)

    r = gaussian_radius(bh, bw)
    sigma2 = jnp.maximum((2.0 * r + 1.0) / 6.0, 1e-3) ** 2    # (G,)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    d2 = ((ys[None, :, None] - ci[:, None, None].astype(jnp.float32)) ** 2
          + (xs[None, None, :] - cj[:, None, None].astype(jnp.float32)) ** 2)
    gauss = jnp.exp(-d2 / (2.0 * sigma2[:, None, None]))       # (G, H, W)
    gauss = jnp.where(gt_valid[:, None, None], gauss, 0.0)
    onehot = jax.nn.one_hot(gt_classes, num_classes, dtype=jnp.float32)
    heat_t = jnp.max(gauss[..., None] * onehot[:, None, None, :], axis=0)

    pos = gt_valid
    loc = ci * w + cj
    # the peak pixel is EXACTLY 1 (focal-loss positive); the splat maxes to
    # <1 when the float center is off the integer grid, so set it explicitly
    peak = jax.nn.one_hot(loc, h * w, dtype=jnp.float32).reshape(-1, h, w)
    peak = jnp.where(pos[:, None, None], peak, 0.0)
    heat_t = jnp.maximum(
        heat_t, jnp.max(peak[..., None] * onehot[:, None, None, :], axis=0)
    )

    wh_t = jnp.log(jnp.stack([bw, bh], axis=-1))
    off_t = jnp.stack(
        [cx - cj.astype(jnp.float32) - 0.5, cy - ci.astype(jnp.float32) - 0.5],
        axis=-1,
    )
    return heat_t, wh_t, off_t, loc, pos


def penalty_reduced_focal(pred_logits, heat_t, alpha=2.0, beta=4.0):
    """CenterNet focal loss, summed (caller normalizes by num positives).

    pos (heat_t == 1):  (1-p)^alpha * log(p)
    neg:               (1-heat_t)^beta * p^alpha * log(1-p)
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    eps = 1e-6
    pos_mask = heat_t >= 1.0
    pos_l = ((1 - p) ** alpha) * jnp.log(p + eps)
    neg_l = ((1 - heat_t) ** beta) * (p ** alpha) * jnp.log(1 - p + eps)
    return -jnp.sum(jnp.where(pos_mask, pos_l, neg_l))


def centernet_loss(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    gt_boxes: jnp.ndarray,    # (N, G, 4)
    gt_classes: jnp.ndarray,  # (N, G)
    gt_valid: jnp.ndarray,    # (N, G)
    num_classes: int,
    wh_weight: float = 0.1,
    off_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total CenterNet loss over a batch (same contract as fcos_loss)."""
    (lvl, (heat, wh, off)), = head_out.items()
    stride = 2 ** lvl
    n, h, w, k = heat.shape

    tgt = jax.vmap(
        lambda gb, gc, gv: centernet_targets(gb, gc, gv, h, w, stride, k)
    )
    heat_t, wh_t, off_t, loc, pos = tgt(gt_boxes, gt_classes, gt_valid)

    loss_heat = penalty_reduced_focal(heat, heat_t)

    wh_f = wh.astype(jnp.float32).reshape(n, -1, 2)
    off_f = off.astype(jnp.float32).reshape(n, -1, 2)
    wh_p = jnp.take_along_axis(wh_f, loc[..., None], axis=1)   # (N, G, 2)
    off_p = jnp.take_along_axis(off_f, loc[..., None], axis=1)
    m = pos[..., None]
    loss_wh = jnp.sum(jnp.abs(wh_p - wh_t) * m)
    loss_off = jnp.sum(jnp.abs(off_p - off_t) * m)

    norm = jnp.maximum(jnp.sum(pos), 1.0)
    loss_heat = loss_heat / norm
    loss_wh = wh_weight * loss_wh / norm
    loss_off = off_weight * loss_off / norm
    loss = loss_heat + loss_wh + loss_off
    return loss, {
        "loss": loss, "loss_cls": loss_heat, "loss_box": loss_wh,
        "loss_ctr": loss_off, "num_pos": jnp.sum(pos),
    }
