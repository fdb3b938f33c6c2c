"""FCOS training losses + target assignment (component C23).

Vectorized, fixed-shape target assignment (locations x max_gt, masked) —
the torch reference's per-image Python assignment loops (SURVEY.md L1
[RECALLED]) become one batched computation. Losses: sigmoid focal (class),
GIoU (box, on positives), BCE (centerness).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# FCOS level regression ranges (in image pixels, by pyramid level)
LEVEL_RANGES = {3: (0.0, 64.0), 4: (64.0, 128.0), 5: (128.0, 256.0),
                6: (256.0, 512.0), 7: (512.0, 1e8)}
INF = 1e8


def level_locations(h: int, w: int, stride: int) -> jnp.ndarray:
    """(H*W, 2) location centers (x, y) in image coordinates."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def assign_targets_level(
    locs: jnp.ndarray,        # (L, 2) x,y
    gt_boxes: jnp.ndarray,    # (G, 4) xyxy
    gt_classes: jnp.ndarray,  # (G,) int
    gt_valid: jnp.ndarray,    # (G,) bool
    level_range: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-location targets: (cls (L,) int [-1 = background], ltrb (L, 4)
    in pixels, centerness (L,))."""
    x, y = locs[:, 0:1], locs[:, 1:2]                       # (L, 1)
    l = x - gt_boxes[None, :, 0]                            # (L, G)
    t = y - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - x
    b = gt_boxes[None, :, 3] - y
    ltrb = jnp.stack([l, t, r, b], axis=-1)                 # (L, G, 4)
    inside = jnp.min(ltrb, axis=-1) > 0.0
    maxreg = jnp.max(ltrb, axis=-1)
    lo, hi = level_range
    in_level = jnp.logical_and(maxreg >= lo, maxreg <= hi)
    eligible = inside & in_level & gt_valid[None, :]        # (L, G)

    area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    area_masked = jnp.where(eligible, area[None, :], INF)
    best = jnp.argmin(area_masked, axis=1)                  # (L,)
    has_target = jnp.any(eligible, axis=1)

    cls_t = jnp.where(has_target, gt_classes[best], -1)
    ltrb_t = jnp.take_along_axis(ltrb, best[:, None, None], axis=1)[:, 0]
    lr = jnp.stack([ltrb_t[:, 0], ltrb_t[:, 2]], -1)
    tb = jnp.stack([ltrb_t[:, 1], ltrb_t[:, 3]], -1)
    ctr_t = jnp.sqrt(
        jnp.clip(
            (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
            * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)),
            0.0, 1.0,
        )
    )
    return cls_t, ltrb_t, jnp.where(has_target, ctr_t, 0.0)


def sigmoid_focal_loss(logits, targets_onehot, alpha=0.25, gamma=2.0):
    """Element-wise focal loss; caller reduces."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, labels):
    """Numerically stable sigmoid cross entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def giou_loss(pred_ltrb, target_ltrb):
    """GIoU loss on ltrb distances around a shared center (FCOS form)."""
    pl, pt, pr, pb = [pred_ltrb[..., i] for i in range(4)]
    tl, tt, tr, tb = [target_ltrb[..., i] for i in range(4)]
    p_area = (pl + pr) * (pt + pb)
    t_area = (tl + tr) * (tt + tb)
    iw = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    union = p_area + t_area - inter
    iou = inter / jnp.maximum(union, 1e-6)
    cw = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    ch = jnp.maximum(pt, tt) + jnp.maximum(pb, tb)
    c_area = cw * ch
    giou = iou - (c_area - union) / jnp.maximum(c_area, 1e-6)
    return 1.0 - giou


def fcos_loss(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    gt_boxes: jnp.ndarray,    # (N, G, 4)
    gt_classes: jnp.ndarray,  # (N, G)
    gt_valid: jnp.ndarray,    # (N, G)
    num_classes: int,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total FCOS loss over a batch and all levels."""
    total_cls = 0.0
    total_box = 0.0
    total_ctr = 0.0
    total_pos = 0.0

    for lvl, (cls_logits, ltrb_pred, ctr_logits) in head_out.items():
        n, h, w, k = cls_logits.shape
        stride = 2 ** lvl
        locs = level_locations(h, w, stride)

        assign = jax.vmap(
            lambda gb, gc, gv: assign_targets_level(
                locs, gb, gc, gv, LEVEL_RANGES[lvl]
            )
        )
        cls_t, ltrb_t, ctr_t = assign(gt_boxes, gt_classes, gt_valid)  # (N, L...)

        pos = cls_t >= 0                                             # (N, L)
        onehot = jax.nn.one_hot(jnp.clip(cls_t, 0), num_classes) * pos[..., None]
        cls_flat = cls_logits.astype(jnp.float32).reshape(n, -1, k)
        total_cls += jnp.sum(
            sigmoid_focal_loss(cls_flat, onehot, focal_alpha, focal_gamma)
        )

        ltrb_flat = ltrb_pred.astype(jnp.float32).reshape(n, -1, 4) * stride
        box_l = giou_loss(ltrb_flat, ltrb_t)
        # centerness-weighted box loss (FCOS improvement)
        total_box += jnp.sum(box_l * ctr_t * pos)

        ctr_flat = ctr_logits.astype(jnp.float32).reshape(n, -1)
        total_ctr += jnp.sum(optax_sigmoid_ce(ctr_flat, ctr_t) * pos)
        total_pos += jnp.sum(pos)

    norm = jnp.maximum(total_pos, 1.0)
    loss_cls = total_cls / norm
    loss_box = total_box / norm
    loss_ctr = total_ctr / norm
    loss = loss_cls + loss_box + loss_ctr
    return loss, {
        "loss": loss, "loss_cls": loss_cls, "loss_box": loss_box,
        "loss_ctr": loss_ctr, "num_pos": total_pos,
    }


def reid_triplet_loss(
    embeds: jnp.ndarray,     # (N, G, E) L2-normalized GT-box embeddings
    ids: jnp.ndarray,        # (N, G) int track ids (-1 = invalid)
    valid: jnp.ndarray,      # (N, G) bool
    margin: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-hard triplet loss over cosine distance (Hermans et al. 2017,
    the standard ReID objective): for each valid anchor, the HARDEST
    positive (same id elsewhere in the batch) and HARDEST negative
    (different id); hinge at ``margin``. Identities must recur across
    frames in the batch for positives to exist — data/coco.py's
    track-id-carrying batches provide that.

    Returns (mean loss over active anchors, active-anchor count). Anchors
    without both a positive and a negative contribute nothing (count 0 ->
    loss 0), so the term is safe to add unconditionally.
    """
    n, g, e = embeds.shape
    flat_e = embeds.reshape(n * g, e).astype(jnp.float32)
    flat_id = ids.reshape(n * g)
    flat_ok = jnp.logical_and(valid.reshape(n * g), flat_id >= 0)

    dist = 1.0 - flat_e @ flat_e.T                       # cosine distance
    same = flat_id[:, None] == flat_id[None, :]
    pair_ok = jnp.logical_and(flat_ok[:, None], flat_ok[None, :])
    eye = jnp.eye(n * g, dtype=bool)
    pos_mask = same & pair_ok & ~eye
    neg_mask = (~same) & pair_ok

    big = jnp.float32(4.0)   # > max cosine distance (2)
    hardest_pos = jnp.max(jnp.where(pos_mask, dist, -big), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, dist, big), axis=1)
    active = jnp.logical_and(
        jnp.logical_and(pos_mask.any(axis=1), neg_mask.any(axis=1)), flat_ok
    )
    per_anchor = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    count = jnp.sum(active)
    loss = jnp.sum(jnp.where(active, per_anchor, 0.0)) / jnp.maximum(count, 1)
    return loss, count


def reid_supcon_loss(
    embeds: jnp.ndarray,     # (N, G, E) L2-normalized GT-box embeddings
    ids: jnp.ndarray,        # (N, G) int track ids (-1 = invalid)
    valid: jnp.ndarray,      # (N, G) bool
    temperature: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Supervised contrastive loss (Khosla et al. 2020, arXiv:2004.11362)
    over the same (embeds, ids, valid) contract as ``reid_triplet_loss``:
    for each valid anchor with >= 1 positive,

        L_i = -mean_{p in P(i)} log( exp(s_ip/t) / sum_{a in A(i)} exp(s_ia/t) )

    with s = cosine similarity, A(i) = all other valid entries.

    Why this is the DEFAULT reid objective (round 5, measured): batch-hard
    triplet with a hinge margin on L2-NORMALIZED embeddings has a collapse
    descent path — from a healthy init (mean pairwise cosine distance
    ~0.39) shrinking ALL distances lowers hardest_pos faster than it costs
    on hardest_neg, and at full collapse the loss flatlines at exactly the
    margin with ~zero gradient (observed on the pixels-fixture trainer:
    separation 0.39 -> 3e-4 within 100 steps, loss pinned at 0.3009 =
    margin). The softmax denominator here makes collapse maximally
    EXPENSIVE instead (all negatives at similarity 1/t), so spreading is
    always rewarded. Returns (mean loss over active anchors, count);
    anchors without a positive contribute nothing, same as the triplet.
    """
    n, g, e = embeds.shape
    flat_e = embeds.reshape(n * g, e).astype(jnp.float32)
    flat_id = ids.reshape(n * g)
    flat_ok = jnp.logical_and(valid.reshape(n * g), flat_id >= 0)

    sim = (flat_e @ flat_e.T) / jnp.float32(temperature)
    same = flat_id[:, None] == flat_id[None, :]
    pair_ok = jnp.logical_and(flat_ok[:, None], flat_ok[None, :])
    eye = jnp.eye(n * g, dtype=bool)
    pos_mask = same & pair_ok & ~eye
    all_mask = pair_ok & ~eye

    # log softmax over each anchor's row, masked to A(i); rowmax subtracted
    # for stability (masked entries excluded from the max too)
    neg_inf = jnp.float32(-1e9)
    sim_m = jnp.where(all_mask, sim, neg_inf)
    rowmax = jnp.max(sim_m, axis=1, keepdims=True)
    rowmax = jnp.where(rowmax <= neg_inf / 2, 0.0, rowmax)  # empty rows
    logz = rowmax[:, 0] + jnp.log(
        jnp.sum(jnp.where(all_mask, jnp.exp(sim - rowmax), 0.0), axis=1)
        + 1e-20
    )
    log_p = sim - logz[:, None]                              # (A, A)
    n_pos = jnp.sum(pos_mask, axis=1)
    per_anchor = -jnp.sum(jnp.where(pos_mask, log_p, 0.0), axis=1) \
        / jnp.maximum(n_pos, 1)
    active = jnp.logical_and(n_pos > 0, flat_ok)
    count = jnp.sum(active)
    loss = jnp.sum(jnp.where(active, per_anchor, 0.0)) / jnp.maximum(count, 1)
    return loss, count
