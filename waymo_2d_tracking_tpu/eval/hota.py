"""HOTA evaluation (Luiten et al., IJCV 2021) — the modern MOT headline
metric alongside CLEAR-MOT/IDF1 (eval/mot.py).

The reference era reported MOTA (SURVEY.md §2 C22); HOTA has since become
the primary metric on every major tracking benchmark because it decomposes
into detection (DetA) and association (AssA) accuracy and integrates over
localization thresholds instead of fixing IoU>=0.5. Implemented to match
the official TrackEval procedure:

Per localization threshold alpha:
  pass 1: per frame, "potential matches" are (gt, pred) pairs with
      IoU >= alpha; accumulate per-(gt_id, pred_id) potential-match counts
      and per-id detection counts, giving the global alignment score
      A_max(g, p) = |pot(g, p)| / (|g| + |p| - |pot(g, p)|)   (Jaccard).
  pass 2: per frame, Hungarian-match maximizing the global alignment score
      of feasible pairs (similarity breaks ties), restricted to
      IoU >= alpha. Matches are TPs; accumulate matched counts per pair.
  DetA  = TP / (TP + FN + FP)
  AssA  = mean over TPs of  TPA / (TPA + FNA + FPA), where for a TP with
          ids (g, p): TPA = matched(g, p), FNA = |g| - TPA, FPA = |p| - TPA
  LocA  = mean IoU over TPs
  HOTA(alpha) = sqrt(DetA * AssA)

HOTA = mean over alpha in {0.05, 0.10, ..., 0.95} (19 thresholds).

Offline host path — numpy + scipy, same rationale as eval/mot.py.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from waymo_2d_tracking_tpu.eval.mot import _frame_iou

DEFAULT_ALPHAS = tuple(np.arange(0.05, 0.96, 0.05).round(2))


@dataclasses.dataclass
class HotaMetrics:
    hota: float            # mean over alphas of sqrt(DetA * AssA)
    deta: float            # mean detection accuracy over alphas
    assa: float            # mean association accuracy over alphas
    loca: float            # mean localization accuracy (TP-weighted)
    hota_50: float         # HOTA at alpha = 0.5 (single-threshold view)
    num_frames: int
    num_gt: int
    num_pred: int
    # raw per-alpha accumulators (A, 5): tp, fn, fp, ass_sum, loc_sum —
    # carried so combine_hota can pool sequences exactly (TrackEval's
    # combined-sequence accumulation); excluded from as_dict and from the
    # dataclass __eq__ (ndarray equality is elementwise and would raise)
    alphas: Tuple[float, ...] = ()
    counts: "np.ndarray | None" = dataclasses.field(default=None,
                                                    compare=False)

    def as_dict(self) -> Dict[str, float]:
        d = dataclasses.asdict(self)
        d.pop("alphas")
        d.pop("counts")
        return d


def _eval_alpha(
    gt_frames, hyp_frames, ious: List[np.ndarray], alpha: float,
) -> Tuple[float, float, float, float, float]:
    """One localization threshold -> (tp, fn, fp, ass_sum, loc_sum)."""
    # pass 1: global alignment from potential matches
    pot: Dict[Tuple[int, int], int] = {}
    gt_count: Dict[int, int] = {}
    pr_count: Dict[int, int] = {}
    for (gt_ids, _), (hyp_ids, _), iou in zip(gt_frames, hyp_frames, ious):
        for gid in gt_ids:
            gt_count[int(gid)] = gt_count.get(int(gid), 0) + 1
        for pid in hyp_ids:
            pr_count[int(pid)] = pr_count.get(int(pid), 0) + 1
        if iou.size == 0:
            continue
        for gi, pj in zip(*np.nonzero(iou >= alpha)):
            key = (int(gt_ids[gi]), int(hyp_ids[pj]))
            pot[key] = pot.get(key, 0) + 1

    def align(gid: int, pid: int) -> float:
        p = pot.get((gid, pid), 0)
        return p / max(gt_count[gid] + pr_count[pid] - p, 1)

    # pass 2: per-frame Hungarian on global alignment (similarity tiebreak)
    matched: Dict[Tuple[int, int], int] = {}
    tp = 0
    loc_sum = 0.0
    total_gt = sum(gt_count.values())
    total_pr = sum(pr_count.values())
    tp_pairs: List[Tuple[int, int]] = []  # one entry per TP (with repeats)
    for (gt_ids, _), (hyp_ids, _), iou in zip(gt_frames, hyp_frames, ious):
        g, h = len(gt_ids), len(hyp_ids)
        if g == 0 or h == 0 or iou.size == 0:
            continue
        feasible = iou >= alpha
        if not feasible.any():
            continue
        score = np.zeros((g, h))
        for gi in range(g):
            for pj in range(h):
                if feasible[gi, pj]:
                    # TrackEval ordering: global alignment dominates,
                    # per-frame similarity only breaks ties
                    score[gi, pj] = (
                        1000.0 * align(int(gt_ids[gi]), int(hyp_ids[pj]))
                        + iou[gi, pj]
                    )
        ri, ci = linear_sum_assignment(-score)
        for r, c in zip(ri, ci):
            if feasible[r, c]:
                key = (int(gt_ids[r]), int(hyp_ids[c]))
                matched[key] = matched.get(key, 0) + 1
                tp += 1
                loc_sum += float(iou[r, c])
                tp_pairs.append(key)

    fn = total_gt - tp
    fp = total_pr - tp
    ass_sum = 0.0
    for gid, pid in tp_pairs:
        tpa = matched[(gid, pid)]
        fna = gt_count[gid] - tpa
        fpa = pr_count[pid] - tpa
        ass_sum += tpa / max(tpa + fna + fpa, 1)
    return float(tp), float(fn), float(fp), ass_sum, loc_sum


def _metrics_from_counts(
    alphas: Sequence[float], counts: np.ndarray,
    num_frames: int, num_gt: int, num_pred: int,
) -> HotaMetrics:
    """Per-alpha (tp, fn, fp, ass_sum, loc_sum) -> final HotaMetrics."""
    tp, fn, fp, ass_sum, loc_sum = counts.T
    detas = tp / np.maximum(tp + fn + fp, 1)
    assas = np.where(tp > 0, ass_sum / np.maximum(tp, 1), 0.0)
    locas = np.where(tp > 0, loc_sum / np.maximum(tp, 1), 0.0)
    hotas = np.sqrt(detas * assas)
    # LocA averaged only over alphas that had TPs
    has_tp = tp > 0
    alphas_arr = np.asarray(alphas)
    i50 = int(np.argmin(np.abs(alphas_arr - 0.5)))
    hota_50 = float(hotas[i50]) if abs(alphas_arr[i50] - 0.5) < 1e-6 else 0.0
    return HotaMetrics(
        hota=float(hotas.mean()),
        deta=float(detas.mean()),
        assa=float(assas.mean()),
        loca=float(locas[has_tp].mean()) if has_tp.any() else 0.0,
        hota_50=hota_50,
        num_frames=num_frames,
        num_gt=num_gt,
        num_pred=num_pred,
        alphas=tuple(float(a) for a in alphas),
        counts=counts,
    )


def evaluate_hota(
    gt_frames: Sequence[Tuple[np.ndarray, np.ndarray]],
    hyp_frames: Sequence[Tuple[np.ndarray, np.ndarray]],
    alphas: Sequence[float] = DEFAULT_ALPHAS,
) -> HotaMetrics:
    """Evaluate HOTA over a clip.

    gt_frames / hyp_frames: per frame (ids (N,) int, boxes (N, 4) xyxy) —
    the same frame format as eval/mot.evaluate_mot, so the two metrics run
    off one conversion (mot.track_outputs_to_frames / gt_to_frames).
    """
    assert len(gt_frames) == len(hyp_frames)
    ious = []
    num_gt = num_pred = 0
    for (gt_ids, gt_boxes), (hyp_ids, hyp_boxes) in zip(gt_frames, hyp_frames):
        num_gt += len(gt_ids)
        num_pred += len(hyp_ids)
        if len(gt_ids) and len(hyp_ids):
            ious.append(_frame_iou(
                np.asarray(gt_boxes, float), np.asarray(hyp_boxes, float)
            ))
        else:
            ious.append(np.zeros((len(gt_ids), len(hyp_ids))))

    counts = np.array(
        [_eval_alpha(gt_frames, hyp_frames, ious, a) for a in alphas]
    ).reshape(len(alphas), 5)
    return _metrics_from_counts(alphas, counts, len(gt_frames), num_gt,
                                num_pred)


def combine_hota(parts: Sequence[HotaMetrics]) -> HotaMetrics:
    """Exact pooled HOTA from independently evaluated parts.

    Valid whenever parts share no trajectory ids (per-(context, camera)
    segments with interned ids): every per-alpha accumulator — TP/FN/FP,
    the per-TP association-Jaccard sum, the per-TP IoU sum — is additive
    because potential-match and matched counts never cross parts. This IS
    TrackEval's combined-sequence accumulation; equality with a
    concatenated re-run is unit-tested.
    """
    if not parts:
        return _metrics_from_counts(DEFAULT_ALPHAS,
                                    np.zeros((len(DEFAULT_ALPHAS), 5)),
                                    0, 0, 0)
    if any(p.counts is None for p in parts):
        raise ValueError(
            "combine_hota: a part carries no per-alpha counts (was it "
            "rebuilt from as_dict output?) — pooling it would silently "
            "undercount; re-run evaluate_hota for that sequence")
    alphas = parts[0].alphas
    if any(p.alphas != alphas for p in parts):
        raise ValueError("combine_hota: parts evaluated at different alphas")
    return _metrics_from_counts(
        alphas,
        np.sum([p.counts for p in parts], axis=0),
        num_frames=sum(p.num_frames for p in parts),
        num_gt=sum(p.num_gt for p in parts),
        num_pred=sum(p.num_pred for p in parts),
    )
