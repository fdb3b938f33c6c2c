"""HOTA oracle tests — hand-computed closed-form cases (eval/hota.py).

Each case is small enough to evaluate the Luiten et al. definitions by
hand; the values below are exact, not regression snapshots.
"""
import numpy as np

from waymo_2d_tracking_tpu.eval.hota import evaluate_hota


def _box(x, y, w=10.0, h=10.0):
    return [x, y, x + w, y + h]


def _frames(per_frame):
    """[(ids, boxes), ...] with numpy conversion."""
    return [
        (np.asarray(ids, int), np.asarray(boxes, float).reshape(-1, 4))
        for ids, boxes in per_frame
    ]


def test_perfect_tracking_is_one():
    """Exact boxes, consistent (but renamed) ids across 10 frames."""
    gt, hyp = [], []
    for t in range(10):
        boxes = [_box(t, 0), _box(t, 50)]
        gt.append(([1, 2], boxes))
        hyp.append(([9, 8], boxes))  # id names differ; mapping is constant
    m = evaluate_hota(_frames(gt), _frames(hyp))
    assert m.hota == 1.0 and m.deta == 1.0 and m.assa == 1.0
    assert m.loca == 1.0 and m.hota_50 == 1.0
    assert m.num_gt == 20 and m.num_pred == 20


def test_single_id_switch():
    """One object, 10 frames, hypothesis id changes at frame 5.

    DetA = 1. Every TP: TPA = 5, FNA = 10-5 = 5, FPA = 5-5 = 0 ->
    A = 0.5, so AssA = 0.5 and HOTA = sqrt(0.5) at every alpha.
    """
    gt, hyp = [], []
    for t in range(10):
        b = [_box(t, 0)]
        gt.append(([7], b))
        hyp.append(([1 if t < 5 else 2], b))
    m = evaluate_hota(_frames(gt), _frames(hyp))
    assert abs(m.deta - 1.0) < 1e-12
    assert abs(m.assa - 0.5) < 1e-12
    assert abs(m.hota - np.sqrt(0.5)) < 1e-12


def test_half_missed_detections():
    """One object, 10 frames, detected on even frames only (same id).

    TP = 5, FN = 5, FP = 0 -> DetA = 0.5. Each TP: TPA = 5,
    FNA = 10-5 = 5, FPA = 0 -> AssA = 0.5. HOTA = sqrt(0.25) = 0.5.
    """
    gt, hyp = [], []
    for t in range(10):
        b = [_box(t, 0)]
        gt.append(([3], b))
        hyp.append(([4], b) if t % 2 == 0 else ([], np.zeros((0, 4))))
    m = evaluate_hota(_frames(gt), _frames(hyp))
    assert abs(m.deta - 0.5) < 1e-12
    assert abs(m.assa - 0.5) < 1e-12
    assert abs(m.hota - 0.5) < 1e-12


def test_localization_integration():
    """Boxes at IoU exactly 0.8: alphas 0.05..0.80 (16 of 19) match
    perfectly, the rest see nothing -> HOTA = 16/19, LocA = 0.8."""
    gt, hyp = [], []
    for t in range(6):
        gt.append(([1], [[0.0, 0.0, 10.0, 10.0]]))
        hyp.append(([1], [[0.0, 0.0, 10.0, 8.0]]))  # IoU = 80/100
    m = evaluate_hota(_frames(gt), _frames(hyp))
    assert abs(m.hota - 16.0 / 19.0) < 1e-9
    assert abs(m.loca - 0.8) < 1e-9
    assert m.hota_50 == 1.0


def test_pure_false_positives_and_empty():
    """Hyp-only detections: DetA accounts FPs; no TPs -> HOTA = 0.
    Fully empty clip -> all zeros, no crash."""
    gt = [([], np.zeros((0, 4)))] * 4
    hyp = [([5], [_box(0, 0)])] * 4
    m = evaluate_hota(_frames(gt), _frames(hyp))
    assert m.hota == 0.0 and m.assa == 0.0 and m.loca == 0.0
    m2 = evaluate_hota(_frames(gt), _frames(gt))
    assert m2.hota == 0.0 and m2.num_gt == 0


def test_global_alignment_prefers_consistent_id():
    """Two hypotheses overlap one GT each frame; Hungarian must pick the
    id that is globally consistent, not the slightly-higher-IoU impostor.

    gt id 1 in all 10 frames. hyp id 1 matches at IoU ~0.9 in all 10
    frames; hyp id 2 exists in frame 0 ONLY at IoU 1.0. TrackEval's
    global-alignment-dominant scoring picks hyp 1 even in frame 0 (its
    A_max ~ 10/10 vs 1/10), giving AssA ~= (10 * (10/11)) / 10 (hyp 2's
    frame-0 det is an FPA for... ) — exactly: TPs all (1,1): TPA=10,
    FNA=0, FPA=0 -> AssA=1, DetA = 10/(10+0+1) for alphas where hyp 2
    is feasible. A similarity-first matcher would pick hyp 2 in frame 0
    and pay an id switch (AssA < 1).
    """
    gt, hyp = [], []
    big = [0.0, 0.0, 10.0, 10.0]
    near = [0.0, 0.0, 10.0, 9.0]   # IoU 0.9 with big
    for t in range(10):
        gt.append(([1], [big]))
        if t == 0:
            hyp.append(([1, 2], [near, big]))
        else:
            hyp.append(([1], [near]))
    m = evaluate_hota(_frames(gt), _frames(hyp),
                      alphas=(0.5,))  # single threshold: hand-checkable
    # all 10 TPs are (gt 1, hyp 1): AssA = 1; DetA = 10/(10+0+1)
    assert abs(m.assa - 1.0) < 1e-12
    assert abs(m.deta - 10.0 / 11.0) < 1e-12
    assert abs(m.hota - np.sqrt(10.0 / 11.0)) < 1e-12


def test_combine_hota_equals_concatenated_evaluation():
    """combine_hota (pooled-from-counts, used by `w2t eval --hota` OVERALL)
    must equal evaluate_hota on the concatenated frame list when parts
    share no trajectory ids."""
    import numpy as np
    import pytest

    from waymo_2d_tracking_tpu.eval.hota import combine_hota, evaluate_hota

    rng = np.random.default_rng(5)

    def rand_frames(n_frames, id_base, n_ids, drop=0.25, jitter=6.0,
                    empty_hyp=False):
        gt_frames, hyp_frames = [], []
        tracks = {id_base + i: rng.uniform(0, 150, 2) for i in range(n_ids)}
        for t in range(n_frames):
            g_ids, g_boxes, h_ids, h_boxes = [], [], [], []
            for tid, origin in tracks.items():
                x, y = origin + t * 2.0
                box = [x, y, x + 28, y + 36]
                g_ids.append(tid)
                g_boxes.append(box)
                if not empty_hyp and rng.uniform() > drop:
                    h_ids.append(tid + 50_000)
                    h_boxes.append(
                        list(np.asarray(box) + rng.uniform(-jitter, jitter, 4)))
            gt_frames.append((np.array(g_ids, np.int64),
                              np.array(g_boxes).reshape(-1, 4)))
            hyp_frames.append((np.array(h_ids, np.int64),
                               np.array(h_boxes).reshape(-1, 4)))
        return gt_frames, hyp_frames

    parts = [
        rand_frames(20, 0, 5),
        rand_frames(30, 100, 7, drop=0.4, jitter=10.0),
        rand_frames(8, 200, 2, empty_hyp=True),   # FN-only part
    ]
    per_part = [evaluate_hota(g, h) for g, h in parts]
    combined = combine_hota(per_part)
    whole = evaluate_hota([f for g, _ in parts for f in g],
                          [f for _, h in parts for f in h])
    for field in ("hota", "deta", "assa", "loca", "hota_50"):
        assert getattr(combined, field) == pytest.approx(
            getattr(whole, field), abs=1e-12), field
    for field in ("num_frames", "num_gt", "num_pred"):
        assert getattr(combined, field) == getattr(whole, field), field
    np.testing.assert_allclose(combined.counts, whole.counts, atol=1e-9)

    assert combine_hota([]).num_gt == 0


def test_hota_metrics_eq_and_counts_guard():
    import dataclasses

    import numpy as np
    import pytest

    from waymo_2d_tracking_tpu.eval.hota import combine_hota, evaluate_hota

    g = [(np.array([1]), np.array([[0.0, 0.0, 10.0, 10.0]]))]
    a = evaluate_hota(g, g)
    b = evaluate_hota(g, g)
    assert a == b  # ndarray counts field must not break dataclass __eq__

    stripped = dataclasses.replace(a, counts=None)
    with pytest.raises(ValueError):
        combine_hota([a, stripped])
