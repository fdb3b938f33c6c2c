"""Unit tests for eval/mot.py (C22) — hand-computed CLEAR-MOT cases."""
import numpy as np

from waymo_2d_tracking_tpu.eval.mot import evaluate_mot


def b(x, y, w=10.0, h=10.0):
    return [x, y, x + w, y + h]


def test_perfect_tracking():
    gt = [(np.array([1, 2]), np.array([b(0, 0), b(50, 50)]))] * 5
    hyp = [(np.array([7, 8]), np.array([b(0, 0), b(50, 50)]))] * 5
    m = evaluate_mot(gt, hyp)
    assert m.mota == 1.0
    assert m.motp == 1.0
    assert m.num_idsw == 0


def test_all_missed():
    gt = [(np.array([1]), np.array([b(0, 0)]))] * 4
    hyp = [(np.array([], int), np.zeros((0, 4)))] * 4
    m = evaluate_mot(gt, hyp)
    assert m.num_fn == 4 and m.num_fp == 0
    assert m.mota == 0.0


def test_false_positives_only():
    gt = [(np.array([], int), np.zeros((0, 4)))] * 4
    hyp = [(np.array([1]), np.array([b(0, 0)]))] * 4
    m = evaluate_mot(gt, hyp)
    assert m.num_fp == 4
    assert m.mota == -3.0  # 1 - 4/max(0,1)


def test_id_switch_counted():
    gt = [(np.array([1]), np.array([b(0, 0)]))] * 4
    hyp = [
        (np.array([10]), np.array([b(0, 0)])),
        (np.array([10]), np.array([b(0, 0)])),
        (np.array([20]), np.array([b(0, 0)])),  # id changes -> 1 IDSW
        (np.array([20]), np.array([b(0, 0)])),
    ]
    m = evaluate_mot(gt, hyp)
    assert m.num_idsw == 1
    assert m.mota == 1.0 - 1 / 4


def test_idsw_after_gap():
    # CLEAR: correspondence persists through a gap; re-acquiring with a new
    # id after the gap is an id switch.
    gt = [(np.array([1]), np.array([b(0, 0)]))] * 5
    hyp = [
        (np.array([10]), np.array([b(0, 0)])),
        (np.array([], int), np.zeros((0, 4))),          # miss
        (np.array([], int), np.zeros((0, 4))),          # miss
        (np.array([11]), np.array([b(0, 0)])),          # new id -> IDSW
        (np.array([11]), np.array([b(0, 0)])),
    ]
    m = evaluate_mot(gt, hyp)
    assert m.num_fn == 2
    assert m.num_idsw == 1


def test_greedy_carryover_beats_hungarian_swap():
    # two GT close together; hypothesis ids must stay with their GT via
    # carryover even if a fresh Hungarian would swap them at equal IoU
    gt = [
        (np.array([1, 2]), np.array([b(0, 0), b(8, 0)]))
        for _ in range(3)
    ]
    hyp = [
        (np.array([10, 20]), np.array([b(0, 0), b(8, 0)]))
        for _ in range(3)
    ]
    m = evaluate_mot(gt, hyp, iou_threshold=0.2)
    assert m.num_idsw == 0


def test_low_iou_not_matched():
    gt = [(np.array([1]), np.array([b(0, 0)]))]
    hyp = [(np.array([10]), np.array([b(100, 100)]))]
    m = evaluate_mot(gt, hyp)
    assert m.num_fn == 1 and m.num_fp == 1


def test_idf1_perfect():
    gt = [(np.array([1, 2]), np.array([b(0, 0), b(50, 50)]))] * 5
    hyp = [(np.array([7, 8]), np.array([b(0, 0), b(50, 50)]))] * 5
    m = evaluate_mot(gt, hyp)
    assert m.idf1 == 1.0
    assert m.mostly_tracked == 2 and m.mostly_lost == 0


def test_idf1_penalizes_id_switch_globally():
    """CLEAR carryover forgives a switch after one IDSW; IDF1 charges every
    frame attributed to the non-dominant identity."""
    gt = [(np.array([1]), np.array([b(0, 0)]))] * 10
    hyp = (
        [(np.array([10]), np.array([b(0, 0)]))] * 5
        + [(np.array([20]), np.array([b(0, 0)]))] * 5
    )
    m = evaluate_mot(gt, hyp)
    assert m.num_idsw == 1
    # best global match covers 5 of 10 frames: IDTP=5, IDF1 = 2*5/(10+10)
    assert abs(m.idf1 - 0.5) < 1e-9


def test_mostly_lost():
    gt = [(np.array([1]), np.array([b(0, 0)]))] * 10
    hyp = [(np.array([9]), np.array([b(0, 0)]))] * 1 + [
        (np.array([], int), np.zeros((0, 4)))
    ] * 9
    m = evaluate_mot(gt, hyp)
    assert m.mostly_lost == 1 and m.mostly_tracked == 0


def test_combine_mot_equals_concatenated_evaluation():
    """combine_mot (pooled-from-counts, used by `w2t eval` OVERALL) must
    equal evaluate_mot on the concatenated frame list whenever parts share
    no trajectory ids — including degenerate parts (gt-only / pred-only)."""
    import numpy as np

    from waymo_2d_tracking_tpu.eval.mot import combine_mot, evaluate_mot

    rng = np.random.default_rng(3)

    def rand_frames(n_frames, id_base, n_ids, drop=0.2, jitter=4.0,
                    empty_hyp=False, empty_gt=False):
        gt_frames, hyp_frames = [], []
        tracks = {
            id_base + i: rng.uniform(0, 200, 2) for i in range(n_ids)
        }
        for t in range(n_frames):
            g_ids, g_boxes, h_ids, h_boxes = [], [], [], []
            for tid, origin in tracks.items():
                x, y = origin + t * 1.5
                box = [x, y, x + 30, y + 40]
                if not empty_gt:
                    g_ids.append(tid)
                    g_boxes.append(box)
                if not empty_hyp and rng.uniform() > drop:
                    jit = rng.uniform(-jitter, jitter, 4)
                    # hypothesis ids offset so they never collide with gt
                    # ids (evaluate_mot ids are namespace-free ints)
                    h_ids.append(tid + 10_000)
                    h_boxes.append(list(np.asarray(box) + jit))
            gt_frames.append((np.array(g_ids, np.int64),
                              np.array(g_boxes).reshape(-1, 4)))
            hyp_frames.append((np.array(h_ids, np.int64),
                               np.array(h_boxes).reshape(-1, 4)))
        return gt_frames, hyp_frames

    parts = [
        rand_frames(25, 0, 6),
        rand_frames(40, 100, 9, drop=0.4, jitter=8.0),
        rand_frames(10, 200, 3, empty_hyp=True),   # FN-only part
        rand_frames(8, 300, 2, empty_gt=True),     # FP-only part (gt empty)
    ]
    per_part = [evaluate_mot(g, h) for g, h in parts]
    combined = combine_mot(per_part)
    cat_gt = [f for g, _ in parts for f in g]
    cat_hyp = [f for _, h in parts for f in h]
    whole = evaluate_mot(cat_gt, cat_hyp)

    for field in ("num_frames", "num_gt", "num_matches", "num_fp",
                  "num_fn", "num_idsw", "mostly_tracked", "mostly_lost"):
        assert getattr(combined, field) == getattr(whole, field), field
    for field in ("mota", "motp", "idf1"):
        assert abs(getattr(combined, field) - getattr(whole, field)) < 1e-9, field

    assert combine_mot([]).num_frames == 0


def test_combine_mot_empty_matches_evaluate_mot_empty():
    from waymo_2d_tracking_tpu.eval.mot import combine_mot, evaluate_mot

    assert combine_mot([]).as_dict() == evaluate_mot([], []).as_dict()


def test_suppress_ignored_removes_only_unmatched_on_regions():
    """Review r4 protocol preprocessing: a prediction on an ignore region
    is removed from the penalty set UNLESS it matched real GT; off-region
    predictions always survive. Both region tests fire: IoU vs a same-size
    ignore box, containment inside a large crowd region."""
    from waymo_2d_tracking_tpu.eval.mot import evaluate_mot, suppress_ignored

    gt = [(np.array([1]), np.array([[0.0, 0, 10, 10]]))]
    hyp = [(
        np.array([1, 2, 3, 4]),
        np.array([
            [0.0, 0, 10, 10],       # matches GT (and overlaps ignore!)
            [100, 100, 110, 110],   # IoU ~1 with a small ignore box
            [203, 203, 207, 207],   # small det inside a big crowd region
            [300, 300, 310, 310],   # off-region FP: must survive
        ]),
    )]
    ignore = [np.array([
        [0.0, 0, 10, 10],           # on the GT (must not unmatch it)
        [100, 100, 110, 110],
        [200, 200, 240, 240],       # crowd region
    ])]
    out = suppress_ignored(gt, hyp, ignore)
    assert list(out[0][0]) == [1, 4]
    # end-to-end: the filtered set scores 1 FP (the genuine one)
    m = evaluate_mot(gt, out)
    assert m.num_fp == 1 and m.num_fn == 0 and m.num_matches == 1

    # no ignore boxes for a frame -> pass-through (identity)
    out2 = suppress_ignored(gt, hyp, [np.zeros((0, 4))])
    assert len(out2[0][0]) == 4
