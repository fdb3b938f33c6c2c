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
