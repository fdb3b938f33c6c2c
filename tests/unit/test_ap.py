"""Detection AP evaluator tests (eval/ap.py): hand-computed oracle values,
COCO matching rules, and the submission-record grouping helper."""
import numpy as np
import pytest

from waymo_2d_tracking_tpu.eval.ap import (
    average_precision,
    evaluate_detections,
    records_to_frames,
)


def test_ap_hand_computed():
    """2 GT, 3 dets: TP(.9), FP(.8), TP(.7) ->
    P-R points (1.0, r=.5), (.5, r=.5), (2/3, r=1);
    101-pt AP = (51*1 + 50*2/3) / 101 = 0.83498..."""
    gts = {"img": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)}
    preds = {
        "img": (
            np.array([[0, 0, 10, 10],     # IoU 1.0 with g1, score .9
                      [50, 50, 60, 60],   # matches nothing, score .8
                      [20, 20, 30, 30]],  # IoU 1.0 with g2, score .7
                     float),
            np.array([0.9, 0.8, 0.7]),
        )
    }
    ap = average_precision(preds, gts, iou_thr=0.5)
    assert abs(ap - (51 * 1.0 + 50 * 2 / 3) / 101) < 1e-6, ap


def test_ap_perfect_and_empty():
    gts = {"a": np.array([[0, 0, 10, 10]], float)}
    perfect = {"a": (np.array([[0, 0, 10, 10]], float), np.array([0.9]))}
    assert average_precision(perfect, gts, 0.5) == 1.0
    none = {"a": (np.zeros((0, 4)), np.zeros((0,)))}
    assert average_precision(none, gts, 0.5) == 0.0


def test_ap_gt_matched_once():
    """Two detections on the same GT: second is a false positive (COCO)."""
    gts = {"a": np.array([[0, 0, 10, 10]], float)}
    preds = {"a": (np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float),
                   np.array([0.9, 0.8]))}
    ap = average_precision(preds, gts, 0.5)
    # recall hits 1.0 at precision 1.0 from the first det; the duplicate FP
    # caps later precision but the envelope keeps AP = 1.0
    assert ap == 1.0


def test_evaluate_detections_classes_and_thresholds():
    # class 0: perfect; class 1: detected with IoU ~0.57 (passes 0.5, fails
    # 0.75); class 2: no GT -> excluded from means
    gt_frames = [("f", np.array([[0, 0, 10, 10], [0, 0, 10, 7]], float),
                  np.array([0, 1]))]
    pred_frames = [("f",
                    np.array([[0, 0, 10, 10], [0, 0, 10, 4]], float),
                    np.array([0.9, 0.9]),
                    np.array([0, 1]))]
    out = evaluate_detections(pred_frames, gt_frames, num_classes=3)
    assert out["AP50"] == 1.0, out
    assert out["AP75"] == 0.5, out            # class0 1.0, class1 0.0
    assert "AP_class2" not in out
    assert 0.0 < out["mAP"] < 1.0


def test_records_to_frames_roundtrip():
    from waymo_2d_tracking_tpu.io_out.submission import TrackRecord

    recs = [
        TrackRecord.from_xyxy("ctx", 1000, 1, "a", 1, (0, 0, 10, 10), 0.9),
        TrackRecord.from_xyxy("ctx", 1000, 1, "b", 4, (5, 5, 9, 9), 0.7),
        TrackRecord.from_xyxy("ctx", 2000, 1, "a", 1, (1, 1, 11, 11), 0.8),
    ]
    pred = records_to_frames(recs, with_scores=True)
    assert len(pred) == 2
    key0, boxes0, scores0, classes0 = pred[0]
    assert key0 == ("ctx", 1, 1000)
    assert boxes0.shape == (2, 4)
    np.testing.assert_allclose(scores0, [0.9, 0.7])
    np.testing.assert_array_equal(classes0, [0, 2])   # Waymo types 1,4 -> 0,2

    gt = records_to_frames(recs, with_scores=False)
    assert len(gt[0]) == 3

    # self-eval: predictions == GT must be perfect
    out = evaluate_detections(pred, gt, num_classes=3)
    assert out["mAP"] == 1.0, out


def test_size_stratified_ap():
    """COCO APs/APm/APl: GT outside the size range is IGNORED (not counted
    toward recall; detections matching it dropped, not false positives)."""
    small = [4.0, 4.0, 20.0, 20.0]       # 16x16 = 256 < 32^2
    large = [0.0, 0.0, 200.0, 200.0]     # 200x200 > 96^2
    gt = [("f0", np.array([small, large]), np.array([0, 0]))]
    # detect both perfectly
    pred = [("f0", np.array([small, large]), np.array([0.9, 0.8]),
             np.array([0, 0]))]
    out = evaluate_detections(pred, gt, num_classes=1)
    assert out["mAP"] == pytest.approx(1.0)
    assert out["APs"] == pytest.approx(1.0)   # large GT ignored, its match dropped
    assert out["APl"] == pytest.approx(1.0)
    assert "APm" not in out                   # no medium GT anywhere

    # detect only the large one: APs has zero TP -> 0; APl still perfect
    pred2 = [("f0", np.array([large]), np.array([0.8]), np.array([0]))]
    out2 = evaluate_detections(pred2, gt, num_classes=1)
    assert out2["APl"] == pytest.approx(1.0)
    assert out2["APs"] == pytest.approx(0.0)


def test_size_ap_ignores_unmatched_out_of_stratum_detections():
    """pycocotools dtIg-by-area: a spurious LARGE detection must not count
    as a false positive for APs (review r3 protocol fix)."""
    small = [4.0, 4.0, 20.0, 20.0]
    spurious_large = [100.0, 100.0, 300.0, 300.0]   # overlaps nothing
    gt = [("f0", np.array([small]), np.array([0]))]
    pred = [("f0", np.array([spurious_large, small]),
             np.array([0.95, 0.9]), np.array([0, 0]))]
    out = evaluate_detections(pred, gt, num_classes=1)
    # APs: the large spurious det is ignored-by-area, small GT matched -> 1.0
    assert out["APs"] == pytest.approx(1.0)
    # overall mAP still penalizes the spurious detection
    assert out["mAP"] < 1.0
