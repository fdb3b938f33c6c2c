"""End-to-end learning proof (C23 -> C5-C10): training actually produces a
detector whose *detect path* (forward + top-k + NMS + thresholds) finds the
objects — not just a decreasing loss scalar.

Trains the slim detector on one fixed rendered batch (overfit on purpose:
this checks the train->detect plumbing — params/batch_stats flow, score
calibration past the focal prior init, box decode geometry — not
generalization), then runs DetectorRunner.detect with the trained variables
and asserts recall@IoU0.5 over the planted boxes, which is ~0 untrained
(focal prior starts every score at ~0.01, below the 0.05 threshold).
"""
import dataclasses

import jax
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.train.train import DetectorTrainer


DET = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    fpn_levels=(3, 4, 5), head_depth=1, pre_nms_topk=64, max_detections=16,
    embed_dim=0, dtype="float32", score_threshold=0.3,
)


def _recall(dets, batch, iou_thr=0.5):
    """Fraction of planted GT boxes covered by a valid detection."""
    boxes = np.asarray(dets.boxes)
    valid = np.asarray(dets.valid)
    gt_boxes = np.asarray(batch["gt_boxes"])
    gt_valid = np.asarray(batch["gt_valid"])
    hits = total = 0
    for n in range(gt_boxes.shape[0]):
        for g in np.flatnonzero(gt_valid[n]):
            total += 1
            gb = gt_boxes[n, g]
            best = 0.0
            for d in np.flatnonzero(valid[n]):
                db = boxes[n, d]
                lt = np.maximum(gb[:2], db[:2])
                rb = np.minimum(gb[2:], db[2:])
                inter = np.prod(np.maximum(rb - lt, 0))
                union = (
                    np.prod(np.maximum(gb[2:] - gb[:2], 0))
                    + np.prod(np.maximum(db[2:] - db[:2], 0)) - inter
                )
                best = max(best, inter / union if union > 0 else 0.0)
            hits += best >= iou_thr
    return hits / max(total, 1)


@pytest.mark.slow
def test_training_produces_working_detector():
    cfg = Config(
        detector=DET,
        train=TrainConfig(batch_size=8, learning_rate=3e-3, warmup_steps=20,
                          total_steps=300, weight_decay=1e-5),
    )
    batch = render_detection_batch(np.random.default_rng(0), 8, DET.image_size)

    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=8)

    runner = DetectorRunner(DET, interpret=True)
    untrained_vars = {"params": state.params, "batch_stats": state.batch_stats}
    recall_untrained = _recall(runner.detect(untrained_vars, batch["images"]), batch)

    first_loss = last_loss = None
    for _ in range(300):
        state, metrics = trainer.train_step(state, batch)
        loss = float(metrics["loss"])
        first_loss = first_loss if first_loss is not None else loss
        last_loss = loss
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    trained_vars = {"params": state.params, "batch_stats": state.batch_stats}
    recall_trained = _recall(runner.detect(trained_vars, batch["images"]), batch)

    # untrained: focal prior keeps every score ~0.01 << 0.3 threshold
    assert recall_untrained <= 0.2, recall_untrained
    assert recall_trained >= 0.6, (recall_trained, recall_untrained, last_loss)
