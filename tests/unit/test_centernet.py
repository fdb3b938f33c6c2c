"""CenterNet head family (models/centernet.py): peak decode oracle,
target geometry, loss shape, and DetectorRunner integration."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.models.centernet import (
    centernet_loss,
    centernet_targets,
    gather_centernet_candidates_batched,
    gaussian_radius,
    heat_peaks,
)

CN = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    fpn_levels=(3, 4, 5), head_family="centernet", centernet_level=3,
    head_depth=1, pre_nms_topk=64, max_detections=16,
    embed_dim=0, dtype="float32", score_threshold=0.3,
)


def test_heat_peaks_suppresses_neighbors():
    prob = np.zeros((1, 8, 8, 1), np.float32)
    prob[0, 3, 3, 0] = 0.9
    prob[0, 3, 4, 0] = 0.7   # neighbor of the 0.9 peak -> suppressed
    prob[0, 6, 6, 0] = 0.5   # isolated -> kept
    out = np.asarray(heat_peaks(jnp.asarray(prob)))
    assert out[0, 3, 3, 0] == pytest.approx(0.9)
    assert out[0, 3, 4, 0] == 0.0
    assert out[0, 6, 6, 0] == pytest.approx(0.5)


def test_decode_oracle():
    """Hand-built head maps -> exact expected box through the gather path."""
    h, w, k, stride = 8, 12, 3, 8
    heat = np.full((1, h, w, k), -10.0, np.float32)
    wh = np.zeros((1, h, w, 2), np.float32)
    off = np.zeros((1, h, w, 2), np.float32)
    ci, cj, cls = 3, 5, 2
    heat[0, ci, cj, cls] = 4.0                      # sigmoid ~ 0.982
    wh[0, ci, cj] = np.log([4.0, 2.0])              # 32 x 16 px
    off[0, ci, cj] = [0.25, -0.1]
    cfg = dataclasses.replace(CN, pre_nms_topk=8)
    boxes, scores, classes = gather_centernet_candidates_batched(
        {3: (jnp.asarray(heat), jnp.asarray(wh), jnp.asarray(off))}, cfg
    )
    b = np.asarray(boxes)[0, 0]
    cx = (cj + 0.5 + 0.25) * stride
    cy = (ci + 0.5 - 0.1) * stride
    np.testing.assert_allclose(
        b, [cx - 16, cy - 8, cx + 16, cy + 8], atol=1e-4
    )
    assert float(scores[0, 0]) == pytest.approx(1 / (1 + np.exp(-4.0)), abs=1e-5)
    assert int(classes[0, 0]) == cls


def test_targets_geometry():
    h, w, stride, k = 16, 16, 8, 3
    gt_boxes = jnp.asarray([[44.0, 28.0, 76.0, 60.0],     # center (60, 44)
                            [0.0, 0.0, 0.0, 0.0]])        # invalid
    gt_classes = jnp.asarray([1, 0])
    gt_valid = jnp.asarray([True, False])
    heat_t, wh_t, off_t, loc, pos = centernet_targets(
        gt_boxes, gt_classes, gt_valid, h, w, stride, k
    )
    # center (60, 44) px -> feature (7.5, 5.5) -> cell (i=5, j=7), whose
    # center under the (j+0.5)*stride convention is exactly (60, 44)
    assert float(heat_t[5, 7, 1]) == 1.0            # exact 1 at the center
    assert float(np.asarray(heat_t)[..., 0].max()) == 0.0   # other classes empty
    assert float(np.asarray(heat_t)[..., 2].max()) == 0.0
    assert int(loc[0]) == 5 * w + 7
    np.testing.assert_allclose(np.asarray(wh_t)[0], np.log([4.0, 4.0]), atol=1e-5)
    # float center exactly on the cell center -> zero offset
    np.testing.assert_allclose(np.asarray(off_t)[0], [0.0, 0.0], atol=1e-5)
    assert bool(pos[0]) and not bool(pos[1])
    # invalid GT contributes nothing anywhere
    assert float(np.asarray(heat_t).sum()) == pytest.approx(
        np.asarray(heat_t)[..., 1].sum())


def test_gaussian_radius_monotone():
    r_small = float(gaussian_radius(jnp.float32(2.0), jnp.float32(2.0)))
    r_big = float(gaussian_radius(jnp.float32(20.0), jnp.float32(20.0)))
    assert 0.0 <= r_small < r_big


def test_loss_prefers_correct_prediction():
    rng = np.random.default_rng(0)
    h, w, k, stride = 8, 8, 3, 8
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])    # (1, 1, 4)
    gt_classes = jnp.asarray([[0]])
    gt_valid = jnp.asarray([[True]])
    heat_t, wh_t, off_t, loc, pos = centernet_targets(
        gt_boxes[0], gt_classes[0], gt_valid[0], h, w, stride, k
    )
    # "perfect" logits: +8 at positives, -8 elsewhere; exact wh/off maps
    perfect_heat = jnp.where(heat_t >= 1.0, 8.0, -8.0)[None]
    wh_map = jnp.zeros((1, h, w, 2)).reshape(1, -1, 2)
    wh_map = wh_map.at[0, loc[0]].set(wh_t[0]).reshape(1, h, w, 2)
    off_map = jnp.zeros((1, h, w, 2)).reshape(1, -1, 2)
    off_map = off_map.at[0, loc[0]].set(off_t[0]).reshape(1, h, w, 2)
    loss_good, m = centernet_loss(
        {3: (perfect_heat, wh_map, off_map)},
        gt_boxes, gt_classes, gt_valid, num_classes=k,
    )
    noise = jnp.asarray(rng.normal(0, 2, (1, h, w, k)).astype(np.float32))
    loss_bad, _ = centernet_loss(
        {3: (noise, wh_map * 0, off_map * 0)},
        gt_boxes, gt_classes, gt_valid, num_classes=k,
    )
    assert float(loss_good) < 0.1
    assert float(loss_bad) > float(loss_good) * 10
    assert int(m["num_pos"]) == 1


def test_detector_runner_centernet_smoke():
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    runner = DetectorRunner(CN, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0), batch_size=2)
    images = jnp.asarray(
        np.random.default_rng(0).random((2, 64, 96, 3), np.float32))
    dets = runner.detect(params, images)
    assert dets.boxes.shape == (2, 16, 4)
    assert dets.scores.shape == (2, 16)
    assert dets.valid.dtype == jnp.bool_


@pytest.mark.slow
def test_centernet_training_produces_working_detector():
    """Learning proof for the family: train on one rendered batch, then the
    detect path (peaks + NMS + thresholds) must find the planted boxes."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "integration"))
    from test_train_to_detect import _recall

    from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer

    cfg = Config(
        detector=CN,
        train=TrainConfig(batch_size=8, learning_rate=3e-3, warmup_steps=20,
                          total_steps=300, weight_decay=1e-5),
    )
    batch = render_detection_batch(np.random.default_rng(0), 8, CN.image_size)
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=8)
    runner = DetectorRunner(CN, interpret=True)
    untrained = {"params": state.params, "batch_stats": state.batch_stats}
    recall_untrained = _recall(runner.detect(untrained, batch["images"]), batch)

    first = last = None
    for _ in range(300):
        state, metrics = trainer.train_step(state, batch)
        loss = float(metrics["loss"])
        first = first if first is not None else loss
        last = loss
    assert last < first * 0.5, (first, last)

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    recall_trained = _recall(runner.detect(trained, batch["images"]), batch)
    assert recall_untrained <= 0.2, recall_untrained
    assert recall_trained >= 0.6, (recall_trained, recall_untrained, last)
