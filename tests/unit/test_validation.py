"""Held-out validation hook in the train loop (train.evaluate_detector +
train_loop val_batches/val_every/save_best)."""
import jax
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
from waymo_2d_tracking_tpu.train.train import (
    DetectorTrainer,
    evaluate_detector,
    train_loop,
)

pytestmark = pytest.mark.slow  # trainer + detect compiles

DET = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    head_depth=1, embed_dim=0, dtype="float32",
)


def test_val_hook_logs_and_saves_best(tmp_path):
    cfg = Config(
        detector=DET,
        train=TrainConfig(batch_size=2, warmup_steps=1, total_steps=20,
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    trainer = DetectorTrainer(cfg)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield render_detection_batch(rng, 2, DET.image_size)

    val_rng = np.random.default_rng(99)
    val = [render_detection_batch(val_rng, 2, DET.image_size)]
    lines = []
    state = train_loop(trainer, batches(), num_steps=4, log_every=100,
                       val_batches=val, val_every=2, log_fn=lines.append)
    val_lines = [l for l in lines if " val " in l]
    assert len(val_lines) == 2  # steps 2 and 4
    assert "mAP=" in val_lines[0]

    # best-mAP checkpoint exists and restores into the current state shape
    best = tmp_path / "ckpt" / "best"
    assert best.exists()
    restored = trainer.restore_checkpoint(str(best), state)
    assert int(np.asarray(restored.step)) >= 1

    # evaluate_detector returns the AP summary directly too
    res = evaluate_detector(trainer, state, val)
    assert set(res) >= {"mAP", "AP50"}
    assert np.isfinite(res["mAP"])
