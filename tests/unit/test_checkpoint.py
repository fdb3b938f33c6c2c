"""Checkpoint/resume round-trip (C26, orbax)."""
import numpy as np
import jax
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
from waymo_2d_tracking_tpu.train.train import DetectorTrainer

CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=0, dtype="float32",
    ),
    train=TrainConfig(batch_size=2, warmup_steps=1, total_steps=10),
)


@pytest.mark.slow
def test_checkpoint_save_restore_resume(tmp_path):
    trainer = DetectorTrainer(CFG)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.default_rng(0)
    batch = render_detection_batch(rng, 2, (64, 96))
    state, _ = trainer.train_step(state, batch)
    state, _ = trainer.train_step(state, batch)

    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(state, path)

    template = trainer.create_state(jax.random.PRNGKey(1), batch_size=2)
    restored = trainer.restore_checkpoint(f"{path}/step_2", template)
    assert int(restored.step) == 2
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training resumes from the restored state
    restored2, metrics = trainer.train_step(restored, batch)
    assert int(restored2.step) == 3
    assert np.isfinite(float(metrics["loss"]))
