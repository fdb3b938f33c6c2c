"""Distributed tests (SURVEY.md §4): training on the virtual 8-device CPU
mesh — grad sync via sharding annotations, loss decreases, replicated params
stay identical across devices.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
from waymo_2d_tracking_tpu.parallel import sharding as shd
from waymo_2d_tracking_tpu.train.train import DetectorTrainer

CFG = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=0, dtype="float32",
    ),
    train=TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=2,
                      total_steps=50),
)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def trainer_factory():
    mesh = shd.make_mesh()
    trainer = DetectorTrainer(CFG, mesh=mesh)
    state0 = trainer.create_state(jax.random.PRNGKey(0), batch_size=8)
    host_state = jax.device_get(state0)  # train_step donates its input

    def fresh_state():
        return shd.replicate(host_state, mesh)

    return trainer, fresh_state


@pytest.fixture()
def trainer_state(trainer_factory):
    trainer, fresh = trainer_factory
    return trainer, fresh()


@pytest.mark.slow
def test_sharded_train_step_runs_and_loss_decreases(trainer_state):
    trainer, state = trainer_state
    rng = np.random.default_rng(0)
    batch = render_detection_batch(rng, 8, (64, 96))
    losses = []
    for _ in range(12):
        state, metrics = trainer.train_step(state, batch)  # same batch: overfit
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_batch_sharded_over_data_axis(trainer_state):
    trainer, _ = trainer_state
    batch = render_detection_batch(np.random.default_rng(1), 8, (64, 96))
    sharded = shd.shard_batch(batch, trainer.mesh)
    spec = sharded["images"].sharding.spec
    assert spec[0] == shd.DATA_AXIS
    # 8 shards, one per device
    assert len(sharded["images"].addressable_shards) == 8
    assert sharded["images"].addressable_shards[0].data.shape[0] == 1


def test_params_replicated_after_step(trainer_state):
    trainer, state = trainer_state
    batch = render_detection_batch(np.random.default_rng(2), 8, (64, 96))
    state, _ = trainer.train_step(state, batch)
    leaf = jax.tree.leaves(state.params)[0]
    shards = leaf.addressable_shards
    assert len(shards) == 8
    first = np.asarray(shards[0].data)
    for s in shards[1:]:
        np.testing.assert_array_equal(first, np.asarray(s.data))


@pytest.mark.slow
def test_dp_equals_single_device():
    """Gradient math parity: one sharded step == one unsharded step."""
    mesh = shd.make_mesh()
    t_dp = DetectorTrainer(CFG, mesh=mesh)
    t_1 = DetectorTrainer(CFG, mesh=None)
    s_dp = t_dp.create_state(jax.random.PRNGKey(0), batch_size=8)
    s_1 = t_1.create_state(jax.random.PRNGKey(0), batch_size=8)
    batch = render_detection_batch(np.random.default_rng(3), 8, (64, 96))
    s_dp, m_dp = t_dp.train_step(s_dp, batch)
    s_1, m_1 = t_1.train_step(s_1, batch)
    assert abs(float(m_dp["loss"]) - float(m_1["loss"])) < 1e-3
    a = jax.tree.leaves(s_dp.params)[0]
    b = jax.tree.leaves(s_1.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_sharded_train_step_with_remat(trainer_state):
    """Per-block remat (TrainConfig.remat) composes with the pjit
    data-parallel step: gradients sync and the step runs on the mesh."""
    import dataclasses

    trainer, _ = trainer_state
    cfg = dataclasses.replace(CFG, train=dataclasses.replace(
        CFG.train, remat=True))
    mesh = shd.make_mesh()
    tr = DetectorTrainer(cfg, mesh=mesh)
    state = tr.create_state(jax.random.PRNGKey(0), batch_size=8)
    rng = np.random.default_rng(0)
    batch = render_detection_batch(rng, 8, cfg.detector.image_size)
    for _ in range(2):
        state, metrics = tr.train_step(state, batch)
    loss = float(jax.device_get(metrics)["loss"])
    assert np.isfinite(loss)
    # params stay replicated bit-identically across the 8 devices
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
