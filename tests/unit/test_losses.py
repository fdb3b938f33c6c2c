"""Unit tests for train/losses.py (FCOS target assignment + losses)."""
import numpy as np
import pytest
import jax.numpy as jnp

from waymo_2d_tracking_tpu.train.losses import (
    assign_targets_level,
    giou_loss,
    level_locations,
    sigmoid_focal_loss,
)


def test_level_locations():
    locs = np.asarray(level_locations(2, 3, stride=8))
    assert locs.shape == (6, 2)
    np.testing.assert_allclose(locs[0], [4.0, 4.0])   # (x, y) of (0,0)
    np.testing.assert_allclose(locs[1], [12.0, 4.0])  # row-major over W
    np.testing.assert_allclose(locs[3], [4.0, 12.0])


def test_assignment_inside_box_and_range():
    locs = level_locations(4, 4, stride=8)  # centers at 4..28
    gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    cls_t, ltrb_t, ctr_t = assign_targets_level(
        locs, gt, jnp.asarray([2]), jnp.asarray([True]), (0.0, 64.0)
    )
    cls_t = np.asarray(cls_t)
    assert (cls_t == 2).all()  # every location inside the box
    # ltrb at location (4,4): l=4, t=4, r=28, b=28
    np.testing.assert_allclose(np.asarray(ltrb_t[0]), [4, 4, 28, 28])
    # centerness highest at the central locations
    ctr = np.asarray(ctr_t).reshape(4, 4)
    assert ctr[1, 1] > ctr[0, 0]


def test_assignment_out_of_range_is_background():
    locs = level_locations(4, 4, stride=8)
    gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    # level range excludes this box (max reg ~28 < 64)
    cls_t, _, _ = assign_targets_level(
        locs, gt, jnp.asarray([0]), jnp.asarray([True]), (64.0, 128.0)
    )
    assert (np.asarray(cls_t) == -1).all()


def test_assignment_smallest_area_wins():
    locs = level_locations(4, 4, stride=8)
    gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0], [8.0, 8.0, 24.0, 24.0]])
    cls_t, _, _ = assign_targets_level(
        locs, gt, jnp.asarray([0, 1]), jnp.asarray([True, True]), (0.0, 64.0)
    )
    c = np.asarray(cls_t).reshape(4, 4)
    assert c[1, 1] == 1  # center location inside both -> smaller box
    assert c[0, 0] == 0  # corner only inside big box


def test_invalid_gt_ignored():
    locs = level_locations(4, 4, stride=8)
    gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    cls_t, _, _ = assign_targets_level(
        locs, gt, jnp.asarray([0]), jnp.asarray([False]), (0.0, 64.0)
    )
    assert (np.asarray(cls_t) == -1).all()


def test_focal_loss_focuses_on_hard():
    logits = jnp.asarray([10.0, -10.0])     # confident right, confident wrong
    targets = jnp.asarray([1.0, 1.0])
    loss = np.asarray(sigmoid_focal_loss(logits, targets))
    assert loss[1] > 100 * loss[0]


def test_giou_perfect_and_disjoint():
    p = jnp.asarray([[4.0, 4.0, 4.0, 4.0]])
    assert abs(float(giou_loss(p, p)[0])) < 1e-6
    worse = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    assert float(giou_loss(worse, p)[0]) > 0.1


@pytest.mark.slow
def test_ema_params_track_with_warmup_ramp():
    """EMA follows the bias-corrected ramp min(d, (1+t)/(10+t)) and lands
    strictly between the initial and current params (train.ema_decay)."""
    import jax
    import numpy as np

    from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
    from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer

    det = DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=0, dtype="float32",
    )
    cfg = Config(detector=det,
                 train=TrainConfig(batch_size=2, warmup_steps=1,
                                   total_steps=20, ema_decay=0.9))
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=2)
    p0 = jax.device_get(state.params)
    batch = render_detection_batch(np.random.default_rng(0), 2, det.image_size)

    # manual EMA replay oracle
    ema_ref = p0
    for t in range(5):
        state, _ = trainer.train_step(state, batch)
        d_t = min(0.9, (1.0 + (t + 1)) / (10.0 + (t + 1)))
        params_now = jax.device_get(state.params)
        ema_ref = jax.tree.map(
            lambda e, p, d=d_t: e * d + p * (1.0 - d), ema_ref, params_now
        )
    got = jax.device_get(state.ema_params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    # eval_variables returns the EMA (not raw) params when enabled
    ev = trainer.eval_variables(state)
    leaf_ev = jax.tree.leaves(ev["params"])[0]
    leaf_ema = jax.tree.leaves(state.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(leaf_ev), np.asarray(leaf_ema))


@pytest.mark.slow
def test_ema_disabled_keeps_empty_pytree():
    import jax
    import numpy as np

    from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
    from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer

    det = DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=0, dtype="float32",
    )
    cfg = Config(detector=det, train=TrainConfig(batch_size=2, warmup_steps=1))
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=2)
    batch = render_detection_batch(np.random.default_rng(0), 2, det.image_size)
    state, _ = trainer.train_step(state, batch)
    assert jax.tree.leaves(state.ema_params) == []
    ev = trainer.eval_variables(state)
    assert jax.tree.leaves(ev["params"])  # raw params, non-empty


def test_sgd_optimizer_option_learns_and_rejects_typos():
    import numpy as np
    import pytest

    from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
    from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer, make_optimizer
    import jax

    det = DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=0, dtype="float32",
    )
    cfg = Config(detector=det,
                 train=TrainConfig(batch_size=2, warmup_steps=1,
                                   total_steps=20, optimizer="sgd",
                                   learning_rate=1e-2))
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=2)
    batch = render_detection_batch(np.random.default_rng(0), 2,
                                   det.image_size)
    losses = []
    for _ in range(4):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]   # sgd actually descends

    with pytest.raises(ValueError, match="optimizer"):
        make_optimizer(TrainConfig(optimizer="adamw2"))
