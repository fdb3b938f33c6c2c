"""Rematerialized training (TrainConfig.remat -> per-block nn.remat).

Remat replays each residual block's forward during backward; XLA may
reassociate reductions in the replay, so gradients agree to float tolerance
(not bitwise). The win (−28-30% peak temp HBM for +10% step time at
r34@512x768, measured on-chip) is recorded in BASELINE.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
from waymo_2d_tracking_tpu.models.detector import Detector
from waymo_2d_tracking_tpu.train.train import DetectorTrainer

pytestmark = pytest.mark.slow  # several full model/trainer compiles

DET = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    head_depth=1, embed_dim=0, dtype="float32",
)


def _grads(remat: bool):
    model = Detector(DET, remat=remat)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 96, 3))
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs,
                           method=Detector.init_all)

    def loss(params):
        (head_out, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, method=Detector.forward_train, mutable=["batch_stats"],
        )
        return sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(head_out))

    return variables["params"], jax.device_get(jax.grad(loss)(
        variables["params"]))


def test_remat_gradients_match_plain_gradients():
    p_plain, g_plain = _grads(remat=False)
    p_remat, g_remat = _grads(remat=True)
    # identical init => identical param trees (remat preserves scope names)
    assert (jax.tree.structure(p_plain) == jax.tree.structure(p_remat))
    # float32 reassociation in the replayed blocks perturbs individual
    # entries where large contributions cancel; the meaningful equivalence
    # claim is the whole gradient vector
    a = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_plain)])
    b = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_remat)])
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    assert na > 0 and abs(na / nb - 1) < 1e-3
    cos = float(np.dot(a, b) / (na * nb))
    assert cos > 1 - 1e-6, cos
    assert np.linalg.norm(a - b) / na < 1e-3


def test_trainer_remat_step_runs_and_learns_shape():
    cfg = Config(detector=DET,
                 train=TrainConfig(batch_size=2, warmup_steps=1,
                                   total_steps=20, remat=True))
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=2)
    batch = render_detection_batch(np.random.default_rng(0), 2,
                                   DET.image_size)
    losses = []
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_grad_accum_matches_manual_micro_batch_oracle():
    """grad_accum_steps=2 must equal the manual composition: grads
    POSITIVES-WEIGHTED-averaged over sequential micro-batches with BN stats
    threaded through (review r4: a plain mean over micro-batches weights a
    sparse micro-batch's per-positive gradients above the accum=1 run,
    because the detection loss normalizes by each micro-batch's own
    num_pos — the weighted mean recovers sum(loss_sums)/total_pos, the
    full-batch objective). The rendered halves here have UNEQUAL positive
    counts, so a plain mean would fail this oracle."""
    import dataclasses

    cfg1 = Config(detector=DET,
                  train=TrainConfig(batch_size=4, warmup_steps=1,
                                    total_steps=20))
    cfg2 = Config(detector=DET,
                  train=TrainConfig(batch_size=4, warmup_steps=1,
                                    total_steps=20, grad_accum_steps=2))
    tr1 = DetectorTrainer(cfg1)
    tr2 = DetectorTrainer(cfg2)
    state = tr1.create_state(jax.random.PRNGKey(0), batch_size=4)
    batch = render_detection_batch(np.random.default_rng(0), 4,
                                   DET.image_size)
    # make the halves' positive counts VERY unequal: blank half 2's GT
    batch["gt_valid"] = np.asarray(batch["gt_valid"]).copy()
    batch["gt_valid"][2:, 1:] = False

    # manual oracle with the K=1 trainer: half 1 with initial stats, half 2
    # with half-1's updated stats; grads positives-weighted
    half = lambda s, e: {k: v[s:e] for k, v in batch.items()}  # noqa: E731
    g1, stats1, m1 = tr1._grads_and_stats(state.params, state.batch_stats,
                                          half(0, 2))
    g2, stats2, m2 = tr1._grads_and_stats(state.params, stats1, half(2, 4))
    w1 = max(float(m1["num_pos"]), 1.0)
    w2 = max(float(m2["num_pos"]), 1.0)
    assert abs(w1 - w2) > 4, (w1, w2)  # the oracle must exercise weighting
    want_g = jax.tree.map(lambda a, b: (w1 * a + w2 * b) / (w1 + w2), g1, g2)

    got_g, got_stats, got_m = tr2._grads_and_stats(
        state.params, state.batch_stats, batch)
    # scan-vs-separate-calls float32 reduction order: tolerance, not exact
    for a, b in zip(jax.tree.leaves(jax.device_get(want_g)),
                    jax.tree.leaves(jax.device_get(got_g))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(stats2)),
                    jax.tree.leaves(jax.device_get(got_stats))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    assert float(got_m["loss"]) == pytest.approx(
        (float(m1["loss"]) + float(m2["loss"])) / 2, rel=1e-5)

    # the full train step runs with accum on
    state2, metrics = tr2.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # indivisible batch errors at trace time
    cfg3 = Config(detector=DET,
                  train=TrainConfig(batch_size=3, warmup_steps=1,
                                    total_steps=20, grad_accum_steps=2))
    tr3 = DetectorTrainer(cfg3)
    bad = render_detection_batch(np.random.default_rng(0), 3, DET.image_size)
    with pytest.raises(ValueError, match="divisible"):
        tr3._grads_and_stats(state.params, state.batch_stats, bad)
