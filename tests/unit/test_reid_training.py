"""ReID metric-learning training (round 3): the appearance tower gets a
training signal (batch-hard triplet over GT-box embeddings, driven by the
track ids the COCO conversion preserves) — previously it only ever carried
random init."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waymo_2d_tracking_tpu.train.losses import reid_triplet_loss


def test_triplet_loss_hand_case():
    # 4 embeddings in 2D: ids [0, 0, 1, 1]; a/b close, c/d close, pairs far
    e = jnp.asarray([
        [1.0, 0.0],
        [0.9363, 0.3511],   # ~20 deg from a
        [0.0, 1.0],
        [-0.3511, 0.9363],
    ])
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    embeds = e[None]                                  # (1, 4, 2)
    ids = jnp.asarray([[0, 0, 1, 1]])
    valid = jnp.ones((1, 4), bool)
    loss, count = reid_triplet_loss(embeds, ids, valid, margin=0.3)
    assert int(count) == 4
    # every anchor: hardest-pos dist ~0.0603, hardest-neg dist = 1 - cos to
    # the NEAREST other-id embedding; all hinge values are zero except none
    # (margin 0.3 < neg-pos gap) -> loss 0
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    # tighten the margin past the gap -> positive loss
    loss2, _ = reid_triplet_loss(embeds, ids, valid, margin=1.0)
    assert float(loss2) > 0.0


def test_supcon_loss_hand_cases():
    """Supervised contrastive (the round-5 default reid objective): low on
    separated identities, EXPENSIVE at collapse — the property batch-hard
    triplet lacks (its loss flatlines at the margin when embeddings
    collapse, which is exactly how the round-3/4 reid tower degenerated
    unnoticed; see train/losses.py reid_supcon_loss)."""
    from waymo_2d_tracking_tpu.train.losses import reid_supcon_loss

    e = jnp.asarray(
        [[1, 0], [0.9988, 0.05], [0, 1], [-0.05, 0.9988]], jnp.float32)
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    ids = jnp.asarray([[0, 0, 1, 1]])
    ok = jnp.ones((1, 4), bool)
    loss, cnt = reid_supcon_loss(e[None], ids, ok)
    assert int(cnt) == 4 and float(loss) < 0.01

    # fully collapsed embeddings: softmax over A(i) is uniform, so the
    # positive's log-probability is -log(|A|) = -log(3) per anchor
    ec = jnp.tile(jnp.asarray([[1.0, 0.0]]), (4, 1))
    loss_c, _ = reid_supcon_loss(ec[None], ids, ok)
    assert float(loss_c) == pytest.approx(np.log(3), abs=1e-4)

    # no positives / all-invalid: zero loss, zero count (safe to add)
    l0, c0 = reid_supcon_loss(e[None], jnp.asarray([[0, 1, 2, 3]]), ok)
    assert int(c0) == 0 and float(l0) == 0.0
    l1, c1 = reid_supcon_loss(
        e[None], jnp.full((1, 4), -1), jnp.zeros((1, 4), bool))
    assert int(c1) == 0 and float(l1) == 0.0

    # gradient must repel collapse: a small perturbation from collapse
    # should have finite, nonzero grad
    g = jax.grad(lambda x: reid_supcon_loss(x, ids, ok)[0])(e[None])
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_triplet_loss_masks_and_degenerate():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(2, 3, 8)).astype(np.float32)
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    ids = jnp.asarray([[0, 0, 1], [2, -1, 3]])
    valid = jnp.asarray([[True, True, True], [True, True, False]])
    loss, count = reid_triplet_loss(jnp.asarray(e), ids, valid)
    # active anchors: the two id-0 entries (ids 1/2/3 occur once -> no
    # positive; the -1 and invalid entries are excluded outright)
    assert int(count) == 2
    assert np.isfinite(float(loss))
    # all-invalid batch: zero loss, zero active (safe to add)
    loss0, count0 = reid_triplet_loss(
        jnp.asarray(e), jnp.full((2, 3), -1), jnp.zeros((2, 3), bool)
    )
    assert int(count0) == 0 and float(loss0) == 0.0


def _identity_separation(trainer, state, batch):
    """Mean cosine distance: same-id pairs vs different-id pairs of the
    GT-box embeddings under the current params."""
    from waymo_2d_tracking_tpu.models.detector import Detector

    (_head, embeds), _ = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], rois=batch["gt_boxes"],
        method=Detector.forward_train, mutable=["batch_stats"],
    )
    e = np.asarray(embeds, np.float64).reshape(-1, embeds.shape[-1])
    ids = np.asarray(batch["gt_track_ids"]).reshape(-1)
    ok = np.asarray(batch["gt_valid"]).reshape(-1) & (ids >= 0)
    e, ids = e[ok], ids[ok]
    d = 1.0 - e @ e.T
    same = ids[:, None] == ids[None, :]
    off = ~np.eye(len(ids), dtype=bool)
    return d[same & off].mean(), d[~same].mean()


@pytest.mark.slow
def test_reid_tower_learns_identities(tmp_path):
    """Train with reid_loss_weight on track-id-labeled colored-rectangle
    data: same-identity embedding distance must become much smaller than
    different-identity distance (it starts undifferentiated)."""
    import cv2

    from waymo_2d_tracking_tpu.config import (
        Config, DetectorConfig, TrainConfig,
    )
    from waymo_2d_tracking_tpu.data.coco import (
        CocoTrainDataset, convert_segments_to_coco,
    )
    from waymo_2d_tracking_tpu.data.waymo import materialize_directory_segment
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer

    # 8-frame segment, 3 objects with persistent distinct colors + motion
    rng = np.random.default_rng(0)
    colors = [(230, 40, 40), (40, 230, 40), (40, 40, 230)]
    frames = []
    labels = []
    T, HW = 8, (64, 96)
    for t in range(T):
        img = rng.integers(0, 40, HW + (3,), np.uint8)
        for k, col in enumerate(colors):
            x1 = 6 + 28 * k + 2 * t
            y1 = 12 + 6 * k
            x2, y2 = x1 + 18, y1 + 14
            img[y1:y2, x1:x2] = col
            labels.append(subm.TrackRecord.from_xyxy(
                "ctxR", 1000 * t, 1, f"obj{k}", 1, (x1, y1, x2, y2), 1.0))
        frames.append(img)
    data = str(tmp_path / "data")
    materialize_directory_segment(
        data, "ctxR", np.stack(frames), [1000 * t for t in range(T)],
        labels=labels,
    )
    coco = str(tmp_path / "coco")
    convert_segments_to_coco(data, coco)

    cfg = Config(
        detector=DetectorConfig(
            backbone="resnet18slim", image_size=HW, fpn_channels=32,
            fpn_levels=(3, 4, 5), head_depth=1, pre_nms_topk=32,
            max_detections=8, embed_dim=16, dtype="float32",
        ),
        train=TrainConfig(batch_size=6, learning_rate=2e-3, warmup_steps=10,
                          total_steps=120, reid_loss_weight=1.0,
                          aug_color_jitter=0.0, aug_scale_range=(1.0, 1.0)),
    )
    ds = CocoTrainDataset(coco, 6, HW, seed=1, flip_augment=True)
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=6)
    eval_batch = {k: jnp.asarray(v) for k, v in ds.make_batch(999).items()}

    same0, diff0 = _identity_separation(trainer, state, eval_batch)
    first_reid = last_reid = None
    for i in range(120):
        batch = {k: jnp.asarray(v) for k, v in ds.make_batch(i).items()}
        state, metrics = trainer.train_step(state, batch)
        r = float(metrics["reid_loss"])
        first_reid = first_reid if first_reid is not None else r
        last_reid = r
    same1, diff1 = _identity_separation(trainer, state, eval_batch)

    assert last_reid < first_reid * 0.5, (first_reid, last_reid)
    # trained: same-identity pairs pulled together, margins apart from others
    assert same1 < 0.25 * diff1, (same0, diff0, same1, diff1)
    # ...at a NON-DEGENERATE scale: the ratio alone passed for years of
    # rounds while the GN+GAP head collapsed every embedding to pairwise
    # distances ~1e-4 (ratio tests are scale-blind — round-5 lesson). A
    # learned metric must put different identities a real angle apart.
    assert diff1 > 0.2, (same1, diff1)
