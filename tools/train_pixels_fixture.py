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
"""
import json
import os

import jax
import numpy as np

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


def main(steps: int = 800, batch_size: int = 16, seed: int = 0):
    from flax import serialization

    cfg = Config(
        detector=PIXELS_DET,
        train=TrainConfig(batch_size=batch_size, learning_rate=3e-3,
                          warmup_steps=50, total_steps=steps,
                          weight_decay=1e-5),
    )
    rng = np.random.default_rng(seed)
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(seed),
                                 batch_size=batch_size)
    for step in range(steps):
        batch = random_rect_batch(rng, batch_size)
        state, metrics = trainer.train_step(state, batch)
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(metrics['loss']):.4f}",
                  flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    runner = DetectorRunner(PIXELS_DET)
    held_out = random_rect_batch(np.random.default_rng(10_000), 16)
    rec = recall_at_iou(runner.detect(variables, held_out["images"]),
                        held_out)
    print(f"held-out recall@0.5: {rec:.3f}")
    assert rec >= 0.8, f"fixture under-trained: recall {rec:.3f}"

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    out = os.path.join(FIXTURE_DIR, "pixels_detector.msgpack")
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    meta = {"detector": {k: getattr(PIXELS_DET, k) for k in (
        "backbone", "image_size", "fpn_channels", "fpn_levels",
        "head_depth", "head_channels", "pre_nms_topk", "nms_topk",
        "max_detections", "embed_dim", "dtype", "score_threshold")},
        "steps": steps, "batch_size": batch_size, "seed": seed,
        "held_out_recall_at_0.5": round(float(rec), 4)}
    with open(os.path.join(FIXTURE_DIR, "pixels_detector.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
