"""Round-3 train input-pipeline measurement (VERDICT r2 missing #3):
steps/sec of the real train step on the chip with the synchronous round-2
iterator vs the round-3 worker+prefetch pipeline.

NOTE on this container: the host exposes ONE core, so decode/augment
workers cannot parallelize against each other — the measurable win here is
overlapping host work with DEVICE compute (sync = t_host + t_step vs
pipelined ~= max(t_host, t_step)). On a real multi-core TPU host the same
code scales the host side by the worker count.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_train_input.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_coco(tmp, n_images=64, hw=(512, 768)):
    import cv2

    img_dir = os.path.join(tmp, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        img = rng.integers(0, 60, hw + (3,), np.uint8)
        for k in range(6):
            x1 = int(rng.integers(0, hw[1] - 80))
            y1 = int(rng.integers(0, hw[0] - 60))
            w, h = int(rng.integers(30, 80)), int(rng.integers(20, 60))
            img[y1 : y1 + h, x1 : x1 + w] = rng.integers(100, 255, 3)
            ann_id += 1
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": 1,
                "bbox": [x1, y1, w, h], "area": w * h, "iscrowd": 0,
            })
        fname = f"{i + 1:08d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img[:, :, ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append({"id": i + 1, "file_name": fname})
    with open(os.path.join(tmp, "annotations.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "vehicle"}]}, f)
    return tmp


def main():
    import tempfile

    import jax

    from waymo_2d_tracking_tpu.config import Config, DetectorConfig, TrainConfig
    from waymo_2d_tracking_tpu.data.coco import coco_batch_iterator

    from waymo_2d_tracking_tpu.train.train import DetectorTrainer

    hw = (512, 768)
    batch = 16
    coco = build_coco(tempfile.mkdtemp(), n_images=64, hw=hw)
    cfg = Config(
        detector=DetectorConfig(
            backbone="resnet18", stem="s2d", image_size=hw, fpn_channels=128,
            fpn_levels=(3, 4, 5, 6), head_depth=2, head_channels=128,
            embed_dim=0,
        ),
        train=TrainConfig(batch_size=batch, warmup_steps=5, total_steps=100),
    )
    trainer = DetectorTrainer(cfg)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_size=batch)

    results = {}
    for name, workers, prefetch in (("sync_r2", 0, 0), ("pipelined_r3", 2, 2)):
        it = coco_batch_iterator(
            coco, batch, hw, num_workers=workers, prefetch_depth=prefetch,
            scale_range=(0.8, 1.25), color_jitter=0.2,
        )
        # warm: one step (compile) + let prefetch fill
        state, metrics = trainer.train_step(state, next(it))
        _ = float(jax.device_get(metrics["loss"]))
        n_steps = 12
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = trainer.train_step(state, next(it))
        _ = float(jax.device_get(metrics["loss"]))   # sync
        dt = (time.perf_counter() - t0) / n_steps
        results[name] = round(dt * 1e3, 1)
        it.close()
    results["overlap_gain_pct"] = round(
        100.0 * (results["sync_r2"] - results["pipelined_r3"])
        / results["sync_r2"], 1,
    )
    print(json.dumps({"train_step_ms_at_bs16_512x768": results}))


if __name__ == "__main__":
    main()
