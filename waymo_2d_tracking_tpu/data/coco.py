"""COCO-format conversion + training data iterator (component C4).

The reference converts Waymo labels to a COCO detection dataset to train its
detector (SURVEY.md §2 C4 [RECALLED]). Same here: segments (tfrecord or
directory format, data/waymo.py) -> a COCO ``annotations.json`` + image
files; plus a batched iterator that feeds train/train.py.
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Sequence, Tuple

import numpy as np

# internal class ids: 0 vehicle, 1 pedestrian, 2 cyclist
WAYMO_TYPE_TO_CLASS = {1: 0, 2: 1, 4: 2}
CATEGORIES = [
    {"id": 1, "name": "vehicle"},
    {"id": 2, "name": "pedestrian"},
    {"id": 3, "name": "cyclist"},
]


def convert_segments_to_coco(segments_dir: str, out_dir: str) -> int:
    """Waymo segments -> COCO dataset dir (images/ + annotations.json)."""
    from waymo_2d_tracking_tpu.data import waymo
    from waymo_2d_tracking_tpu.io_out import submission as subm

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    images, annotations = [], []
    img_id = ann_id = 0

    for entry in sorted(os.listdir(segments_dir)):
        full = os.path.join(segments_dir, entry)
        if entry.endswith(".tfrecord"):
            for rec in waymo.read_tfrecord(full):
                fr = waymo.parse_frame(rec)
                for cam, jpeg in fr["images"].items():
                    if not jpeg:
                        continue
                    img_id += 1
                    fname = f"{img_id:08d}.jpg"
                    with open(os.path.join(out_dir, "images", fname), "wb") as f:
                        f.write(jpeg)
                    images.append({"id": img_id, "file_name": fname,
                                   "context": fr["context_name"] or entry})
                    for lab in fr["labels"].get(cam, []):
                        x1, y1, x2, y2 = lab["xyxy"]
                        ann_id += 1
                        annotations.append({
                            "id": ann_id, "image_id": img_id,
                            "category_id": WAYMO_TYPE_TO_CLASS.get(lab["type"], 0) + 1,
                            "bbox": [x1, y1, x2 - x1, y2 - y1],
                            "area": (x2 - x1) * (y2 - y1),
                            "iscrowd": 0,
                            "track_id": lab["id"],
                        })
        elif os.path.isdir(full) and os.path.exists(os.path.join(full, "meta.json")):
            meta = json.load(open(os.path.join(full, "meta.json")))
            labels_path = os.path.join(full, "labels.jsonl")
            by_frame = {}
            if os.path.exists(labels_path):
                for r in subm.read_jsonl(labels_path):
                    by_frame.setdefault((r.timestamp_micros, r.camera_name), []).append(r)
            for t, ts in enumerate(meta["timestamps"]):
                for cam_name, cam_id in meta["cameras"].items():
                    src = os.path.join(full, "frames", f"{t}_{cam_id}.jpg")
                    if not os.path.exists(src):
                        continue
                    img_id += 1
                    fname = f"{img_id:08d}.jpg"
                    with open(src, "rb") as fi, open(
                        os.path.join(out_dir, "images", fname), "wb"
                    ) as fo:
                        fo.write(fi.read())
                    images.append({"id": img_id, "file_name": fname,
                                   "context": meta["context_name"]})
                    for r in by_frame.get((ts, cam_id), []):
                        x1, y1, x2, y2 = r.to_xyxy()
                        ann_id += 1
                        annotations.append({
                            "id": ann_id, "image_id": img_id,
                            "category_id": WAYMO_TYPE_TO_CLASS.get(r.object_type, 0) + 1,
                            "bbox": [x1, y1, x2 - x1, y2 - y1],
                            "area": (x2 - x1) * (y2 - y1),
                            "iscrowd": 0,
                            "track_id": r.object_id,
                        })

    with open(os.path.join(out_dir, "annotations.json"), "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": CATEGORIES},
            f,
        )
    return img_id


class CocoTrainDataset:
    """Decoded+augmented training batches from a COCO dataset dir.

    ``make_batch(batch_index)`` is pure in the batch index (a fresh
    ``np.random.default_rng((seed, batch_index))`` drives sampling and every
    augmentation draw), so batches are deterministic REGARDLESS of how many
    workers produce them or in what order — the property the parallel input
    pipeline below relies on.

    Augmentation (round 2, VERDICT r1 missing #4 — the competition-standard
    pipeline): random horizontal flip; multi-scale jitter (``scale_range``
    multiplies the letterbox scale; upscaled images are randomly cropped to
    the canvas, downscaled ones randomly placed — which doubles as
    translation aug); photometric jitter (brightness/contrast/saturation
    each in 1 +- ``color_jitter``). Boxes are transformed with the geometry
    and dropped when they shrink below ``min_box_px`` on either side.
    """

    def __init__(
        self,
        coco_dir: str,
        batch_size: int,
        image_hw: Tuple[int, int],
        max_gt: int = 64,
        seed: int = 0,
        flip_augment: bool = True,
        scale_range: Tuple[float, float] = (1.0, 1.0),
        color_jitter: float = 0.0,
        min_box_px: float = 2.0,
        sample_by_context: bool = False,
    ):
        with open(os.path.join(coco_dir, "annotations.json")) as f:
            coco = json.load(f)
        self.anns_by_img: dict = {}
        # Intern track ids NAMESPACED by the image's segment context — the
        # same id string in two segments labels two different physical
        # objects (materialize_directory_segment reuses obj0/obj1...), and
        # aliasing them would corrupt the ReID metric signal. `is not None`
        # (not truthiness): integer id 0 is a valid track.
        ctx_of_img = {im["id"]: im.get("context", "") for im in coco["images"]}
        self.track_id_intern: dict = {}
        for a in coco["annotations"]:
            self.anns_by_img.setdefault(a["image_id"], []).append(a)
            tid = a.get("track_id")
            if tid is not None and tid != "":
                key = (ctx_of_img.get(a["image_id"], ""), tid)
                self.track_id_intern.setdefault(key, len(self.track_id_intern))
        self._ctx_of_img = ctx_of_img
        self.items = [(im["id"], im["file_name"]) for im in coco["images"]]
        # context-local sampling (identity-aware batching): the triplet
        # loss needs the SAME identity to recur within a batch; uniform
        # sampling over a multi-segment corpus almost never delivers that.
        # When enabled, each batch draws all its frames from ONE context.
        self.sample_by_context = sample_by_context
        self._items_by_ctx: dict = {}
        for i, im in enumerate(coco["images"]):
            self._items_by_ctx.setdefault(im.get("context", ""), []).append(i)
        self.coco_dir = coco_dir
        self.batch_size = batch_size
        self.image_hw = image_hw
        self.max_gt = max_gt
        self.seed = seed
        self.flip_augment = flip_augment
        self.scale_range = scale_range
        self.color_jitter = color_jitter
        self.min_box_px = min_box_px

    def make_batch(self, batch_index: int) -> dict:
        """One host-side batch (numpy pytree): decode, augment, letterbox."""
        import cv2

        rng = np.random.default_rng((self.seed, batch_index))
        batch_size, max_gt = self.batch_size, self.max_gt
        hd, wd = self.image_hw
        items, anns_by_img = self.items, self.anns_by_img
        if self.sample_by_context:
            ctx = sorted(self._items_by_ctx)[
                int(rng.integers(len(self._items_by_ctx)))
            ]
            pool = self._items_by_ctx[ctx]
            idx = rng.choice(pool, size=batch_size,
                             replace=len(pool) < batch_size)
        else:
            idx = rng.choice(len(items), size=batch_size,
                             replace=len(items) < batch_size)
        images = np.zeros((batch_size, hd, wd, 3), np.float32)
        gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
        gt_classes = np.zeros((batch_size, max_gt), np.int32)
        gt_valid = np.zeros((batch_size, max_gt), bool)
        gt_track_ids = np.full((batch_size, max_gt), -1, np.int32)
        for n, i in enumerate(idx):
            img_id, fname = items[i]
            bgr = cv2.imread(os.path.join(self.coco_dir, "images", fname))
            rgb = bgr[:, :, ::-1].astype(np.float32) / 255.0
            hs, ws = rgb.shape[:2]
            scale = min(hd / hs, wd / ws) * float(rng.uniform(*self.scale_range))
            eh, ew = max(int(round(hs * scale)), 1), max(int(round(ws * scale)), 1)
            resized = cv2.resize(rgb, (ew, eh), interpolation=cv2.INTER_LINEAR)
            if self.color_jitter > 0.0:
                cj = self.color_jitter
                resized = resized * (1.0 + rng.uniform(-cj, cj))      # brightness
                mean = resized.mean()
                resized = (resized - mean) * (1.0 + rng.uniform(-cj, cj)) + mean
                gray = resized.mean(axis=2, keepdims=True)            # saturation
                resized = gray + (resized - gray) * (1.0 + rng.uniform(-cj, cj))
                resized = np.clip(resized, 0.0, 1.0)
            flip = self.flip_augment and rng.uniform() < 0.5
            if flip:
                resized = resized[:, ::-1]
            # random placement (small image) / random crop (large image)
            ox = (int(rng.integers(0, wd - ew + 1)) if ew <= wd
                  else -int(rng.integers(0, ew - wd + 1)))
            oy = (int(rng.integers(0, hd - eh + 1)) if eh <= hd
                  else -int(rng.integers(0, eh - hd + 1)))
            sx, sy = max(-ox, 0), max(-oy, 0)
            dx, dy = max(ox, 0), max(oy, 0)
            cw = min(ew - sx, wd - dx)
            ch = min(eh - sy, hd - dy)
            images[n, dy : dy + ch, dx : dx + cw] = resized[sy : sy + ch, sx : sx + cw]

            g = 0
            for a in anns_by_img.get(img_id, []):
                if g >= max_gt:
                    break
                x, y, w, h = a["bbox"]
                x1, y1, x2, y2 = x * scale, y * scale, (x + w) * scale, (y + h) * scale
                if flip:
                    x1, x2 = ew - x2, ew - x1
                x1, x2 = np.clip([x1 + ox, x2 + ox], 0.0, float(wd))
                y1, y2 = np.clip([y1 + oy, y2 + oy], 0.0, float(hd))
                if x2 - x1 < self.min_box_px or y2 - y1 < self.min_box_px:
                    continue  # cropped away / degenerate
                gt_boxes[n, g] = [x1, y1, x2, y2]
                gt_classes[n, g] = a["category_id"] - 1
                gt_valid[n, g] = True
                gt_track_ids[n, g] = self.track_id_intern.get(
                    (self._ctx_of_img.get(img_id, ""), a.get("track_id")), -1
                )
                g += 1
        # normalize like data/preprocess
        from waymo_2d_tracking_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

        images = (images - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32
        )
        return {
            "images": images,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "gt_track_ids": gt_track_ids,
        }

    def batches(self, num_workers: int = 0) -> Iterator[dict]:
        """Infinite ordered batch stream; ``num_workers`` > 0 decodes and
        augments in a thread pool with a bounded look-ahead window (cv2
        releases the GIL in imread/resize, so workers overlap for real).
        Same batches in the same order for any worker count."""
        if num_workers <= 0:
            i = 0
            while True:
                yield self.make_batch(i)
                i += 1
            return
        from concurrent.futures import ThreadPoolExecutor

        window = num_workers + 2
        with ThreadPoolExecutor(num_workers) as pool:
            pending = {i: pool.submit(self.make_batch, i)
                       for i in range(window)}
            i = 0
            while True:
                batch = pending.pop(i).result()
                pending[i + window] = pool.submit(self.make_batch, i + window)
                yield batch
                i += 1


def coco_batch_iterator(
    coco_dir: str,
    batch_size: int,
    image_hw: Tuple[int, int],
    max_gt: int = 64,
    seed: int = 0,
    flip_augment: bool = True,
    scale_range: Tuple[float, float] = (1.0, 1.0),
    color_jitter: float = 0.0,
    min_box_px: float = 2.0,
    num_workers: int = 0,
    prefetch_depth: int = 0,
    sample_by_context: bool = False,
) -> Iterator[dict]:
    """Infinite shuffled training batches (SURVEY.md §3.3 input pipeline).

    num_workers > 0: decode/augment in background threads (ordered,
    deterministic — see CocoTrainDataset.make_batch).
    prefetch_depth > 0: stage batches onto the device ahead of the train
    step via data/prefetch.DevicePrefetcher (overlaps H2D with compute).
    With both at 0 this is the round-2 synchronous behavior.
    """
    import jax.numpy as jnp

    ds = CocoTrainDataset(
        coco_dir, batch_size, image_hw, max_gt=max_gt, seed=seed,
        flip_augment=flip_augment, scale_range=scale_range,
        color_jitter=color_jitter, min_box_px=min_box_px,
        sample_by_context=sample_by_context,
    )
    gen = ds.batches(num_workers=num_workers)
    if prefetch_depth > 0:
        from waymo_2d_tracking_tpu.data.prefetch import DevicePrefetcher

        # context-managed: a train loop that stops after N steps (or dies)
        # releases the prefetch worker + the batch producer deterministically
        with DevicePrefetcher(gen, depth=prefetch_depth) as pf:
            yield from pf
        return
    try:
        for batch in gen:
            yield {k: jnp.asarray(v) for k, v in batch.items()}
    finally:
        gen.close()
