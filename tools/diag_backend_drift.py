"""Diagnose the seed-5 CPU<->TPU pixels-golden divergence (VERDICT r4 Weak #3).

The same trained fixture measures different MOTA per backend on the seed-5
clip while the dense-occlusion clip is bit-identical — so the drift is
specific and bisectable. This tool runs the EXACT golden preprocessing
(device letterbox, chunked like SegmentPipeline) + detector forward on the
current jax backend and dumps artifacts for cross-backend comparison:

  1. --dump-dets out.npz       per-frame detections (boxes/scores/valid)
  2. --compare-dets cpu.npz tpu.npz
         per-frame score deltas, which detections flip the tracker's
         0.55 (participate) / 0.65 (birth) gates, worst frames
  3. --dump-inter out.npz --frames 3,17   full per-layer intermediates
         (flax capture_intermediates) for the chosen frames
  4. --compare-inter cpu.npz tpu.npz
         per-stage max|delta| in module order — the first diverging stage

Usage:
  env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/diag_backend_drift.py --dump-dets /tmp/dets_cpu.npz
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_backend_drift.py --dump-dets /tmp/dets_tpu.npz
  python tools/diag_backend_drift.py --compare-dets /tmp/dets_cpu.npz /tmp/dets_tpu.npz
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

GATES = (0.55, 0.65)


def _setup():
    import jax

    from flax import serialization

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from golden.test_pixels_to_mota import CLIP, PIXELS_DET
    from waymo_2d_tracking_tpu.data.synthetic import render_video_clip
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "fixtures")
    runner = DetectorRunner(PIXELS_DET)
    template = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    with open(os.path.join(fixtures, "pixels_detector.msgpack"), "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    frames, _ = render_video_clip(CLIP)
    return runner, variables, frames, PIXELS_DET


def _letterbox(frames_u8, det_cfg, chunk=16):
    """Chunked exactly like SegmentPipeline (chunk_frames=16 in the golden)."""
    from waymo_2d_tracking_tpu.data.preprocess import letterbox_batch

    src_hw = frames_u8.shape[1:3]
    out = []
    for i in range(0, len(frames_u8), chunk):
        imgs, _ = letterbox_batch(
            frames_u8[i:i + chunk], tuple(src_hw),
            tuple(det_cfg.image_size),
        )
        out.append(np.asarray(imgs))
    return np.concatenate(out, 0)


def dump_dets(path):
    import jax

    runner, variables, frames, det_cfg = _setup()
    images = _letterbox(frames, det_cfg)
    boxes, scores, classes, valids = [], [], [], []
    for i in range(0, len(images), 16):
        d = runner.detect(variables, images[i:i + 16])
        boxes.append(np.asarray(d.boxes)); scores.append(np.asarray(d.scores))
        classes.append(np.asarray(d.classes)); valids.append(np.asarray(d.valid))
    np.savez_compressed(
        path, backend=jax.default_backend(),
        boxes=np.concatenate(boxes), scores=np.concatenate(scores),
        classes=np.concatenate(classes), valid=np.concatenate(valids),
        # letterbox drift check rides along: cheap, full tensor
        images_sum=images.astype(np.float64).sum(axis=(1, 2, 3)),
        images_absmax=np.abs(images).max(axis=(1, 2, 3)),
    )
    print(f"wrote {path} [{jax.default_backend()}]")


def _match(boxes_a, valid_a, boxes_b, valid_b):
    """Greedy best-IoU matching of frame detections across backends."""
    ia = np.flatnonzero(valid_a)
    ib = np.flatnonzero(valid_b)
    if not len(ia) or not len(ib):
        return [], list(ia), list(ib)
    a, b = boxes_a[ia], boxes_b[ib]
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(a[:, 2:] - a[:, :2], -1)
    area_b = np.prod(b[:, 2:] - b[:, :2], -1)
    iou = inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)
    pairs, used_a, used_b = [], set(), set()
    for flat in np.argsort(-iou, axis=None):
        r, c = np.unravel_index(flat, iou.shape)
        if iou[r, c] < 0.5:
            break
        if r in used_a or c in used_b:
            continue
        used_a.add(r); used_b.add(c)
        pairs.append((ia[r], ib[c], iou[r, c]))
    only_a = [ia[r] for r in range(len(ia)) if r not in used_a]
    only_b = [ib[c] for c in range(len(ib)) if c not in used_b]
    return pairs, only_a, only_b


def compare_dets(path_a, path_b):
    A, B = np.load(path_a), np.load(path_b)
    t_total = A["scores"].shape[0]
    print(f"backends: {A['backend']} vs {B['backend']}")
    lb = np.abs(A["images_sum"] - B["images_sum"])
    print(f"letterbox sum |delta| max over frames: {lb.max():.6g} "
          f"(relative {lb.max() / np.abs(A['images_sum']).max():.3g})")
    flips = {g: 0 for g in GATES}
    unmatched = 0
    max_ds = 0.0
    per_frame = []
    for t in range(t_total):
        pairs, only_a, only_b = _match(
            A["boxes"][t], A["valid"][t], B["boxes"][t], B["valid"][t]
        )
        f_cnt = len(only_a) + len(only_b)
        unmatched += f_cnt
        ds_frame = 0.0
        for (i, j, _) in pairs:
            sa, sb = float(A["scores"][t, i]), float(B["scores"][t, j])
            ds_frame = max(ds_frame, abs(sa - sb))
            for g in GATES:
                if (sa >= g) != (sb >= g):
                    flips[g] += 1
                    f_cnt += 1
        max_ds = max(max_ds, ds_frame)
        per_frame.append((t, ds_frame, f_cnt))
    print(f"max matched |score delta| over clip: {max_ds:.5f}")
    print(f"gate flips (matched dets disagreeing about the gate): "
          f"{ {g: flips[g] for g in GATES} }")
    print(f"unmatched detections (exist on one backend only): {unmatched}")
    worst = sorted(per_frame, key=lambda x: (-x[2], -x[1]))[:8]
    print("worst frames (t, max score delta, flip+unmatched count):")
    for t, ds, fc in worst:
        print(f"  t={t:3d} ds={ds:.5f} flips={fc}")
    print(json.dumps({
        "max_score_delta": round(max_ds, 5),
        "gate_flips": {str(g): flips[g] for g in GATES},
        "unmatched": unmatched,
    }))


def dump_inter(path, frame_ids):
    import jax

    runner, variables, frames, det_cfg = _setup()
    images = _letterbox(frames, det_cfg)
    sel = images[frame_ids]
    # capture every module output on the inference forward
    (head_out, p_feats), state = runner.module.apply(
        variables, sel, capture_intermediates=True,
        mutable=["intermediates"],
    )
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}")
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}.{i}")
        else:
            flat[prefix] = np.asarray(tree, np.float32)

    walk(state["intermediates"], "")
    walk({f"P{k}": v for k, v in p_feats.items()}, "/zz_fpn_out")
    walk({f"head_L{k}": v for k, v in head_out.items()}, "/zz_head_out")
    np.savez_compressed(path, backend=jax.default_backend(),
                        frame_ids=np.asarray(frame_ids), **flat)
    print(f"wrote {path} ({len(flat)} tensors) [{jax.default_backend()}]")


def compare_inter(path_a, path_b):
    A, B = np.load(path_a), np.load(path_b)
    keys = [k for k in A.files if k not in ("backend", "frame_ids")]
    rows = []
    for k in sorted(keys):
        if k not in B.files:
            continue
        a, b = A[k].astype(np.float64), B[k].astype(np.float64)
        if a.shape != b.shape:
            rows.append((k, float("nan"), float("nan")))
            continue
        d = np.abs(a - b)
        denom = max(np.abs(a).max(), 1e-12)
        rows.append((k, d.max(), d.max() / denom))
    print(f"{'stage':70s} {'max|d|':>12s} {'rel':>10s}")
    for k, dmax, rel in rows:
        print(f"{k:70s} {dmax:12.6g} {rel:10.3g}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dump-dets")
    p.add_argument("--compare-dets", nargs=2)
    p.add_argument("--dump-inter")
    p.add_argument("--frames", default="0")
    p.add_argument("--compare-inter", nargs=2)
    args = p.parse_args()
    if args.dump_dets:
        dump_dets(args.dump_dets)
    if args.compare_dets:
        compare_dets(*args.compare_dets)
    if args.dump_inter:
        dump_inter(args.dump_inter,
                   [int(x) for x in args.frames.split(",")])
    if args.compare_inter:
        compare_inter(*args.compare_inter)


if __name__ == "__main__":
    main()
