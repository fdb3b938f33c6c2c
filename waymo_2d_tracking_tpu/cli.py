"""Command-line entry points (component C25).

Mirrors the reference's script surface (convert / train / detect / track /
submit / eval / bench — SURVEY.md §1.1 L6) as subcommands:

  python -m waymo_2d_tracking_tpu.cli track --config configs/config2_detector_iou.yaml \\
      --segments-dir DATA --out-dir OUT
  python -m waymo_2d_tracking_tpu.cli track --from-detections dets.jsonl --out sub.jsonl
  python -m waymo_2d_tracking_tpu.cli eval --pred sub.jsonl --gt gt.jsonl
  python -m waymo_2d_tracking_tpu.cli bench

Config: --config yaml preset (configs/ has the five BASELINE acceptance
presets) plus dotted overrides: --set tracker.max_age=5 detector.embed_dim=0
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def _parse_overrides(pairs: List[str]) -> dict:
    out: dict = {}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _load_config(args):
    from waymo_2d_tracking_tpu.config import load_config

    return load_config(args.config, _parse_overrides(args.set or []))


def _enable_compile_cache(args):
    """Persistent XLA compile cache for the jax-compiling verbs (track /
    detect / train / serve / link / export-savedmodel) so restarted
    processes — the serve daemon's failover path above all — skip
    recompilation. Resolution: --compile-cache > W2T_COMPILE_CACHE >
    ~/.cache/w2t/jax-cache; 'off' disables. Kept out of _load_config so
    jax-free verbs (eval and its process pool, submit, interp) never
    import jax."""
    from waymo_2d_tracking_tpu.utils.compile_cache import enable_compile_cache

    return enable_compile_cache(getattr(args, "compile_cache", None))


def cmd_track(args):
    _enable_compile_cache(args)
    cfg = _load_config(args)
    if args.from_detections:
        return _track_from_detections(cfg, args)
    if args.video:
        args.online = True  # a video file is inherently a stream
    if args.online:
        if args.sharded:
            raise SystemExit(
                "--online is a single-host serving path; it does not compose "
                "with --sharded (fan streams across processes instead, one "
                "OnlineTracker per chip)"
            )
        from waymo_2d_tracking_tpu.utils.profiling import trace

        with trace(args.profile):
            return _track_online(cfg, args)
    import jax

    from waymo_2d_tracking_tpu.pipeline.run import SegmentPipeline, run_segments
    from waymo_2d_tracking_tpu.data.waymo import iter_segments
    from waymo_2d_tracking_tpu.utils.profiling import trace

    if args.multicam:
        from waymo_2d_tracking_tpu.pipeline.multicam import MultiCamPipeline

        num_cams = len(cfg.pipeline.cameras)
        pipeline = MultiCamPipeline(cfg, num_cams=num_cams,
                                    rng=jax.random.PRNGKey(args.seed))
        if args.params:
            pipeline.params = _load_params(args.params)
        segs = iter_segments(args.segments_dir, cameras=cfg.pipeline.cameras)
        with trace(args.profile):
            if args.sharded:
                # contexts fanned across the mesh, one 5-camera context per
                # chip (the north-star deployment shape)
                from waymo_2d_tracking_tpu.pipeline.sharded import (
                    run_context_groups_sharded,
                )

                for s in run_context_groups_sharded(
                    pipeline, segs, args.out_dir,
                    fail_after=args.fail_after_n_segments,
                ):
                    print(json.dumps(s))
            else:
                from waymo_2d_tracking_tpu.pipeline.multicam import (
                    run_context_groups,
                )

                for s in run_context_groups(
                    pipeline, segs, args.out_dir,
                    fail_after=args.fail_after_n_segments,
                ):
                    print(json.dumps(s))
        return

    pipeline = SegmentPipeline(cfg, rng=jax.random.PRNGKey(args.seed))
    if args.params:
        pipeline.params = _load_params(args.params)
    segments = iter_segments(args.segments_dir, cameras=cfg.pipeline.cameras)
    with trace(args.profile):
        if args.sharded:
            from waymo_2d_tracking_tpu.pipeline.sharded import run_segments_sharded

            stats = run_segments_sharded(
                pipeline, segments, args.out_dir,
                fail_after=args.fail_after_n_segments,
            )
        else:
            stats = run_segments(pipeline, segments, args.out_dir,
                                 fail_after=args.fail_after_n_segments)
    for s in stats:
        print(json.dumps(s))


def _track_online(cfg, args):
    """Streaming serving path (pipeline/online.py): one frame per device
    dispatch instead of chunked batches. Same output files as the chunked
    driver; the per-segment stats line additionally reports the serving
    latency percentiles a deployment would see."""
    import os

    import jax

    from waymo_2d_tracking_tpu.data.waymo import iter_segments
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.io_out.postprocess import interpolate_gaps
    from waymo_2d_tracking_tpu.pipeline.online import OnlineTracker

    if args.multicam:
        return _track_online_multicam(cfg, args)
    sess = OnlineTracker(cfg, rng=jax.random.PRNGKey(args.seed))
    if args.params:
        sess.params = _load_params(args.params)
    os.makedirs(args.out_dir, exist_ok=True)
    warmed = None
    if args.video:
        # stream a plain video file through the same serving session
        from waymo_2d_tracking_tpu.data.video import iter_video_frames

        stem = os.path.splitext(os.path.basename(args.video))[0]
        sess.reset(clear_latency=True)
        sess.context_name = stem
        records, stamps = [], []
        for ts, frame in iter_video_frames(args.video):
            src_hw = tuple(frame.shape[:2])
            if warmed != src_hw:
                sess.warmup(src_hw)
                warmed = src_hw
            records.extend(sess.step(frame, ts))
            stamps.append(ts)
        records = interpolate_gaps(records, stamps,
                                   cfg.pipeline.interp_max_gap)
        out_file = os.path.join(args.out_dir, f"{stem}_1.jsonl")
        subm.write_jsonl(out_file, records)
        print(json.dumps({
            "context": stem, "camera": sess.camera_name,
            "frames": len(stamps), "records": len(records),
            "latency": sess.latency_stats(),
        }))
        return
    for seg in iter_segments(args.segments_dir, cameras=cfg.pipeline.cameras):
        # clear_latency: the stats line below reports THIS segment's
        # serving percentiles, not a cumulative all-segments window
        sess.reset(clear_latency=True)
        sess.context_name = seg.context_name
        sess.camera_name = seg.camera_name
        # compressed frames decode at decode_scale_denom inside the session
        # (same effective source resolution as the chunked drivers), so the
        # step compiles for the SCALED size; pre-decoded arrays pass through
        src_hw = (seg.scaled_hw(cfg.pipeline.decode_scale_denom)
                  if seg.jpeg_frames is not None else seg.source_hw())
        if warmed != src_hw:
            sess.warmup(src_hw)
            warmed = src_hw
        records = []
        frames = (seg.jpeg_frames if seg.jpeg_frames is not None
                  else list(seg.frames))
        for ts, frame in zip(seg.timestamps, frames):
            records.extend(sess.step(frame, ts))
        # same output contract as the chunked drivers: gap interpolation
        # (pipeline.interp_max_gap) applies to online output too
        records = interpolate_gaps(
            records, list(seg.timestamps), cfg.pipeline.interp_max_gap
        )
        out_file = os.path.join(
            args.out_dir, f"{seg.context_name}_{seg.camera_name}.jsonl"
        )
        subm.write_jsonl(out_file, records)
        print(json.dumps({
            "context": seg.context_name, "camera": seg.camera_name,
            "frames": seg.num_frames, "records": len(records),
            "latency": sess.latency_stats(),
        }))


def _track_online_multicam(cfg, args):
    """Streaming serving over a full camera rig (`--online --multicam`):
    each tick runs ALL cameras of a context through one shared-backbone
    detector batch with per-camera tracker states (OnlineMultiCamTracker —
    MultiCamPipeline's config-4 contract at T=1). Output files match the
    chunked multicam driver: one jsonl per (context, camera)."""
    import os

    import jax

    from waymo_2d_tracking_tpu.data.waymo import iter_segments
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.io_out.postprocess import interpolate_gaps
    from waymo_2d_tracking_tpu.pipeline.online import OnlineMultiCamTracker

    num_cams = len(cfg.pipeline.cameras)
    sess = OnlineMultiCamTracker(
        cfg, camera_names=list(range(1, num_cams + 1)),
        rng=jax.random.PRNGKey(args.seed),
    )
    if args.params:
        sess.params = _load_params(args.params)
    os.makedirs(args.out_dir, exist_ok=True)

    by_ctx = {}
    for seg in iter_segments(args.segments_dir, cameras=cfg.pipeline.cameras):
        by_ctx.setdefault(seg.context_name, []).append(seg)

    warmed = None
    for ctx in sorted(by_ctx):
        segs = sorted(by_ctx[ctx], key=lambda s: s.camera_name)
        if len(segs) != num_cams:
            raise ValueError(
                f"context {ctx} has {len(segs)} cameras, "
                f"config expects {num_cams} ({cfg.pipeline.cameras})"
            )
        # fail fast on misaligned cameras (same invariant as the chunked
        # multicam driver): real tfrecords can drop per-camera frames, and
        # indexing every camera by segs[0]'s timeline would silently pair
        # camera i's frame t with camera j's frame t+1
        ts0 = tuple(int(t) for t in segs[0].timestamps)
        for s in segs[1:]:
            if tuple(int(t) for t in s.timestamps) != ts0:
                raise SystemExit(
                    f"multicam context {ctx} needs aligned timestamps "
                    f"across cameras (camera {s.camera_name} differs from "
                    f"camera {segs[0].camera_name})"
                )
        sess.reset(clear_latency=True)
        sess.context_name = ctx
        sess.camera_names = [s.camera_name for s in segs]
        # compressed ticks decode at decode_scale_denom inside the session
        # (one batched native decode per tick) — warm at the scaled size
        src_hw = (segs[0].scaled_hw(cfg.pipeline.decode_scale_denom)
                  if segs[0].jpeg_frames is not None
                  else segs[0].source_hw())
        if warmed != src_hw:
            sess.warmup(src_hw)
            warmed = src_hw
        per_cam = [
            s.jpeg_frames if s.jpeg_frames is not None else list(s.frames)
            for s in segs
        ]
        records = []
        for t, ts in enumerate(segs[0].timestamps):
            records.extend(sess.step([fr[t] for fr in per_cam], ts))
        records = interpolate_gaps(
            records, list(ts0), cfg.pipeline.interp_max_gap
        )
        for s in segs:
            cam_records = [r for r in records if r.camera_name == s.camera_name]
            out_file = os.path.join(
                args.out_dir, f"{ctx}_{s.camera_name}.jsonl"
            )
            subm.write_jsonl(out_file, cam_records)
        print(json.dumps({
            "context": ctx, "cameras": [s.camera_name for s in segs],
            "frames": segs[0].num_frames, "records": len(records),
            "latency": sess.latency_stats(),
        }))


def _track_from_detections(cfg, args):
    """Config-1 path: tracker only, precomputed detections (runs on CPU too).

    Core lives in pipeline/offline.py (shared with `w2t tune`)."""
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.pipeline.offline import track_detection_rows

    try:
        records = track_detection_rows(cfg, subm.read_jsonl(args.from_detections))
    except ValueError as e:
        raise SystemExit(str(e))
    n = subm.write_jsonl(args.out, records)
    print(json.dumps({"records": n, "out": args.out}))


def cmd_detect(args):
    """Detection-only inference: writes per-frame detections JSONL."""
    _enable_compile_cache(args)
    import jax

    from waymo_2d_tracking_tpu.pipeline.run import SegmentPipeline
    from waymo_2d_tracking_tpu.data.waymo import iter_segments
    from waymo_2d_tracking_tpu.io_out import submission as subm

    cfg = _load_config(args)
    pipeline = SegmentPipeline(cfg, rng=jax.random.PRNGKey(args.seed))
    if args.params:
        pipeline.params = _load_params(args.params)
    if args.sharded:
        # detection fan-out across the mesh (stateless lockstep groups);
        # per-segment files land in --out-dir, merged into --out after
        import os as _os

        from waymo_2d_tracking_tpu.pipeline.sharded import (
            run_segments_sharded,
        )

        out_dir = args.out_dir or (args.out + ".d")
        # record this invocation's segment keys while the sharded runner
        # consumes the (lazy) iterator: the merge below must cover exactly
        # THESE segments — including manifest-resumed ones that get no
        # stats row — and not stale keys from an earlier run that reused
        # the out-dir with a different --segments-dir
        from waymo_2d_tracking_tpu.pipeline.manifest import segment_key

        seen_keys = []

        def _recording(it):
            for seg in it:
                seen_keys.append(
                    (seg.context_name, seg.camera_name))
                yield seg

        stats = run_segments_sharded(
            pipeline,
            _recording(iter_segments(args.segments_dir,
                                     cameras=cfg.pipeline.cameras)),
            out_dir, detections_only=True,
        )
        records = []
        for ctx, cam in seen_keys:
            seg_file = _os.path.join(out_dir, f"{ctx}_{cam}.jsonl")
            if not _os.path.exists(seg_file):
                raise FileNotFoundError(
                    f"detect --sharded: {seg_file} missing for completed "
                    f"segment {segment_key(ctx, cam)} — out-dir partially "
                    "cleaned? delete its manifest.jsonl line to recompute")
            records.extend(subm.read_jsonl(seg_file))
        for s in stats:
            print(json.dumps(s), file=sys.stderr)
    else:
        records = []
        for seg in iter_segments(args.segments_dir,
                                 cameras=cfg.pipeline.cameras):
            recs, stats = pipeline.run_segment(seg, detections_only=True)
            records.extend(recs)
            print(json.dumps(stats), file=sys.stderr)
    n = subm.write_jsonl(args.out, records)
    print(json.dumps({"records": n, "out": args.out}))


def cmd_submit(args):
    """Convert JSONL track outputs to the Waymo submission pb format."""
    from waymo_2d_tracking_tpu.io_out import submission as subm

    records = []
    for path in args.inputs:
        records.extend(subm.read_jsonl(path))
    n = subm.write_waymo_pb(args.out, records)
    print(json.dumps({"objects": n, "out": args.out}))


def cmd_import_mot(args):
    """MOTChallenge text files -> canonical TrackRecord JSONL.

    Bridges MOT16/17/20 gt / det / result files into every existing verb
    (eval --hota, track --from-detections, interp, submit). See
    io_out/motchallenge.py for the mapping rules.
    """
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.io_out.motchallenge import (
        read_mot,
        read_mot_tree,
    )

    if args.context:
        if not os.path.isfile(args.input):
            raise SystemExit(
                "import-mot: --context applies to a single-file input; "
                "directory inputs name each sequence by its own file/dir")
        records, stats = read_mot(args.input, context_name=args.context,
                                  gt=args.gt, camera_name=args.camera)
    else:
        records, stats = read_mot_tree(args.input, gt=args.gt,
                                       camera_name=args.camera)
    n = subm.write_jsonl(args.out, records)
    out = {
        "records": n, "out": args.out, "skipped_ignore":
        stats.skipped_ignore, "skipped_class": stats.skipped_class,
    }
    if stats.ignore:
        # don't-care regions (zero-marked / distractor GT rows) as a
        # sidecar: `w2t eval --gt <out> --ignore <sidecar>` removes
        # predictions on them from the FP penalty set (the official
        # MOT protocol; eval/mot.suppress_ignored)
        ignore_path = os.path.splitext(args.out)[0] + ".ignore.jsonl"
        out["ignore_records"] = subm.write_jsonl(ignore_path, stats.ignore)
        out["ignore_out"] = ignore_path
    print(json.dumps(out))


def cmd_export_mot(args):
    """TrackRecord JSONL -> MOT result files (one per sequence/camera),
    consumable by py-motmetrics / TrackEval / the MOT submission server."""
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.io_out.motchallenge import write_mot

    records = []
    for path in args.inputs:
        records.extend(subm.read_jsonl(path))
    written = write_mot(records, args.out_dir)
    print(json.dumps({"files": written, "out_dir": args.out_dir}))


def cmd_export_savedmodel(args):
    """Detector -> TF SavedModel (io_out/export_tf.py): a portable serving
    artifact (TF Serving / tf.saved_model.load, no JAX at destination).
    --platform tpu keeps the real Pallas kernels (TPU-only artifact);
    --platform cpu exports the interpret path (runs anywhere TF runs)."""
    _enable_compile_cache(args)
    import jax

    from waymo_2d_tracking_tpu.io_out.export_tf import export_savedmodel

    cfg = _load_config(args)
    if args.params:
        variables = _load_params(args.params)
    else:
        # random init — shape/integration testing without a checkpoint
        from waymo_2d_tracking_tpu.models.detector import DetectorRunner

        variables = DetectorRunner(cfg.detector).init_params(
            jax.random.PRNGKey(args.seed))
    # full Config, not cfg.detector: the export routes through the one
    # detection dispatch rule, so a TTA preset exports the TTA union
    info = export_savedmodel(cfg, variables, args.out,
                             batch_size=args.batch,
                             platform=args.platform)
    print(json.dumps(info))


def cmd_tune(args):
    """Tracker hyperparameter random search over precomputed detections
    (pipeline/tune.py): each trial is a full `track --from-detections`
    run scored with pooled CLEAR-MOT/IDF1 vs --gt. Pure-CPU friendly."""
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.pipeline.tune import tune_tracker

    cfg = _load_config(args)
    det_rows = subm.read_jsonl(args.from_detections)
    gt_rows = subm.read_jsonl(args.gt)
    try:
        report = tune_tracker(
            det_rows, gt_rows, cfg, trials=args.trials, seed=args.seed,
            objective=args.objective, iou_threshold=args.iou,
            workers=args.workers or 0,
        )
    except ValueError as e:
        raise SystemExit(str(e))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    best = report["best"]
    print(json.dumps({
        "objective": report["objective"],
        "best_trial": best["trial"],
        report["objective"]: best[report["objective"]],
        "baseline": next((r[report["objective"]] for r in report["results"]
                          if r["trial"] == -1), None),
        "set_flags": report["best_overrides"],
        "out": args.out,
    }))


def cmd_interp(args):
    """Offline gap interpolation over a track JSONL (io_out/postprocess)."""
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.io_out.postprocess import (
        interpolate_gaps_offline,
    )

    records = subm.read_jsonl(args.input)
    out = interpolate_gaps_offline(records, max_gap=args.max_gap)
    n = subm.write_jsonl(args.out, out)
    print(json.dumps({
        "records_in": len(records), "records_out": n,
        "interpolated": n - len(records), "out": args.out,
    }))


def _eval_key_worker(task):
    """One (context, camera) evaluation — module-level so `w2t eval
    --workers N` can dispatch it to a process pool (no jax imports)."""
    key, gt_frames, hyp_frames, iou, hota = task
    from waymo_2d_tracking_tpu.eval.mot import evaluate_mot

    m = evaluate_mot(gt_frames, hyp_frames, iou_threshold=iou)
    hm = None
    if hota:
        from waymo_2d_tracking_tpu.eval.hota import evaluate_hota

        hm = evaluate_hota(gt_frames, hyp_frames)
    return key, m, hm


def cmd_eval(args):
    import numpy as np

    from waymo_2d_tracking_tpu.eval.mot import combine_mot
    from waymo_2d_tracking_tpu.io_out import submission as subm

    def to_frames(rows):
        by_seg = {}
        for r in rows:
            by_seg.setdefault((r.context_name, r.camera_name), {}).setdefault(
                r.timestamp_micros, []
            ).append(r)
        return by_seg

    def _eval_rows(pred_rows, gt_rows, per_key: bool):
        """(per-(context,camera) rows if per_key, pooled row or None)."""
        pred = to_frames(pred_rows)
        gt = to_frames(gt_rows)
        # Intern object ids instead of hashing (VERDICT r2 weak #4):
        # hash() is per-process salted (irreproducible across runs) and
        # collides around 2^15.5 distinct ids, silently merging
        # trajectories. Ids are interned per (context, camera) namespace
        # so the same string in two segments never aliases when pooled.
        intern: dict = {}

        def _ids(key, rows_):
            return np.array(
                [intern.setdefault((key, r.object_id), len(intern))
                 for r in rows_],
                dtype=np.int64,
            )

        agg = {}
        mot_parts, hota_parts = [], []
        # union of keys: predictions for (context, camera) pairs absent
        # from the GT file count as false positives, not silent drops
        tasks = []
        for key in sorted(set(gt) | set(pred)):
            stamps = sorted(set(gt.get(key, {})) | set(pred.get(key, {})))
            gt_frames, hyp_frames = [], []
            for ts in stamps:
                g = gt.get(key, {}).get(ts, [])
                h = pred.get(key, {}).get(ts, [])
                gt_frames.append(
                    (_ids(key, g),
                     np.array([r.to_xyxy() for r in g]).reshape(-1, 4))
                )
                hyp_frames.append(
                    (_ids(key, h),
                     np.array([r.to_xyxy() for r in h]).reshape(-1, 4))
                )
            tasks.append((key, gt_frames, hyp_frames, args.iou,
                          bool(args.hota)))
        # keys are independent -> fan per-(context, camera) evaluation
        # across processes on multi-core hosts (a full val sweep is
        # ~1000 keys of Hungarian-per-frame work; the eval children never
        # import jax). One pool per invocation, shared by the main and
        # per-class passes. Serial when workers <= 1.
        if pool is not None and len(tasks) > 1:
            results = list(pool.map(_eval_key_worker, tasks))
        else:
            results = [_eval_key_worker(t) for t in tasks]
        for key, m, hm in results:
            mot_parts.append(m)
            if hm is not None:
                hota_parts.append(hm)
            if per_key:
                row = m.as_dict()
                if hm is not None:
                    row.update(hm.as_dict())
                agg[f"{key[0]}/{key[1]}"] = row
        # pooled metrics over the whole split (the one number to compare
        # against a reference val-sweep run): exact, because
        # segment-interned ids never collide across segments and the
        # per-gt match carry / per-id association counts can't cross a
        # segment boundary — so both pooled rows combine from per-key
        # counts (combine_mot / combine_hota, equality with concatenated
        # re-runs unit-tested) instead of paying a second
        # Hungarian-per-frame pass over the whole split.
        pooled = None
        if mot_parts and (not per_key or len(agg) > 1):
            pooled = combine_mot(mot_parts).as_dict()
            if args.hota:
                from waymo_2d_tracking_tpu.eval.hota import combine_hota

                pooled.update(combine_hota(hota_parts).as_dict())
        return agg, pooled

    pred_rows = subm.read_jsonl(args.pred)
    gt_rows = subm.read_jsonl(args.gt)
    if getattr(args, "ignore", None):
        # protocol preprocessing (review r4): remove predictions sitting on
        # don't-care regions (w2t import-mot --gt writes the sidecar) from
        # the penalty set BEFORE any scoring, so the main, per-class and
        # HOTA passes all see one prediction set
        from waymo_2d_tracking_tpu.eval.mot import suppress_ignored

        ign = to_frames(subm.read_jsonl(args.ignore))
        gt_by = to_frames(gt_rows)
        pred_by = to_frames(pred_rows)
        kept_rows = []
        for key, by_ts in pred_by.items():
            for ts, rows in by_ts.items():
                g = gt_by.get(key, {}).get(ts, [])
                i = ign.get(key, {}).get(ts, [])
                if not i:
                    kept_rows.extend(rows)
                    continue
                (kept_ids, _), = suppress_ignored(
                    [(np.arange(len(g)),
                      np.array([r.to_xyxy() for r in g]).reshape(-1, 4))],
                    [(np.arange(len(rows)),
                      np.array([r.to_xyxy() for r in rows]).reshape(-1, 4))],
                    [np.array([r.to_xyxy() for r in i]).reshape(-1, 4)],
                    # protocol-fixed 0.5 (ADVICE r4): the MOTChallenge
                    # distractor-removal preprocessing always uses 0.5;
                    # tying it to the user-tunable scoring --iou made
                    # numbers non-comparable across --iou settings
                    iou_threshold=0.5,
                )
                kept_rows.extend(rows[k] for k in kept_ids)
        n_removed = len(pred_rows) - len(kept_rows)
        pred_rows = kept_rows
        if n_removed:
            print(json.dumps({"suppressed_on_ignore_regions": n_removed}))
    workers = getattr(args, "workers", 0) or 0
    pool = None
    if workers > 1:
        from concurrent.futures import ProcessPoolExecutor

        pool = ProcessPoolExecutor(max_workers=workers)
    try:
        agg, pooled = _eval_rows(pred_rows, gt_rows, per_key=True)
        if pooled is not None:
            agg["OVERALL"] = pooled
        if args.per_class:
            # Waymo scores classes separately (label.type); a prediction of
            # the wrong type never matches the GT it overlaps
            names = subm.WAYMO_TYPE_NAMES
            types = sorted({r.object_type for r in gt_rows}
                           | {r.object_type for r in pred_rows})
            for t in types:
                _, pooled_c = _eval_rows(
                    [r for r in pred_rows if r.object_type == t],
                    [r for r in gt_rows if r.object_type == t],
                    per_key=False,
                )
                if pooled_c is not None:
                    agg[f"CLASS_{names.get(t, t)}"] = pooled_c
    finally:
        if pool is not None:
            pool.shutdown()
    print(json.dumps(agg, indent=2))


def cmd_eval_det(args):
    """COCO-style detection AP of a detections/tracks JSONL vs GT JSONL."""
    from waymo_2d_tracking_tpu.eval.ap import evaluate_detections, records_to_frames
    from waymo_2d_tracking_tpu.io_out import submission as subm

    pred = records_to_frames(subm.read_jsonl(args.pred), with_scores=True)
    gt = records_to_frames(subm.read_jsonl(args.gt), with_scores=False)
    out = evaluate_detections(pred, gt, num_classes=args.num_classes)
    print(json.dumps({k: round(v, 5) for k, v in out.items()}, indent=2))


def cmd_train(args):
    _enable_compile_cache(args)
    import jax
    import numpy as np

    from waymo_2d_tracking_tpu.data.synthetic import render_detection_batch
    from waymo_2d_tracking_tpu.parallel import sharding as shd
    from waymo_2d_tracking_tpu.train.train import DetectorTrainer, train_loop

    cfg = _load_config(args)
    if args.sharded:
        from waymo_2d_tracking_tpu.parallel import multihost as mh

        # multi-host (DCN) when the W2T_COORDINATOR env is present: global
        # mesh over every process's devices; single-host local mesh otherwise
        if mh.initialize_multihost():
            mesh = mh.make_global_mesh()
        else:
            mesh = shd.make_mesh()
    else:
        mesh = None
    trainer = DetectorTrainer(cfg, mesh=mesh)
    if args.data_dir:
        from waymo_2d_tracking_tpu.data.coco import coco_batch_iterator

        data = coco_batch_iterator(
            args.data_dir, cfg.train.batch_size, cfg.detector.image_size,
            flip_augment=cfg.train.aug_flip,
            scale_range=tuple(cfg.train.aug_scale_range),
            color_jitter=cfg.train.aug_color_jitter,
            num_workers=cfg.train.input_workers,
            prefetch_depth=cfg.train.input_prefetch,
            # identity-aware batching: the ReID triplet loss needs the same
            # track to recur within a batch — draw each batch from one
            # segment context when the metric loss is on
            sample_by_context=cfg.train.reid_loss_weight > 0,
        )
    else:  # synthetic smoke-training
        rng = np.random.default_rng(args.seed)

        def synth():
            while True:
                yield render_detection_batch(
                    rng, cfg.train.batch_size, cfg.detector.image_size
                )

        data = synth()
    val_batches = None
    if args.val_every:
        if args.val_dir:
            from waymo_2d_tracking_tpu.data.coco import coco_batch_iterator

            val_iter = coco_batch_iterator(
                args.val_dir, cfg.train.batch_size, cfg.detector.image_size,
                flip_augment=False, scale_range=(1.0, 1.0),
                color_jitter=0.0, num_workers=0, prefetch_depth=0,
            )
            val_batches = [next(val_iter) for _ in range(args.val_batches)]
        else:
            # held-out synthetic batches from a seed train never sees
            val_rng = np.random.default_rng(args.seed + 10_000)
            val_batches = [
                render_detection_batch(val_rng, cfg.train.batch_size,
                                       cfg.detector.image_size)
                for _ in range(args.val_batches)
            ]
    state = train_loop(
        trainer, data, num_steps=args.steps or cfg.train.total_steps,
        checkpoint_every=cfg.train.checkpoint_every,
        val_batches=val_batches, val_every=args.val_every,
    )
    trainer.save_checkpoint(state)
    # serving artifact: inference variables (EMA params when enabled) under
    # <checkpoint_dir>/export — the path `w2t detect/track --params` loads
    import jax as _jax
    import orbax.checkpoint as ocp

    export_dir = os.path.join(cfg.train.checkpoint_dir, "export")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(export_dir, _jax.device_get(trainer.eval_variables(state)),
               force=True)
    ckptr.wait_until_finished()
    print(json.dumps({"step": int(state.step), "export": export_dir}))


def cmd_link(args):
    """Cross-camera identity linking over produced track files (+galleries)."""
    _enable_compile_cache(args)
    from waymo_2d_tracking_tpu.pipeline.link import link_tracks

    mesh = None
    if args.sharded:
        from waymo_2d_tracking_tpu.parallel.sharding import make_mesh

        mesh = make_mesh()
    report = link_tracks(args.out_dir, linked_dir=args.linked_dir,
                         threshold=args.threshold, mesh=mesh)
    print(json.dumps(report))


def cmd_draw(args):
    """Render track boxes onto frames (per-frame JPEGs) for debugging."""
    from waymo_2d_tracking_tpu.data.waymo import iter_segments
    from waymo_2d_tracking_tpu.io_out import submission as subm
    from waymo_2d_tracking_tpu.utils.viz import render_segment

    cfg = _load_config(args)
    records = subm.read_jsonl(args.tracks)
    total = 0
    videos = []
    stem, ext = os.path.splitext(args.video) if args.video else (None, None)
    for i, seg in enumerate(
            iter_segments(args.segments_dir, cameras=cfg.pipeline.cameras)):
        video_path = None
        if args.video:
            # first segment gets the requested path; further segments get
            # context/camera-suffixed siblings
            video_path = (args.video if i == 0 else
                          f"{stem}_{seg.context_name}_{seg.camera_name}{ext}")
            videos.append(video_path)
        total += render_segment(seg, records, args.out_dir,
                                max_frames=args.max_frames,
                                video_path=video_path, fps=args.fps)
    out = {"frames": total, "out": args.out_dir}
    if videos:
        out["videos"] = videos
    print(json.dumps(out))


def cmd_import_weights(args):
    """Torch .pth checkpoint -> flax/orbax params (reference-weight unlock)."""
    from waymo_2d_tracking_tpu.train.port_torch import import_weights

    cfg = _load_config(args)
    report = import_weights(args.ckpt, args.out, cfg=cfg.detector)
    print(json.dumps({
        k: report[k] for k in ("out", "n_imported", "n_skipped_shape", "n_missing")
    }))
    if args.verbose:
        print(json.dumps(report, indent=2))


def cmd_convert(args):
    from waymo_2d_tracking_tpu.data.coco import convert_segments_to_coco

    n = convert_segments_to_coco(args.segments_dir, args.out_dir)
    print(json.dumps({"images": n, "out": args.out_dir}))


def cmd_serve(args):
    """Long-lived serving daemon over one camera stream (pipeline/server.py):
    owns the compiled OnlineTracker session; clients speak the
    length-prefixed JSON protocol over AF_UNIX or localhost TCP."""
    _enable_compile_cache(args)
    import jax

    from waymo_2d_tracking_tpu.pipeline.server import TrackingServer

    if (args.socket is None) == (args.port is None):
        raise SystemExit("serve: pass exactly one of --socket PATH / --port N")
    cfg = _load_config(args)
    params = _load_params(args.params) if args.params else None
    server = TrackingServer(cfg, params=params,
                            rng=jax.random.PRNGKey(args.seed),
                            camera_name=args.camera,
                            multicam=args.multicam)
    if args.warmup:
        # --warmup takes FULL-RES source dims; this compiles both the raw
        # shape and (decode_scale_denom > 1) the scaled shape compressed
        # payloads step at — see TrackingServer.warmup_source
        server.warmup_source((int(args.warmup[0]), int(args.warmup[1])))
    if args.state_file and os.path.exists(args.state_file):
        # planned-restart recovery: resume identities from the last
        # snapshot written by the previous incarnation. A corrupt or
        # config-mismatched file must NOT block restarts — warn and serve
        # fresh (the whole point of the feature is surviving restarts)
        try:
            with open(args.state_file, "rb") as f:
                server.load_state(f.read())
            print(json.dumps({"restored": args.state_file}), file=sys.stderr)
        except Exception as e:
            print(json.dumps({
                "restore_failed": args.state_file,
                "error": f"{type(e).__name__}: {e}",
                "action": "serving with fresh state",
            }), file=sys.stderr)

    def on_ready(addr):
        print(json.dumps({"ready": True, "addr": list(addr)
                          if isinstance(addr, tuple) else addr}), flush=True)

    from waymo_2d_tracking_tpu.utils.profiling import trace

    try:
        with trace(args.profile):
            n = server.serve(socket_path=args.socket, port=args.port,
                             max_requests=args.max_requests,
                             on_ready=on_ready)
    finally:
        if args.state_file:
            tmp = args.state_file + ".tmp"
            with open(tmp, "wb") as f:
                f.write(server.state_bytes())
                f.flush()
                os.fsync(f.fileno())           # durable before the rename
            os.replace(tmp, args.state_file)   # atomic vs crash mid-write
    print(json.dumps({"requests": n,
                      "latency": server.sess.latency_stats()}))


def cmd_doctor(args):
    """Environment / install health report (one JSON object): JAX backend
    and devices, native host libraries, optional deps, preset inventory.
    The first thing to run when a deployment misbehaves."""
    import importlib

    report = {}
    try:
        # jax import itself is inside the guard: a broken jaxlib install
        # is exactly the failure this report must survive and describe
        import jax

        devs = jax.devices()
        report["jax"] = {
            "version": jax.__version__,
            "backend": devs[0].platform if devs else "none",
            "devices": [str(d) for d in devs],
            "device_count": len(devs),
        }
    except Exception as e:  # tunnel down / no backend / broken install
        report["jax"] = {"error": f"{type(e).__name__}: {e}"}

    from waymo_2d_tracking_tpu.data import tfrecord_native
    from waymo_2d_tracking_tpu.data.jpeg import BatchJpegDecoder

    try:
        dec = BatchJpegDecoder(32, 32)
        native_jpeg = dec.is_native
        dec.close()
    except Exception:
        native_jpeg = False
    report["native"] = {
        "jpeg_decoder": native_jpeg,
        "tfrecord_scanner": tfrecord_native.is_available(),
    }

    report["optional_deps"] = {}
    for mod in ("tensorflow", "torch", "cv2", "scipy", "flax", "optax",
                "orbax.checkpoint"):
        try:
            m = importlib.import_module(mod)
            report["optional_deps"][mod] = getattr(m, "__version__", "ok")
        except Exception:
            report["optional_deps"][mod] = None

    preset_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    presets = (sorted(f[:-5] for f in os.listdir(preset_dir)
                      if f.endswith(".yaml"))
               if os.path.isdir(preset_dir) else [])
    report["presets"] = presets
    ok = ("error" not in report["jax"]
          and report["jax"].get("device_count", 0) > 0)
    report["status"] = "ok" if ok else "degraded"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def cmd_bench(args):
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")]
    for flag in ("config1", "config4", "config5", "fast", "production",
                 "host", "src_full", "latency"):
        if getattr(args, flag):
            cmd.append("--" + flag.replace("_", "-"))
    os.execv(sys.executable, cmd)


def _load_params(path):
    """Load inference variables from an orbax dir: either a train export /
    import-weights artifact ({params, batch_stats}) or a full TrainState
    checkpoint (step_N dir), from which the inference collections are
    extracted. A TrainState trained with EMA serves the EMA params —
    matching what the `<ckpt>/export` artifact would contain (review r3:
    the two --params load paths for the same run must agree)."""
    import jax
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(path)
    if isinstance(tree, dict) and "params" in tree and "opt_state" in tree:
        params = tree["params"]
        ema = tree.get("ema_params")
        if ema is not None and jax.tree.leaves(ema):
            params = ema
        out = {"params": params}
        if "batch_stats" in tree:
            out["batch_stats"] = tree["batch_stats"]
        return out
    return tree


def build_parser():
    p = argparse.ArgumentParser(prog="w2t", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--config", default=None, help="yaml preset path")
        sp.add_argument("--set", nargs="*", help="dotted overrides key=value")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--params", default=None, help="orbax checkpoint path")
        sp.add_argument("--profile", default=None,
                        help="jax.profiler trace output dir (TensorBoard)")
        sp.add_argument("--compile-cache", dest="compile_cache", default=None,
                        metavar="DIR|off",
                        help="persistent XLA compile-cache dir (default "
                             "$W2T_COMPILE_CACHE or ~/.cache/w2t/jax-cache; "
                             "'off' disables) — restarted processes skip "
                             "recompilation")

    sp = sub.add_parser("track", help="detect+track segments -> track files")
    common(sp)
    sp.add_argument("--segments-dir")
    sp.add_argument("--out-dir", default="out")
    sp.add_argument("--from-detections", help="JSONL detections (config-1 path)")
    sp.add_argument("--multicam", action="store_true",
                    help="shared-backbone multi-camera batching (config 4)")
    sp.add_argument("--sharded", action="store_true",
                    help="fan segments across the device mesh (one segment "
                         "per chip via shard_map; C28 inference fan-out)")
    sp.add_argument("--online", action="store_true",
                    help="streaming serving path: one frame per device "
                         "dispatch (pipeline/online.py) — minimum latency "
                         "instead of chunked throughput; stats report "
                         "p50/p90/p99 serving latency")
    sp.add_argument("--video", default=None,
                    help="stream a plain video file through the online "
                         "path instead of --segments-dir (implies "
                         "--online; timestamps synthesized from FPS)")
    sp.add_argument("--out", default="tracks.jsonl")
    sp.add_argument("--fail-after-n-segments", type=int, default=None)
    sp.set_defaults(fn=cmd_track)

    sp = sub.add_parser("detect", help="detection-only inference")
    common(sp)
    sp.add_argument("--segments-dir", required=True)
    sp.add_argument("--out", default="detections.jsonl")
    sp.add_argument("--sharded", action="store_true",
                    help="fan segments across the device mesh (stateless "
                         "detect lockstep; per-segment files in --out-dir, "
                         "merged into --out)")
    sp.add_argument("--out-dir", default=None,
                    help="per-segment output dir for --sharded "
                         "(default: <out>.d)")
    sp.set_defaults(fn=cmd_detect)

    sp = sub.add_parser("submit", help="JSONL -> Waymo submission pb")
    sp.add_argument("inputs", nargs="+")
    sp.add_argument("--out", default="submission.pb")
    sp.set_defaults(fn=cmd_submit)

    sp = sub.add_parser(
        "export-savedmodel",
        help="detector -> TF SavedModel serving artifact (jax2tf)",
    )
    common(sp)
    sp.add_argument("--out", required=True, help="SavedModel output dir")
    sp.add_argument("--batch", type=int, default=1,
                    help="static serving batch size baked into the "
                         "signature")
    sp.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                    help="cpu: portable StableHLO (interpret-path "
                         "kernels); tpu: real Pallas kernels, TPU-only")
    sp.set_defaults(fn=cmd_export_savedmodel)

    sp = sub.add_parser(
        "import-mot",
        help="MOTChallenge txt (gt/det/results) -> TrackRecord JSONL",
    )
    sp.add_argument("input",
                    help=".txt file, or a directory (<seq>.txt or the "
                         "official <seq>/gt/gt.txt layout)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--gt", action="store_true",
                    help="ground-truth semantics: honor the consider flag "
                         "and class column (ignore regions/distractors "
                         "skipped)")
    sp.add_argument("--camera", type=int, default=1,
                    help="camera_name to stamp (MOT sequences are "
                         "single-camera; default FRONT=1)")
    sp.add_argument("--context", default=None,
                    help="sequence/context name override for single-file "
                         "input (default: the file's basename — gt.txt and "
                         "results for the same sequence need the same name "
                         "to be comparable by w2t eval)")
    sp.set_defaults(fn=cmd_import_mot)

    sp = sub.add_parser(
        "export-mot",
        help="TrackRecord JSONL -> MOTChallenge result files per sequence",
    )
    sp.add_argument("inputs", nargs="+")
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_export_mot)

    sp = sub.add_parser(
        "interp",
        help="fill short per-track gaps in a track JSONL by linear "
             "interpolation (offline postprocess)",
    )
    sp.add_argument("input")
    sp.add_argument("--out", required=True)
    sp.add_argument("--max-gap", type=int, default=5,
                    help="largest run of missing frames to fill")
    sp.set_defaults(fn=cmd_interp)

    sp = sub.add_parser("eval", help="MOTA/MOTP vs ground truth")
    sp.add_argument("--pred", required=True)
    sp.add_argument("--gt", required=True)
    sp.add_argument("--iou", type=float, default=0.5)
    sp.add_argument("--ignore", default=None,
                    help="don't-care regions JSONL (the .ignore.jsonl "
                         "sidecar `w2t import-mot --gt` writes): "
                         "predictions on these regions are removed from "
                         "the FP penalty set before scoring (official MOT "
                         "protocol; eval/mot.suppress_ignored)")
    sp.add_argument("--hota", action="store_true",
                    help="additionally compute HOTA/DetA/AssA/LocA "
                         "(Luiten et al. 2021; eval/hota.py) per segment "
                         "and pooled")
    sp.add_argument("--per-class", action="store_true", dest="per_class",
                    help="additionally report pooled metrics per Waymo "
                         "object type (CLASS_VEHICLE/PEDESTRIAN/CYCLIST "
                         "rows) — Waymo scores classes separately")
    sp.add_argument("--workers", type=int, default=0,
                    help="process-pool size for per-(context,camera) "
                         "evaluation (val sweeps on multi-core hosts); "
                         "0/1 = serial")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "tune",
        help="tracker hyperparameter random search over precomputed "
             "detections, scored vs ground truth (pooled MOTA/IDF1)",
    )
    common(sp)
    sp.add_argument("--from-detections", required=True, dest="from_detections",
                    help="detections JSONL (w2t detect output)")
    sp.add_argument("--gt", required=True, help="ground-truth JSONL")
    sp.add_argument("--trials", type=int, default=20)
    sp.add_argument("--objective", choices=("mota", "idf1", "motp"),
                    default="mota")
    sp.add_argument("--iou", type=float, default=0.5,
                    help="evaluation IoU threshold")
    sp.add_argument("--workers", type=int, default=0,
                    help="trial process-pool size (children force the CPU "
                         "backend); 0/1 = serial")
    sp.add_argument("--out", default=None,
                    help="write the full ranked trial report JSON here")
    sp.set_defaults(fn=cmd_tune)

    sp = sub.add_parser("eval-det",
                        help="COCO-style detection AP (mAP/AP50/AP75) vs GT")
    sp.add_argument("--pred", required=True, help="detections JSONL")
    sp.add_argument("--gt", required=True, help="GT labels JSONL")
    sp.add_argument("--num-classes", type=int, default=3)
    sp.set_defaults(fn=cmd_eval_det)

    sp = sub.add_parser("train", help="train the detector")
    common(sp)
    sp.add_argument("--data-dir", default=None, help="COCO-converted data")
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--sharded", action="store_true")
    sp.add_argument("--val-every", type=int, default=0, dest="val_every",
                    help="run held-out detection-AP validation every N "
                         "steps; best-mAP state saved to "
                         "<checkpoint_dir>/best (0 disables)")
    sp.add_argument("--val-dir", default=None, dest="val_dir",
                    help="COCO-converted validation data (defaults to "
                         "held-out synthetic batches)")
    sp.add_argument("--val-batches", type=int, default=4,
                    dest="val_batches",
                    help="number of fixed validation batches")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("link",
                        help="unify track ids across cameras of a context "
                             "(ring-sharded gallery scoring on the mesh)")
    sp.add_argument("--out-dir", required=True,
                    help="track output dir (with .gallery.npz sidecars)")
    sp.add_argument("--linked-dir", default=None)
    sp.add_argument("--threshold", type=float, default=0.6)
    sp.add_argument("--sharded", action="store_true",
                    help="score via the ppermute ring over the device mesh")
    sp.set_defaults(fn=cmd_link)

    sp = sub.add_parser("draw", help="render track boxes onto frames (debug)")
    common(sp)
    sp.add_argument("--tracks", required=True, help="tracks JSONL")
    sp.add_argument("--segments-dir", required=True)
    sp.add_argument("--out-dir", default="viz")
    sp.add_argument("--max-frames", type=int, default=None)
    sp.add_argument("--video", default=None,
                    help="also encode the annotated frames to this video "
                         "file (.mp4/.avi; one per segment — later "
                         "segments get context/camera-suffixed names)")
    sp.add_argument("--fps", type=float, default=10.0,
                    help="video frame rate (Waymo cameras are 10 Hz)")
    sp.set_defaults(fn=cmd_draw)

    sp = sub.add_parser("import-weights",
                        help="torch .pth checkpoint -> flax/orbax params")
    common(sp)
    sp.add_argument("ckpt", help="torch state-dict checkpoint (.pth)")
    sp.add_argument("--out", required=True, help="orbax output dir")
    sp.add_argument("--verbose", action="store_true",
                    help="print per-key import report")
    sp.set_defaults(fn=cmd_import_weights)

    sp = sub.add_parser("convert", help="Waymo segments -> COCO detection data")
    sp.add_argument("--segments-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser(
        "serve",
        help="serving daemon: compiled online tracker behind a local socket",
    )
    common(sp)
    sp.add_argument("--socket", default=None,
                    help="AF_UNIX socket path (preferred on-host)")
    sp.add_argument("--port", type=int, default=None,
                    help="localhost TCP port (0 = ephemeral)")
    sp.add_argument("--camera", type=int, default=1)
    sp.add_argument("--multicam", action="store_true",
                    help="serve a full camera rig per frame message "
                         "(len(pipeline.cameras) frames through one "
                         "shared-backbone batch)")
    sp.add_argument("--warmup", nargs=2, metavar=("H", "W"), default=None,
                    help="pre-compile for H W sources before accepting "
                         "(otherwise the first frame pays the XLA compile)")
    sp.add_argument("--state-file", default=None, dest="state_file",
                    help="tracker-state persistence: restore from this "
                         "file at start (if present) and snapshot to it "
                         "atomically on exit — identities survive planned "
                         "restarts; mid-run failover uses the client "
                         "snapshot/restore messages")
    sp.add_argument("--max-requests", type=int, default=None,
                    help="exit after N requests (drain/test hook)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser(
        "doctor",
        help="environment health report (backend, native libs, deps)",
    )
    sp.set_defaults(fn=cmd_doctor)

    sp = sub.add_parser("bench", help="run the benchmark harness")
    sp.add_argument("--config1", action="store_true",
                    help="tracker-only over precomputed detections")
    sp.add_argument("--config4", action="store_true",
                    help="5-camera shared-backbone multicam row")
    sp.add_argument("--config5", action="store_true", help="TTA e2e row")
    sp.add_argument("--fast", action="store_true",
                    help="configs/fast.yaml speed-preset row")
    sp.add_argument("--production", action="store_true",
                    help="configs/production.yaml r34 quality row")
    sp.add_argument("--host", action="store_true",
                    help="host JPEG-decode ingestion row")
    sp.add_argument("--src-full", dest="src_full", action="store_true",
                    help="include device-side resize from 1280x1920 source")
    sp.add_argument("--latency", action="store_true",
                    help="per-frame online serving latency (p50 ms) on the "
                         "headline preset; vs_baseline = 10Hz real-time "
                         "margin")
    sp.set_defaults(fn=cmd_bench)
    return p


def main(argv: Optional[List[str]] = None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    # propagate command exit codes (doctor returns 1 when degraded) under
    # `python -m waymo_2d_tracking_tpu.cli ...`, matching the w2t script
    sys.exit(main())
