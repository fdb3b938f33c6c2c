"""Sharded per-segment inference fan-out (SURVEY.md §2.2 "per-segment
sharding", component C28 on the product surface — round-2 deliverable).

The reference parallelizes inference by running one python process per GPU
over a slice of the segment list (SURVEY.md §2.2 [INFERRED]). TPU-native
restatement: one process, one ``jax.sharding.Mesh``; G = mesh-size segments
advance in lockstep, each device running the FULL local detect+track chunk
step (preprocess -> detector forward -> Pallas postprocess -> tracker scan)
on its own segment via ``shard_map``. Per-segment tracking is embarrassingly
parallel, so the mapped body needs ZERO collectives — sharding here buys
pure fan-out, exactly like the reference's process pool but with one jit and
one host.

Per-device shapes inside the body are identical to the single-chip chunk
step, so every Pallas kernel runs locally with unsharded shapes (no
partitioning rules needed).

CLI: ``w2t track --sharded`` (cli.py).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
    _CHECK_KW = "check_vma"     # jax >= 0.8 renamed check_rep
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map
    _CHECK_KW = "check_rep"

from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.parallel.sharding import DATA_AXIS
from waymo_2d_tracking_tpu.pipeline.run import (
    RollingFetch,
    SegmentFrames,
    SegmentPipeline,
)
from waymo_2d_tracking_tpu.tracker import init_state


class ShardedSegmentRunner:
    """Runs groups of ``mesh size`` segments in lockstep, one per device."""

    def __init__(self, pipeline: SegmentPipeline, mesh: Mesh):
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self._steps = {}  # src_hw -> jitted sharded step

    def _sharded_step(self, src_hw):
        if src_hw in self._steps:
            return self._steps[src_hw]
        impl = self.pipeline._chunk_step_impl
        mesh = self.mesh

        def body(params, states, frames):
            # local block: leading segment axis of size 1 on each device
            state1 = jax.tree.map(lambda x: x[0], states)
            new_state, outputs, _scale = impl(params, state1, frames[0], src_hw)
            expand = lambda x: x[None]  # noqa: E731
            return jax.tree.map(expand, new_state), jax.tree.map(expand, outputs)

        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            **{_CHECK_KW: False},
        )
        step = jax.jit(mapped, donate_argnums=(1,))
        self._steps[src_hw] = step
        return step

    def _sharded_detect_step(self, src_hw):
        """Detection-only lockstep step (`w2t detect --sharded`): stateless,
        so the mapped body is just the local detect chunk per segment."""
        key = ("detect", src_hw)
        if key in self._steps:
            return self._steps[key]
        impl = self.pipeline._detect_chunk_impl
        mesh = self.mesh

        def body(params, frames):
            dets, _scale = impl(params, frames[0], src_hw)
            return jax.tree.map(lambda x: x[None], dets)

        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            **{_CHECK_KW: False},
        )
        step = jax.jit(mapped)
        self._steps[key] = step
        return step

    def run_group(self, group: List[SegmentFrames], out_dir: str,
                  detections_only: bool = False) -> List[dict]:
        """Track up to ``n_shards`` same-resolution segments in lockstep;
        writes per-segment JSONL files (+ .gallery.npz sidecars, matching
        run_segments' contract for `w2t link`). Shorter/absent segments are
        padded by repeating their last real block — zeros would age every
        live track out of the final table before it is captured (same
        rationale as SegmentFrames.chunk_iter).

        detections_only: stateless detect fan-out (`w2t detect --sharded`)
        — no tracker state, no snapshots, no gallery sidecars; per-segment
        detections JSONL instead."""
        cfg = self.pipeline.cfg
        chunk = cfg.pipeline.chunk_frames
        g = self.n_shards
        assert len(group) <= g
        pad_group = list(group) + [None] * (g - len(group))
        t_max = max(s.num_frames for s in group)

        sd = cfg.pipeline.decode_scale_denom
        iters = [
            s.chunk_iter(chunk, scale_denom=sd) if s is not None else None
            for s in pad_group
        ]
        src_hw = None
        batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        states = None
        if not detections_only:
            states = jax.device_put(
                jax.tree.map(lambda x: jnp.stack([x] * g),
                             init_state(cfg.tracker)),
                batch_sharding,
            )
        fetcher = RollingFetch(depth=cfg.pipeline.prefetch_depth)
        last_blocks: List = [None] * g
        # Per-segment state snapshots, taken at the chunk where the segment's
        # real frames end: a shorter segment in a lockstep group keeps
        # stepping on repeats of its frozen last frame afterwards, which
        # would keep EMA-updating its embeddings and advancing ages/hits —
        # diverging its .gallery.npz from the non-sharded path, which pads
        # at most chunk-1 frames. Snapshotting at the true end makes the
        # sidecars bit-identical to run_segments' (chunk_iter's in-chunk
        # repeat padding is the same in both paths).
        end_snapshots: List = [None] * g
        try:
            for start in range(0, t_max, chunk):
                blocks: List = [None] * g
                for idx, (s, it) in enumerate(zip(pad_group, iters)):
                    if it is not None and start < s.num_frames:
                        blocks[idx] = next(it)
                        last_blocks[idx] = blocks[idx]
                # start < t_max guarantees at least one live segment
                ref = next(b for b in blocks if b is not None)
                for idx, b in enumerate(blocks):
                    if b is None:
                        prev = last_blocks[idx]
                        blocks[idx] = (
                            np.repeat(prev[-1:], chunk, axis=0)
                            if prev is not None else np.zeros_like(ref)
                        )
                frames = np.stack(blocks)                   # (G, chunk, H, W, 3)
                if src_hw is None:
                    src_hw = tuple(frames.shape[2:4])
                # PTQ calibration (int8): shard 0's first real chunk — the
                # sharded path used to bypass SegmentPipeline's hook entirely
                self.pipeline.ensure_calibrated(frames[0], src_hw)
                dev_frames = jax.device_put(frames, batch_sharding)
                if detections_only:
                    outputs = self._sharded_detect_step(src_hw)(
                        self.pipeline.params, dev_frames)
                else:
                    step = self._sharded_step(src_hw)
                    states, outputs = step(
                        self.pipeline.params, states, dev_frames)
                fetcher.push(outputs)   # async, bounded in-flight window
                ending = [] if detections_only else [
                    idx for idx, s in enumerate(group)
                    if start < s.num_frames <= start + chunk
                ]
                if ending:
                    host_states = jax.device_get(states)
                    for idx in ending:
                        end_snapshots[idx] = jax.tree.map(
                            lambda x: x[idx], host_states
                        )
        finally:
            for it in iters:
                if it is not None:
                    it.close()

        final_states = (None if detections_only
                        else jax.device_get(states))  # (G, ...) stacked table
        # (G, T_pad, ...) per-segment trim + records
        outputs_host = fetcher.finish()
        stacked = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *outputs_host
        )
        stats = []
        for i, seg in enumerate(group):
            seg_out = jax.tree.map(lambda x: x[i][: seg.num_frames], stacked)
            if detections_only:
                records = subm.records_from_detections(
                    seg_out, seg.context_name, seg.timestamps,
                    seg.camera_name, scale=self._scale(seg, cfg),
                )
            else:
                records = subm.records_from_track_outputs(
                    seg_out, seg.context_name, seg.timestamps,
                    seg.camera_name, scale=self._scale(seg, cfg),
                    interp_max_gap=cfg.pipeline.interp_max_gap,
                )
            seg_file = os.path.join(
                out_dir, f"{seg.context_name}_{seg.camera_name}.jsonl"
            )
            subm.write_jsonl(seg_file, records)
            if not detections_only:
                seg_state = end_snapshots[i]
                if seg_state is None:
                    seg_state = jax.tree.map(lambda x: x[i], final_states)
                from waymo_2d_tracking_tpu.pipeline.link import (
                    write_gallery_sidecar,
                )

                write_gallery_sidecar(seg_file, seg_state)
            stats.append({
                "context": seg.context_name,
                "camera": seg.camera_name,
                "frames": seg.num_frames,
                "tracks": len({r.object_id for r in records}),
                "records": len(records),
                "shard": i % self.n_shards,
            })
        return stats

    def _scale(self, seg: SegmentFrames, cfg) -> float:
        return _segment_scale(seg, cfg)


class ShardedMultiCamRunner:
    """Sharded x multicam composition (round-3): G = mesh-size CONTEXTS run
    in lockstep, one per device, each context a full shared-backbone
    multi-camera chunk (BASELINE config 4 fanned across the mesh — the
    north-star deployment shape: v5e-8, 5 cameras per context).

    Per-device shapes equal the single-chip MultiCamPipeline chunk step;
    zero collectives in the body (pure fan-out, like ShardedSegmentRunner).
    """

    def __init__(self, pipeline, mesh: Mesh):
        # pipeline: MultiCamPipeline (duck-typed: needs _chunk_step_impl,
        # params, cfg, num_cams)
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self._steps = {}

    def _sharded_step(self, src_hw):
        if src_hw in self._steps:
            return self._steps[src_hw]
        impl = self.pipeline._chunk_step_impl
        mesh = self.mesh

        def body(params, states, frames):
            state1 = jax.tree.map(lambda x: x[0], states)   # (cams, ...)
            new_state, outputs, _scale = impl(params, state1, frames[0], src_hw)
            expand = lambda x: x[None]  # noqa: E731
            return jax.tree.map(expand, new_state), jax.tree.map(expand, outputs)

        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            **{_CHECK_KW: False},
        )
        step = jax.jit(mapped, donate_argnums=(1,))
        self._steps[src_hw] = step
        return step

    def run_context_group(self, contexts: List[List[SegmentFrames]],
                          out_dir: str) -> List[dict]:
        """Track up to ``n_shards`` same-resolution multicam contexts in
        lockstep. Each context is a list of num_cams per-camera SegmentFrames
        with aligned timestamps. Writes per-(context, camera) JSONL files +
        gallery sidecars (the `w2t link` contract)."""
        from waymo_2d_tracking_tpu.pipeline.multicam import (
            init_multicam_state,
            write_gallery_sidecar,
        )

        cfg = self.pipeline.cfg
        chunk = cfg.pipeline.chunk_frames
        sd = cfg.pipeline.decode_scale_denom
        num_cams = self.pipeline.num_cams
        g = self.n_shards
        assert len(contexts) <= g
        contexts = [sorted(segs, key=lambda s: s.camera_name)
                    for segs in contexts]
        for segs in contexts:
            assert len(segs) == num_cams
            assert len({tuple(s.timestamps) for s in segs}) == 1, (
                "multicam group needs aligned timestamps"
            )
        t_lens = [segs[0].num_frames for segs in contexts]
        t_max = max(t_lens)

        iters = [[s.chunk_iter(chunk, scale_denom=sd) for s in segs]
                 for segs in contexts]
        batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        states = jax.device_put(
            jax.tree.map(
                lambda x: jnp.stack([x] * g),
                init_multicam_state(cfg, num_cams),
            ),
            batch_sharding,
        )
        src_hw = None
        fetcher = RollingFetch(depth=cfg.pipeline.prefetch_depth)
        last_blocks: List = [None] * g
        end_snapshots: List = [None] * g   # freeze at true end (see run_group)
        try:
            for start in range(0, t_max, chunk):
                blocks: List = [None] * g
                for idx, (segs, cam_iters) in enumerate(zip(contexts, iters)):
                    if start < t_lens[idx]:
                        cam_blocks = [next(it) for it in cam_iters]
                        hws = {b.shape[1:3] for b in cam_blocks}
                        assert len(hws) == 1, (
                            "multicam shared-backbone batch needs equal-"
                            f"resolution cameras, got {sorted(hws)}"
                        )
                        blocks[idx] = np.stack(cam_blocks, axis=1)
                        last_blocks[idx] = blocks[idx]
                ref = next(b for b in blocks if b is not None)
                for idx in range(g):
                    if blocks[idx] is None:
                        prev = last_blocks[idx]
                        blocks[idx] = (
                            np.repeat(prev[-1:], chunk, axis=0)
                            if prev is not None else np.zeros_like(ref)
                        )
                frames = np.stack(blocks)     # (G, chunk, cams, H, W, 3)
                if src_hw is None:
                    src_hw = tuple(frames.shape[3:5])
                # PTQ calibration (int8) on shard 0's first multicam chunk
                self.pipeline.ensure_calibrated(frames[0], src_hw)
                dev_frames = jax.device_put(frames, batch_sharding)
                step = self._sharded_step(src_hw)
                states, outputs = step(self.pipeline.params, states, dev_frames)
                fetcher.push(outputs)   # async, bounded in-flight window
                ending = [idx for idx in range(len(contexts))
                          if start < t_lens[idx] <= start + chunk]
                if ending:
                    host_states = jax.device_get(states)
                    for idx in ending:
                        end_snapshots[idx] = jax.tree.map(
                            lambda x: x[idx], host_states
                        )
        finally:
            for cam_iters in iters:
                for it in cam_iters:
                    it.close()

        # (G, T_pad, cams, ...) stacked over chunks on axis 1
        outputs_host = fetcher.finish()
        stacked = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *outputs_host
        )
        stats = []
        for gi, segs in enumerate(contexts):
            ctx = segs[0].context_name
            scale = _segment_scale(segs[0], cfg)
            for ci, seg in enumerate(segs):
                cam_out = jax.tree.map(
                    lambda x: x[gi, : seg.num_frames, ci], stacked
                )
                records = subm.records_from_track_outputs(
                    cam_out, ctx, seg.timestamps, seg.camera_name, scale=scale,
                    interp_max_gap=cfg.pipeline.interp_max_gap,
                )
                seg_file = os.path.join(
                    out_dir, f"{ctx}_{seg.camera_name}.jsonl"
                )
                subm.write_jsonl(seg_file, records)
                snap = end_snapshots[gi]
                write_gallery_sidecar(
                    seg_file,
                    snap if snap is not None
                    else jax.tree.map(lambda x: x[gi], jax.device_get(states)),
                    cam_index=ci,
                )
                stats.append({
                    "context": ctx, "camera": seg.camera_name,
                    "frames": seg.num_frames, "records": len(records),
                    "tracks": len({r.object_id for r in records}),
                    "shard": gi,
                })
        return stats


def run_context_groups_sharded(
    pipeline,
    segments: Iterable[SegmentFrames],
    out_dir: str,
    mesh: Optional[Mesh] = None,
    fail_after: Optional[int] = None,
) -> List[dict]:
    """Manifest-resumable sharded multicam fan-out (`w2t track --multicam
    --sharded`): per-camera segments are grouped into contexts, contexts
    bucketed by source resolution into lockstep groups of mesh size.

    pipeline: MultiCamPipeline. Incomplete contexts (fewer cameras than
    pipeline.num_cams) are an error — config-4 semantics need the full
    shared-backbone batch.
    """
    from waymo_2d_tracking_tpu.parallel.sharding import make_mesh

    mesh = mesh or make_mesh()
    runner = ShardedMultiCamRunner(pipeline, mesh)
    from waymo_2d_tracking_tpu.pipeline.manifest import (
        append_manifest,
        load_done_keys,
        segment_key,
    )

    done = load_done_keys(out_dir)

    # contexts must be assembled before grouping (cameras of one context can
    # arrive interleaved); each context stays lazy — JPEG bytes decode in
    # run_context_group's chunk loop
    by_ctx: dict = {}
    for seg in segments:
        by_ctx.setdefault(seg.context_name, []).append(seg)

    all_stats: List[dict] = []
    n_run = 0
    g = runner.n_shards

    def _flush(group):
        nonlocal n_run
        if not group:
            return
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(
                f"fault injection: stopping after {fail_after} contexts"
            )
        stats = runner.run_context_group(group, out_dir)
        append_manifest(out_dir, stats)
        all_stats.extend(stats)
        n_run += len(group)

    buckets: dict = {}
    for ctx in sorted(by_ctx):
        segs = by_ctx[ctx]
        assert len(segs) == pipeline.num_cams, (
            f"context {ctx} has {len(segs)} cameras, "
            f"pipeline expects {pipeline.num_cams}"
        )
        if all(segment_key(s.context_name, s.camera_name) in done for s in segs):
            continue
        hw = _segment_src_hw(segs[0])
        bucket = buckets.setdefault(hw, [])
        bucket.append(segs)
        if len(bucket) == g:
            _flush(bucket)
            buckets[hw] = []
    for bucket in buckets.values():
        _flush(bucket)
    return all_stats


def _segment_src_hw(seg: SegmentFrames):
    return seg.source_hw()


def _segment_scale(seg: SegmentFrames, cfg) -> float:
    """network -> ORIGINAL pixels scale (letterbox over the decode-scaled
    source, composed with the decode scale — run_segment's rule)."""
    sd = cfg.pipeline.decode_scale_denom
    hs, ws = seg.scaled_hw(sd)
    hd, wd = cfg.detector.image_size
    return min(hd / hs, wd / ws) / sd


def run_segments_sharded(
    pipeline: SegmentPipeline,
    segments: Iterable[SegmentFrames],
    out_dir: str,
    mesh: Optional[Mesh] = None,
    fail_after: Optional[int] = None,
    detections_only: bool = False,
) -> List[dict]:
    """Manifest-resumable sharded fan-out: groups of mesh-size segments run
    in lockstep, one per device (same manifest contract as run_segments).

    Segments are consumed LAZILY (a SegmentFrames can hold a whole segment's
    JPEG bytes — materializing thousands of them would swallow host RAM) and
    grouped by source resolution: a lockstep group is one stacked device
    batch, so mixing e.g. Waymo FRONT (1280x1920) with SIDE (886x1920)
    segments in one group is impossible; per-resolution buckets flush when
    full and at end-of-stream.

    fail_after: test hook matching run_segments — raise after N completed
    segments to exercise manifest resume.
    """
    from waymo_2d_tracking_tpu.parallel.sharding import make_mesh

    mesh = mesh or make_mesh()
    runner = ShardedSegmentRunner(pipeline, mesh)
    from waymo_2d_tracking_tpu.pipeline.manifest import (
        append_manifest,
        load_done_keys,
        segment_key,
    )

    done = load_done_keys(out_dir)

    all_stats = []
    n_run = 0
    g = runner.n_shards

    def _src_hw(seg: SegmentFrames):
        return seg.source_hw()

    def _flush(group):
        nonlocal n_run
        if not group:
            return
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(
                f"fault injection: stopping after {fail_after} segments"
            )
        stats = runner.run_group(group, out_dir,
                                 detections_only=detections_only)
        append_manifest(out_dir, stats)
        all_stats.extend(stats)
        n_run += len(group)

    buckets: dict = {}   # src_hw -> pending segments (each bucket < g long)
    for seg in segments:
        if segment_key(seg.context_name, seg.camera_name) in done:
            continue
        hw = _src_hw(seg)
        bucket = buckets.setdefault(hw, [])
        bucket.append(seg)
        if len(bucket) == g:
            _flush(bucket)
            buckets[hw] = []
    for bucket in buckets.values():
        _flush(bucket)
    return all_stats
