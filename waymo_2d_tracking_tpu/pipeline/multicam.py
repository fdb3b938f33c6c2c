"""Multi-camera orchestration (component C18, BASELINE config 4).

All cameras of a frame go through ONE shared-backbone detector batch
(camera = batch axis — "shared backbone batch across cameras"), and each
camera keeps its own tracker state, advanced by a ``vmap``-ped track_step:
S slots x 5 cameras of Kalman/assignment cost the same dispatch as one.
The scan carry is the stacked (num_cams, ...) TrackerState pytree.

Production contract (round 3): chunked streaming with a FIXED chunk size
(one compile per source resolution, not one per segment length), repeat-pad
tails (zero tails of chunk > max_age frames age every live track out of the
final table — the run.py c150d5f bug class), and per-camera ``.gallery.npz``
sidecars so `w2t link` can unify identities across a config-4 context.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waymo_2d_tracking_tpu.config import Config
from waymo_2d_tracking_tpu.data.preprocess import letterbox_batch
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.pipeline.run import RollingFetch, dispatch_detect
from waymo_2d_tracking_tpu.tracker import init_state, track_step
from waymo_2d_tracking_tpu.types import TrackerState


def init_multicam_state(cfg, num_cams: int) -> TrackerState:
    """Stacked per-camera tracker states (leading axis = camera)."""
    single = init_state(cfg.tracker)
    return jax.tree.map(lambda x: jnp.stack([x] * num_cams), single)


from waymo_2d_tracking_tpu.pipeline.link import write_gallery_sidecar  # noqa: E402  (canonical sidecar writer)


class MultiCamPipeline:
    """Chunked multi-camera detect+track.

    chunk layout: frames_u8 (chunk, num_cams, H, W, 3) uint8. The detector
    sees (chunk*num_cams, ...) — one big shared-backbone batch; the tracker
    scans over time with a camera-vmapped step.
    """

    def __init__(self, cfg: Config, num_cams: int = 5, params=None, rng=None):
        self.cfg = cfg
        self.num_cams = num_cams
        self.detector = DetectorRunner(cfg.detector)
        if params is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            params = self.detector.init_params(
                rng, batch_size=cfg.pipeline.chunk_frames * num_cams
            )
        self.params = params
        self._calibrated = False
        self._chunk_step = jax.jit(self._chunk_step_impl, static_argnames=("src_hw",))

    def ensure_calibrated(self, frames_u8, src_hw) -> None:
        """PTQ auto-calibration on the first real multicam chunk
        (detector.quant='int8'): frames_u8 (chunk, cams, H, W, 3) is
        flattened to one shared-backbone batch, matching what the chunk
        step feeds the detector. No-op after the first call / for float."""
        if self._calibrated or self.cfg.detector.quant == "off":
            return
        from waymo_2d_tracking_tpu.pipeline.run import (
            calibrate_params_from_frames,
        )

        flat = np.asarray(frames_u8)
        flat = flat.reshape((-1,) + flat.shape[2:])
        self.params = calibrate_params_from_frames(
            self.detector, self.cfg, self.params, flat, src_hw
        )
        self._calibrated = True

    def _chunk_step_impl(self, params, states, frames_u8, src_hw):
        """(states, (chunk, cams, H, W, 3) u8) -> (states', outputs, scale).

        outputs: TrackOutputs pytree with leading axes (chunk, cams, ...).
        """
        cfg = self.cfg
        t, c = frames_u8.shape[:2]
        flat = frames_u8.reshape((t * c,) + frames_u8.shape[2:])
        images, scale = letterbox_batch(flat, src_hw, cfg.detector.image_size)
        # one driver-wide detection rule (TTA-aware) — a TTA preset run with
        # --multicam used to silently drop TTA here (VERDICT r3 missing #3)
        dets = dispatch_detect(self.detector, cfg, params, images)
        # (t*c, D, ...) -> (t, c, D, ...)
        dets = jax.tree.map(lambda x: x.reshape((t, c) + x.shape[1:]), dets)

        step_cam = jax.vmap(lambda s, d: track_step(s, d, cfg.tracker))

        def step(carry, det_t):
            return step_cam(carry, det_t)

        new_states, outputs = jax.lax.scan(step, states, dets)
        return new_states, outputs, scale

    def run_segments_group(self, segments, out_dir: str):
        """CLI entry: a list of per-camera SegmentFrames of the SAME context
        (equal timestamps) -> per-camera submission JSONL files (+ gallery
        sidecars) + stats.

        Streams fixed-size chunks through ONE jitted step per source
        resolution: per-camera ``chunk_iter`` blocks are stacked on axis 1
        so every chunk is one shared-backbone batch (BASELINE config 4).
        """
        from waymo_2d_tracking_tpu.io_out import submission as subm

        cfg = self.cfg
        chunk = cfg.pipeline.chunk_frames
        sd = cfg.pipeline.decode_scale_denom
        segments = sorted(segments, key=lambda s: s.camera_name)
        assert len({tuple(s.timestamps) for s in segments}) == 1, (
            "multicam group needs aligned timestamps"
        )
        assert len(segments) == self.num_cams
        ctx = segments[0].context_name
        t_total = segments[0].num_frames

        states = init_multicam_state(cfg, self.num_cams)
        iters = [s.chunk_iter(chunk, scale_denom=sd) for s in segments]
        fetcher = RollingFetch(depth=cfg.pipeline.prefetch_depth)
        src_hw = None
        scale = 1.0
        try:
            for _start in range(0, t_total, chunk):
                blocks = [next(it) for it in iters]
                hws = {b.shape[1:3] for b in blocks}
                assert len(hws) == 1, (
                    "multicam shared-backbone batch needs equal-resolution "
                    f"cameras, got {sorted(hws)} — run mixed-resolution "
                    "cameras as separate single-camera segments instead"
                )
                frames = np.stack(blocks, axis=1)   # (chunk, cams, H, W, 3)
                if src_hw is None:
                    src_hw = tuple(frames.shape[2:4])
                self.ensure_calibrated(frames, src_hw)
                states, outputs, scale = self._chunk_step(
                    self.params, states, jnp.asarray(frames), src_hw
                )
                fetcher.push(outputs)   # async, bounded in-flight window
        finally:
            for it in iters:
                it.close()

        outs = fetcher.finish()
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)
        stacked = jax.tree.map(lambda x: x[:t_total], stacked)
        final_states = jax.device_get(states)
        total_scale = float(scale) / sd

        os.makedirs(out_dir, exist_ok=True)
        stats = []
        for ci, seg in enumerate(segments):
            cam_out = jax.tree.map(lambda x: x[:, ci], stacked)
            records = subm.records_from_track_outputs(
                cam_out, ctx, seg.timestamps, seg.camera_name,
                scale=total_scale,
                interp_max_gap=cfg.pipeline.interp_max_gap,
            )
            path = os.path.join(out_dir, f"{ctx}_{seg.camera_name}.jsonl")
            subm.write_jsonl(path, records)
            write_gallery_sidecar(path, final_states, cam_index=ci)
            stats.append({"context": ctx, "camera": seg.camera_name,
                          "frames": seg.num_frames, "records": len(records),
                          "tracks": len({r.object_id for r in records})})
        return stats

    def run(
        self,
        frames: np.ndarray,            # (T, cams, H, W, 3) uint8 host array
        states: TrackerState = None,
    ):
        """Track a multi-camera clip. Returns (states, outputs (T, cams, S)).

        The tail chunk is padded by REPEATING the final real frame — zeros
        would age every live track out through the pad tail (chunk_frames >
        max_age blank frames), wiping the final per-camera track tables that
        feed the gallery sidecars (same fix as run.py commit c150d5f).
        """
        cfg = self.cfg
        chunk = cfg.pipeline.chunk_frames
        t_total = frames.shape[0]
        src_hw = tuple(frames.shape[2:4])
        if states is None:
            states = init_multicam_state(cfg, self.num_cams)
        fetcher = RollingFetch(depth=cfg.pipeline.prefetch_depth)
        for start in range(0, t_total, chunk):
            block = frames[start : start + chunk]
            if block.shape[0] < chunk:
                pad = chunk - block.shape[0]
                block = np.concatenate(
                    [block, np.repeat(block[-1:], pad, axis=0)]
                )
            self.ensure_calibrated(block, src_hw)
            states, outputs, scale = self._chunk_step(
                self.params, states, jnp.asarray(block), src_hw
            )
            fetcher.push(outputs)   # async, bounded in-flight window
        outs = fetcher.finish()
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)
        stacked = jax.tree.map(lambda x: x[:t_total], stacked)
        return states, stacked, scale


def run_context_groups(
    pipeline: MultiCamPipeline,
    segments,
    out_dir: str,
    fail_after=None,
):
    """Manifest-resumable single-device multicam driver (`w2t track
    --multicam`): per-camera segments grouped into contexts; completed
    (context, camera) keys recorded in manifest.jsonl and skipped on rerun —
    the same failure-recovery contract as run_segments /
    run_context_groups_sharded (the non-sharded config-4 path used to be
    the one driver without resume).

    fail_after: test hook — raise after N completed contexts.
    """
    from waymo_2d_tracking_tpu.pipeline.manifest import (
        append_manifest,
        load_done_keys,
        segment_key,
    )

    done = load_done_keys(out_dir)

    by_ctx: Dict[str, List] = {}
    for seg in segments:
        by_ctx.setdefault(seg.context_name, []).append(seg)

    all_stats: List[dict] = []
    n_run = 0
    for ctx in sorted(by_ctx):
        segs = by_ctx[ctx]
        assert len(segs) == pipeline.num_cams, (
            f"context {ctx} has {len(segs)} cameras, "
            f"pipeline expects {pipeline.num_cams}"
        )
        if all(segment_key(s.context_name, s.camera_name) in done for s in segs):
            continue
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(
                f"fault injection: stopping after {fail_after} contexts"
            )
        stats = pipeline.run_segments_group(segs, out_dir)
        append_manifest(out_dir, stats)
        all_stats.extend(stats)
        n_run += 1
    return all_stats
