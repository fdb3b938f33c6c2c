"""Per-segment orchestration (component C20): the detect->track hot path.

Architecture (vs the reference's per-frame host loop, SURVEY.md §3.1):

  host:   stream frames -> JPEG decode -> uint8 chunks -> prefetch thread
          (double-buffered device_put, C3)
  device: ONE jitted chunk_step per `chunk_frames` frames:
            preprocess (resize/normalize/letterbox, C2)
            -> batched detector forward over the whole chunk (MXU loves
               batch; this is where the 1-frame-at-a-time reference loses)
            -> lax.scan of track_step over the chunk's frames (C17)
          carry = tracker state; emitted = small (id, box) arrays
  host:   tiny per-chunk outputs -> submission records (C21)

Control crosses host<->device once per chunk, not per frame. Failure
recovery (SURVEY.md §5): per-segment outputs are idempotent files plus a
manifest; rerun skips completed segments.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import logging
import os
import time
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waymo_2d_tracking_tpu.config import Config
from waymo_2d_tracking_tpu.data.preprocess import letterbox_batch
from waymo_2d_tracking_tpu.data.prefetch import DevicePrefetcher
from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.tracker import init_state, track_step
from waymo_2d_tracking_tpu.types import Detections, TrackOutputs


@dataclasses.dataclass
class SegmentFrames:
    """A segment's frames for one camera, host-side.

    frames: (T, H, W, 3) uint8 (already decoded); or provide `jpeg_frames`
    as a list of encoded bytes to decode lazily in the prefetch thread.
    """

    context_name: str
    camera_name: int
    timestamps: Sequence[int]
    frames: Optional[np.ndarray] = None
    jpeg_frames: Optional[List[bytes]] = None
    _src_hw: Optional[Tuple[int, int]] = dataclasses.field(
        default=None, repr=False
    )

    @property
    def num_frames(self) -> int:
        return len(self.timestamps)

    def source_hw(self) -> Tuple[int, int]:
        """Full-resolution (H, W) of this camera's frames, cached.

        One JPEG header probe per segment instead of one FULL DECODE per
        probe site — the resolution-bucketing, scale and decoder-sizing
        probes used to each pay a full-res decode (review r3 finding);
        jpeg_dims (review r4) drops even the one decode to a marker walk."""
        if self._src_hw is None:
            if self.frames is not None:
                self._src_hw = tuple(self.frames.shape[1:3])
            else:
                blob = bytes(self.jpeg_frames[0])
                try:
                    from waymo_2d_tracking_tpu.data.jpeg import jpeg_dims

                    self._src_hw = jpeg_dims(blob)
                except ValueError:  # exotic stream: fall back to a decode
                    from waymo_2d_tracking_tpu.data.preprocess import (
                        decode_jpeg_host,
                    )

                    self._src_hw = tuple(decode_jpeg_host(blob).shape[:2])
        return self._src_hw

    def scaled_hw(self, scale_denom: int = 1) -> Tuple[int, int]:
        """(H, W) after libjpeg DCT-scaled decode: ceil(src / denom)."""
        h, w = self.source_hw()
        return (-(-h // scale_denom), -(-w // scale_denom))

    def chunk_iter(self, chunk: int, scale_denom: int = 1) -> Iterator[np.ndarray]:
        """Yield (chunk, H, W, 3) uint8 arrays; the last chunk is padded by
        REPEATING the final real frame (not zeros: the tracker scan treats
        pad frames as real ones, and a zero tail of chunk_frames > max_age
        blanks would age out every live track — leaving the end-of-segment
        track table, which feeds the .gallery.npz sidecar for cross-camera
        linking, empty). Pad-frame outputs are trimmed by the caller either
        way; repeats keep the carried state alive.

        JPEG sources decode through the native thread-pool shim
        (data/jpeg.py; cv2 fallback) — one batched GIL-free call per chunk.
        """
        t = self.num_frames
        decoder = None
        if self.frames is None and self.jpeg_frames:
            from waymo_2d_tracking_tpu.data.jpeg import BatchJpegDecoder

            # libjpeg scaled-output rounding: ceil(src / denom)
            sh, sw = self.scaled_hw(scale_denom)
            decoder = BatchJpegDecoder(sh, sw, scale_denom=scale_denom)
        try:
            for start in range(0, t, chunk):
                if self.frames is not None:
                    block = self.frames[start : start + chunk]
                    if scale_denom > 1:
                        import cv2

                        h, w = block.shape[1:3]
                        sh, sw = -(-h // scale_denom), -(-w // scale_denom)
                        block = np.stack([
                            cv2.resize(f, (sw, sh),
                                       interpolation=cv2.INTER_AREA)
                            for f in block
                        ])
                else:
                    block = decoder.decode(self.jpeg_frames[start : start + chunk])
                if block.shape[0] < chunk:
                    pad = chunk - block.shape[0]
                    block = np.concatenate(
                        [block, np.repeat(block[-1:], pad, axis=0)]
                    )
                yield block
        finally:
            if decoder is not None:
                decoder.close()


def calibrate_params_from_frames(
    detector: DetectorRunner, cfg: Config, params, frames_u8, src_hw
):
    """PTQ auto-calibration hook shared by ALL serving drivers
    (detector.quant='int8'): letterbox the first real chunk exactly like
    the serving path and record activation absmax scales via one float
    pass (models/quant.py). No-op for float configs and already-calibrated
    params (e.g. restored from a calibrated checkpoint). Returns the
    (possibly updated) params and enforces the calibration guard — after
    this call the params are certified for quantized serving or an error
    was raised (ADVICE r3 high: OnlineTracker/MultiCamPipeline/sharded/
    serve used to silently serve uncalibrated int8 with 1.0-scale
    fallbacks)."""
    if cfg.detector.quant == "off":
        return params
    from waymo_2d_tracking_tpu.models.quant import is_calibrated

    if not is_calibrated(params):
        images, _ = letterbox_batch(
            jnp.asarray(frames_u8), src_hw, cfg.detector.image_size
        )
        params = detector.calibrate(params, images)
        logging.getLogger(__name__).info(
            "int8 PTQ: calibrated activation scales on one %s-frame chunk",
            images.shape[0],
        )
    detector.check_calibrated(params)
    return params


def tta_active(p) -> bool:
    """True when the preset's TTA knobs request a multi-view candidate union."""
    return bool(p.tta_flip) or tuple(p.tta_scales) != (1.0,)


def dispatch_detect(detector: DetectorRunner, cfg: Config, params, images) -> Detections:
    """THE detection dispatch rule, shared by all four drivers
    (SegmentPipeline, MultiCamPipeline, OnlineTracker,
    OnlineMultiCamTracker) and both halves of the detect/track split:
    plain batched forward, or the TTA candidate union when the preset
    enables it.

    History: round 3 unified detect-vs-track (a config-5 preset's `w2t
    detect` silently produced non-TTA detections), but the multicam drivers
    still called ``_detect_impl`` directly — `--multicam` under a TTA preset
    dropped TTA with no error (VERDICT r3 missing #3). Round 5 routed the
    fifth and last surface, the SavedModel export (io_out/export_tf.py),
    through here too. Centralizing the rule makes that bug class
    structural: anything that wants detections goes through this function.
    """
    if tta_active(cfg.pipeline):
        from waymo_2d_tracking_tpu.pipeline.tta import detect_tta_batch

        return detect_tta_batch(
            detector.module, params, images, cfg.detector,
            scales=tuple(cfg.pipeline.tta_scales),
            flip=cfg.pipeline.tta_flip,
            interpret=detector._interpret,
        )
    return detector._detect_impl(params, images)


class RollingFetch:
    """Bounded-window async output collection for chunk-dispatch loops.

    ``push`` keeps dispatch asynchronous but allows at most ``depth`` chunk
    steps in flight: once the window is full, the OLDEST chunk's outputs
    are fetched, which blocks until that step finished — re-establishing
    the backpressure the old per-chunk ``device_get`` provided. Without a
    bound, a host that decodes faster than the device computes (cheap
    DCT-scaled decode + heavy TTA step, or pre-decoded frames) would
    enqueue a whole segment of chunk INPUT buffers into HBM
    (O(num_chunks) x (chunk, H, W, 3) — gigabytes at multicam shapes)
    where the loop used to run in O(1) chunk memory.

    ``finish`` fetches the remaining window with ONE ``jax.device_get``
    (a list is a pytree), overlapping the device->host copies.
    """

    def __init__(self, depth: int = 2):
        self.depth = max(int(depth), 1)
        self._dev: List = []
        self._host: List = []

    def push(self, outputs) -> None:
        self._dev.append(outputs)
        if len(self._dev) > self.depth:
            self._host.append(jax.device_get(self._dev.pop(0)))

    def finish(self) -> List:
        self._host.extend(jax.device_get(self._dev))
        self._dev = []
        return self._host


class SegmentPipeline:
    """Holds jitted chunk_step; reusable across segments (compile once)."""

    def __init__(self, cfg: Config, params=None, rng=None):
        self.cfg = cfg
        self.detector = DetectorRunner(cfg.detector)
        if params is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            params = self.detector.init_params(
                rng, batch_size=cfg.pipeline.chunk_frames
            )
        self.params = params
        self._calibrated = False
        # donate the carried tracker state: the old table's buffers (cov is
        # S*64 floats) are reused in place instead of reallocated per chunk
        self._chunk_step = jax.jit(
            self._chunk_step_impl, static_argnames=("src_hw",),
            donate_argnums=(1,),
        )
        self._detect_chunk = jax.jit(
            self._detect_chunk_impl, static_argnames=("src_hw",)
        )

    def ensure_calibrated(self, frames_u8, src_hw) -> None:
        """PTQ auto-calibration (detector.quant='int8'): record activation
        scales from the first real chunk (SURVEY-style host boundary: one
        extra float pass, once per process). Delegates to the driver-shared
        calibrate_params_from_frames; no-op after the first call."""
        if self._calibrated or self.cfg.detector.quant == "off":
            return
        self.params = calibrate_params_from_frames(
            self.detector, self.cfg, self.params, frames_u8, src_hw
        )
        self._calibrated = True

    def _detect_chunk_impl(self, params, frames_u8, src_hw):
        """Detection-only chunk (config-1 producer / `detect` CLI).

        Honors the preset's TTA settings (VERDICT r2 weak #6: `w2t detect`
        under the config-5 preset silently produced non-TTA detections
        while `track` on the same preset used TTA — the two halves of the
        sweep disagreed)."""
        images, scale = letterbox_batch(
            frames_u8, src_hw, self.cfg.detector.image_size
        )
        return self._detect_images(params, images), scale

    def _detect_images(self, params, images) -> Detections:
        """Delegates to the one driver-wide dispatch rule (dispatch_detect)."""
        return dispatch_detect(self.detector, self.cfg, params, images)

    @property
    def _tta_active(self) -> bool:
        return tta_active(self.cfg.pipeline)

    def _chunk_step_impl(self, params, tracker_state, frames_u8, src_hw):
        """frames_u8 (chunk, Hs, Ws, 3) uint8 -> (new_state, outputs, scale)."""
        images, scale = letterbox_batch(
            frames_u8, src_hw, self.cfg.detector.image_size
        )
        # config 5: multi-scale/flip candidate union, one merged NMS
        dets: Detections = self._detect_images(params, images)

        def step(carry, det):
            return track_step(carry, det, self.cfg.tracker)

        new_state, outputs = jax.lax.scan(step, tracker_state, dets)
        return new_state, outputs, scale

    def run_segment(
        self,
        segment: SegmentFrames,
        detections_only: bool = False,
    ) -> Tuple[List[subm.TrackRecord], dict]:
        """Full detect->track over one camera's segment. Returns (records,
        stats). The tracker state carries across chunks within the segment."""
        cfg = self.cfg
        chunk = cfg.pipeline.chunk_frames
        sd = cfg.pipeline.decode_scale_denom
        t_total = segment.num_frames
        src_hw = segment.scaled_hw(sd)

        state = init_state(cfg.tracker)
        self.last_state = None   # final track table (cross-camera linking)
        scale = 1.0
        t0 = time.perf_counter()
        # context-managed prefetch: an exception mid-segment (or any early
        # exit) unblocks and joins the worker thread and closes the chunk
        # iterator + its native decoder (VERDICT r2 weak #5)
        # Async dispatch with a bounded in-flight window (RollingFetch):
        # the device pipelines up to prefetch_depth chunk steps while the
        # host neither blocks per chunk nor runs unboundedly ahead.
        fetcher = RollingFetch(depth=cfg.pipeline.prefetch_depth)
        with DevicePrefetcher(
            segment.chunk_iter(chunk, scale_denom=sd),
            depth=cfg.pipeline.prefetch_depth,
        ) as prefetcher:
            for dev_chunk in prefetcher:
                self.ensure_calibrated(dev_chunk, src_hw)
                if detections_only:
                    dets, scale = self._detect_chunk(
                        self.params, dev_chunk, src_hw
                    )
                    fetcher.push(dets)
                else:
                    state, outputs, scale = self._chunk_step(
                        self.params, state, dev_chunk, src_hw
                    )
                    fetcher.push(outputs)
        outputs_host = fetcher.finish()
        if not detections_only:
            self.last_state = jax.device_get(state)
        wall = time.perf_counter() - t0

        # concat chunks, trim padding frames
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outputs_host)
        stacked = jax.tree.map(lambda x: x[:t_total], stacked)
        # network -> ORIGINAL source pixels: the letterbox scale maps to the
        # (possibly decode-downscaled) source, the decode scale the rest
        total_scale = float(scale) / sd
        if detections_only:
            records = subm.records_from_detections(
                stacked,
                segment.context_name,
                segment.timestamps,
                segment.camera_name,
                scale=total_scale,
            )
        else:
            records = subm.records_from_track_outputs(
                stacked,
                segment.context_name,
                segment.timestamps,
                segment.camera_name,
                scale=total_scale,
                interp_max_gap=self.cfg.pipeline.interp_max_gap,
            )
        stats = {
            "context": segment.context_name,
            "camera": segment.camera_name,
            "frames": t_total,
            "tracks": len({r.object_id for r in records}),
            "records": len(records),
            "wall_s": round(wall, 4),
            "fps": round(t_total / wall, 1) if wall > 0 else None,
        }
        return records, stats


def run_segments(
    pipeline: SegmentPipeline,
    segments: Iterable[SegmentFrames],
    out_dir: str,
    fail_after: Optional[int] = None,
) -> List[dict]:
    """Drive many segments with manifest-based resume (SURVEY.md §5 failure
    recovery): completed segments are recorded in manifest.jsonl and skipped
    on rerun; per-segment output files are idempotent.

    fail_after: test hook — raise after N segments to exercise resume.
    """
    from waymo_2d_tracking_tpu.pipeline.manifest import (
        append_manifest,
        load_done_keys,
        segment_key,
    )

    done = load_done_keys(out_dir)
    all_stats = []
    n_run = 0
    for seg in segments:
        key = segment_key(seg.context_name, seg.camera_name)
        if key in done:
            continue
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(f"fault injection: stopping after {fail_after} segments")
        records, stats = pipeline.run_segment(seg)
        seg_file = os.path.join(
            out_dir, f"{seg.context_name}_{seg.camera_name}.jsonl"
        )
        subm.write_jsonl(seg_file, records)
        # gallery sidecar: final track-table embeddings for cross-camera /
        # long-horizon re-ID linking (pipeline/link.py, `w2t link`)
        state = getattr(pipeline, "last_state", None)
        if state is not None:
            from waymo_2d_tracking_tpu.pipeline.link import (
                write_gallery_sidecar,
            )

            write_gallery_sidecar(seg_file, state)
        append_manifest(out_dir, [stats])
        all_stats.append(stats)
        n_run += 1
    return all_stats
