"""Multi-camera orchestration (component C18, BASELINE config 4).

All 5 cameras of a frame go through ONE shared-backbone detector batch
(camera = batch axis — "shared backbone batch across cameras"), and each
camera keeps its own tracker state, advanced by a ``vmap``-ped track_step:
S slots x 5 cameras of Kalman/assignment cost the same dispatch as one.
The scan carry is the stacked (num_cams, ...) TrackerState pytree.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waymo_2d_tracking_tpu.config import Config
from waymo_2d_tracking_tpu.data.preprocess import letterbox_batch
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.tracker import init_state, track_step
from waymo_2d_tracking_tpu.types import TrackerState


def init_multicam_state(cfg, num_cams: int) -> TrackerState:
    """Stacked per-camera tracker states (leading axis = camera)."""
    single = init_state(cfg.tracker)
    return jax.tree.map(lambda x: jnp.stack([x] * num_cams), single)


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
        self._chunk_step = jax.jit(self._chunk_step_impl, static_argnames=("src_hw",))

    def _chunk_step_impl(self, params, states, frames_u8, src_hw):
        """(states, (chunk, cams, H, W, 3) u8) -> (states', outputs, scale).

        outputs: TrackOutputs pytree with leading axes (chunk, cams, ...).
        """
        cfg = self.cfg
        t, c = frames_u8.shape[:2]
        flat = frames_u8.reshape((t * c,) + frames_u8.shape[2:])
        images, scale = letterbox_batch(flat, src_hw, cfg.detector.image_size)
        dets = self.detector._detect_impl(params, images)
        # (t*c, D, ...) -> (t, c, D, ...)
        dets = jax.tree.map(lambda x: x.reshape((t, c) + x.shape[1:]), dets)

        step_cam = jax.vmap(lambda s, d: track_step(s, d, cfg.tracker))

        def step(carry, det_t):
            return step_cam(carry, det_t)

        new_states, outputs = jax.lax.scan(step, states, dets)
        return new_states, outputs, scale

    def run_segments_group(self, segments, out_dir: str):
        """CLI entry: a list of per-camera SegmentFrames of the SAME context
        (equal timestamps) -> per-camera submission JSONL files + stats.

        Cameras are stacked on axis 1 so every chunk is one shared-backbone
        batch (BASELINE config 4)."""
        import os

        from waymo_2d_tracking_tpu.io_out import submission as subm

        segments = sorted(segments, key=lambda s: s.camera_name)
        assert len({tuple(s.timestamps) for s in segments}) == 1, (
            "multicam group needs aligned timestamps"
        )
        assert len(segments) == self.num_cams
        ctx = segments[0].context_name
        per_cam = []
        for seg in segments:
            chunks = list(seg.chunk_iter(seg.num_frames))  # one block, full T
            per_cam.append(chunks[0][: seg.num_frames])
        frames = np.stack(per_cam, axis=1)                  # (T, cams, H, W, 3)
        states, outputs, scale = self.run(frames)

        os.makedirs(out_dir, exist_ok=True)
        stats = []
        for ci, seg in enumerate(segments):
            cam_out = jax.tree.map(lambda x: x[:, ci], outputs)
            records = subm.records_from_track_outputs(
                cam_out, ctx, seg.timestamps, seg.camera_name,
                scale=float(scale),
            )
            path = os.path.join(out_dir, f"{ctx}_{seg.camera_name}.jsonl")
            subm.write_jsonl(path, records)
            stats.append({"context": ctx, "camera": seg.camera_name,
                          "frames": seg.num_frames, "records": len(records)})
        return stats

    def run(
        self,
        frames: np.ndarray,            # (T, cams, H, W, 3) uint8 host array
        states: TrackerState = None,
    ):
        """Track a multi-camera clip. Returns (states, outputs (T, cams, S))."""
        cfg = self.cfg
        chunk = cfg.pipeline.chunk_frames
        t_total = frames.shape[0]
        src_hw = tuple(frames.shape[2:4])
        if states is None:
            states = init_multicam_state(cfg, self.num_cams)
        outs: List = []
        for start in range(0, t_total, chunk):
            block = frames[start : start + chunk]
            if block.shape[0] < chunk:
                pad = chunk - block.shape[0]
                block = np.concatenate(
                    [block, np.zeros((pad,) + block.shape[1:], block.dtype)]
                )
            states, outputs, scale = self._chunk_step(
                self.params, states, jnp.asarray(block), src_hw
            )
            outs.append(jax.device_get(outputs))
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)
        stacked = jax.tree.map(lambda x: x[:t_total], stacked)
        return states, stacked, scale
