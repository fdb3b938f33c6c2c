"""Video-file frame source for the streaming tracker.

Beyond-parity convenience (the reference consumes Waymo tfrecords only,
SURVEY.md §2 C1): lets `w2t track --online --video clip.mp4` and demo /
integration flows run the exact serving path on any local video without
first re-encoding it as a directory segment. Frames stream one at a time —
nothing is materialized — matching the online path's one-frame-per-dispatch
contract (pipeline/online.py).
"""
from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np


def iter_video_frames(
    path: str, stride: int = 1
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (timestamp_micros, RGB uint8 frame) from a video file.

    Timestamps are synthesized from the container FPS (frame_index / fps),
    which is what the tracker's constant-velocity model expects for a
    constant-rate source. stride > 1 subsamples (every stride-th frame).
    """
    import cv2

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cv2 cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS)
    if not fps or fps <= 0:
        fps = 30.0
    try:
        idx = 0
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            if idx % stride == 0:
                yield int(idx * 1e6 / fps), bgr[:, :, ::-1].copy()
            idx += 1
    finally:
        cap.release()
