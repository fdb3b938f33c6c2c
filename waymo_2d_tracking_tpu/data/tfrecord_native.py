"""ctypes binding to the native TFRecord scanner (native/tfrecord_reader.cpp).

The reference's ingestion runs through tf.data's C++ TFRecord reader and the
C++ protobuf runtime; this shim is our native equivalent of that hot path:
framing index, per-record metadata (timestamp + camera presence) and keyed
image-bytes extraction — all without the Python interpreter touching record
bytes. Schema field numbers are passed in from data/waymo.py's
``_FRAME_SCHEMA`` so the [RECALLED] numbers stay confined there.

Every entry point returns None/falls back gracefully when the shim can't be
built (data/waymo.py keeps its pure-Python walker as the oracle/fallback).
"""
from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from waymo_2d_tracking_tpu.data import _native


def _configure(lib: ctypes.CDLL) -> None:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.w2t_tfr_index.restype = ctypes.c_longlong
    lib.w2t_tfr_index.argtypes = [
        ctypes.c_char_p, u64p, u64p, ctypes.c_longlong,
    ]
    lib.w2t_tfr_meta.restype = ctypes.c_longlong
    lib.w2t_tfr_meta.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
    ]
    lib.w2t_tfr_extract.restype = ctypes.c_longlong
    lib.w2t_tfr_extract.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
    ]


def _load():
    return _native.load("libw2t_tfrecord.so", _configure)


def is_available() -> bool:
    return _load() is not None


def index(path: str, cap: int = 1 << 20) -> Optional[List[Tuple[int, int]]]:
    """Framing-only (offset, length) index; None if the shim is absent."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.zeros(cap, np.uint64)
    lengths = np.zeros(cap, np.uint64)
    n = lib.w2t_tfr_index(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        cap,
    )
    if n < 0:
        return None
    n = min(int(n), cap)
    return [(int(offsets[i]), int(lengths[i])) for i in range(n)]


def meta(
    path: str,
    n_records: int,
    f_ts: int,
    f_images: int,
    f_cam: int,
    f_img: int,
    cam_ids: Sequence[int],
):
    """One native pass: (timestamps (n,), present (n, n_cams) bool) or None."""
    lib = _load()
    if lib is None:
        return None
    n_cams = len(cam_ids)
    cams = (ctypes.c_int * n_cams)(*cam_ids)
    ts = np.zeros(n_records, np.int64)
    present = np.zeros(n_records * max(n_cams, 1), np.uint8)
    n = lib.w2t_tfr_meta(
        path.encode(), f_ts, f_images, f_cam, f_img, cams, n_cams,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        present.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_records,
    )
    if n < 0 or n != n_records:
        return None
    return ts, present.reshape(n_records, n_cams).astype(bool)


def extract(
    path: str,
    offset: int,
    length: int,
    f_images: int,
    f_cam: int,
    cam_id: int,
    f_img: int,
) -> Optional[bytes]:
    """Camera ``cam_id``'s image bytes from the record at ``offset``.

    Returns b"" when the camera/image is absent in the record; None when the
    shim is unavailable or IO fails (caller falls back to the Python walk).

    One native call: the destination is sized at the record length (an
    embedded bytes field can never exceed its container), so there is no
    size-probe round trip — a probe call would re-read and re-walk the
    whole multi-MB record a second time on this hot path.
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(int(length), np.uint8)
    got = lib.w2t_tfr_extract(
        path.encode(), offset, length, f_images, f_cam, cam_id, f_img,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(length),
    )
    if got == -1:
        return b""
    if got < 0:
        return None
    return buf[: int(got)].tobytes()
