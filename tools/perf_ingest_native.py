"""Native vs Python TFRecord ingestion timing (round 3).

Builds a realistic synthetic segment (records of a few MB like real Waymo
frames), then times (a) the metadata pass (timestamps + camera presence)
and (b) lazy per-chunk JPEG fetch, native (libw2t_tfrecord.so) vs the
pure-Python protolite walk.

Run: python tools/perf_ingest_native.py
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waymo_2d_tracking_tpu.data import tfrecord_native, waymo

T = 60
CAMS = (1, 2, 3, 4, 5)


def build(tmp):
    import cv2

    rng = np.random.default_rng(0)
    # ~0.7 MB per camera image -> ~3.5 MB records, Waymo-like
    img = rng.integers(0, 255, (1280, 1920, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 85])
    jpeg = enc.tobytes()
    frames = [
        waymo.encode_frame("ctxP", 1000 * t, images={c: jpeg for c in CAMS})
        for t in range(T)
    ]
    path = os.path.join(tmp, "seg.tfrecord")
    waymo.write_tfrecord(path, frames)
    return path, len(jpeg)


def time_meta(path, native: bool):
    s = waymo._FRAME_SCHEMA
    positions = waymo.index_tfrecord(path)
    t0 = time.perf_counter()
    if native:
        out = tfrecord_native.meta(
            path, len(positions), s["frame.timestamp"], s["frame.images"],
            s["camera_image.name"], s["camera_image.image"], list(CAMS),
        )
        assert out is not None
    else:
        for off, ln in positions:
            fr = waymo.parse_frame(waymo.read_record_at(path, off, ln),
                                   want_labels=False)
            for c in CAMS:
                bool(fr["images"].get(c))
    return time.perf_counter() - t0


def time_fetch(path, native: bool, chunk=8):
    s = waymo._FRAME_SCHEMA
    positions = waymo.index_tfrecord(path)
    lazy = waymo.TfrecordCameraJpegs(path, 1, positions)
    if not native:
        # force the Python fallback
        orig = tfrecord_native.extract
        tfrecord_native.extract = lambda *a, **k: None
    t0 = time.perf_counter()
    total = 0
    for start in range(0, T, chunk):
        for b in lazy[start : start + chunk]:
            total += len(b)
    dt = time.perf_counter() - t0
    if not native:
        tfrecord_native.extract = orig
    return dt, total


if __name__ == "__main__":
    tmp = tempfile.mkdtemp()
    path, jpeg_len = build(tmp)
    size_mb = os.path.getsize(path) / 1e6
    res = {"file_mb": round(size_mb, 1), "records": T, "cams": len(CAMS)}
    res["meta_native_s"] = round(min(time_meta(path, True) for _ in range(3)), 4)
    res["meta_python_s"] = round(min(time_meta(path, False) for _ in range(2)), 4)
    dn, tn = time_fetch(path, True)
    dp, tp = time_fetch(path, False)
    assert tn == tp
    res["fetch_cam_native_s"] = round(dn, 4)
    res["fetch_cam_python_s"] = round(dp, 4)
    res["meta_speedup"] = round(res["meta_python_s"] / res["meta_native_s"], 1)
    res["fetch_speedup"] = round(dp / dn, 1)
    print(json.dumps(res))
