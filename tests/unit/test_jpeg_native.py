"""Native JPEG decoder (native/jpeg_decode.cpp via ctypes) vs cv2 oracle."""
import time

import numpy as np
import pytest

from waymo_2d_tracking_tpu.data.jpeg import BatchJpegDecoder, build_native

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpegs():
    rng = np.random.default_rng(0)
    out = []
    for i in range(16):
        # smooth-ish image (random noise stresses the entropy decoder
        # unrealistically, but works too)
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 3)
        ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        out.append(enc.tobytes())
    return out


def test_native_builds():
    assert build_native() is not None, "native shim failed to build"


def test_native_matches_cv2(jpegs):
    dec = BatchJpegDecoder(96, 128, n_threads=4, native=True)
    assert dec.is_native
    got = dec.decode(jpegs)
    ref = BatchJpegDecoder(96, 128, native=False).decode(jpegs)
    # same libjpeg family; allow tiny IDCT implementation differences
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 2, diff.max()
    dec.close()


def test_size_mismatch_zeroed(jpegs):
    dec = BatchJpegDecoder(64, 64, n_threads=2, native=True)
    out = dec.decode(jpegs[:2])  # wrong expected size -> zeros
    assert out.shape == (2, 64, 64, 3)
    assert not out.any()
    dec.close()


def test_corrupt_input_zeroed(jpegs):
    dec = BatchJpegDecoder(96, 128, n_threads=2, native=True)
    batch = [jpegs[0], b"not a jpeg", jpegs[1][: len(jpegs[1]) // 4]]
    out = dec.decode(batch)
    assert out[0].any()
    assert not out[1].any()
    dec.close()


def test_throughput_exceeds_cv2_loop(jpegs):
    """The point of the shim: parallel decode beats the serial loop."""
    batch = jpegs * 8  # 128 images
    native = BatchJpegDecoder(96, 128, n_threads=8, native=True)
    fallback = BatchJpegDecoder(96, 128, native=False)
    native.decode(batch)  # warm the pool

    t0 = time.perf_counter()
    for _ in range(3):
        native.decode(batch)
    t_native = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(3):
        fallback.decode(batch)
    t_cv2 = (time.perf_counter() - t0) / 3
    native.close()
    # should be several-x; assert a conservative margin to avoid flakes
    assert t_native < t_cv2, (t_native, t_cv2)
