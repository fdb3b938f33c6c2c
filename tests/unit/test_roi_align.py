"""Unit tests for ops/roi_align.py (C10) — vs direct numpy oracle.

Oracle implements the aligned=True RoIAlign algorithm exactly as the
torchvision CUDA kernel does (per-sample bilinear, average pooled), written
independently in numpy loops.
"""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.ops.roi_align import roi_align, roi_align_multilevel


def np_roi_align(features, boxes, spatial_scale, output_size, sampling_ratio):
    """Oracle: direct per-sample bilinear implementation (aligned=True)."""
    h, w, c = features.shape
    p = output_size
    s = sampling_ratio
    out = np.zeros((len(boxes), p, p, c), np.float64)
    for r, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1 = bx1 * spatial_scale - 0.5
        y1 = by1 * spatial_scale - 0.5
        x2 = bx2 * spatial_scale - 0.5
        y2 = by2 * spatial_scale - 0.5
        bw = (x2 - x1) / p
        bh = (y2 - y1) / p
        for i in range(p):
            for j in range(p):
                acc = np.zeros(c)
                for a in range(s):
                    for b in range(s):
                        y = y1 + (i + (a + 0.5) / s) * bh
                        x = x1 + (j + (b + 0.5) / s) * bw
                        if y < -1 or y > h or x < -1 or x > w:
                            continue
                        y_ = min(max(y, 0.0), h - 1)
                        x_ = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1c, x1c = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (
                            features[y0, x0] * (1 - ly) * (1 - lx)
                            + features[y0, x1c] * (1 - ly) * lx
                            + features[y1c, x0] * ly * (1 - lx)
                            + features[y1c, x1c] * ly * lx
                        )
                out[r, i, j] = acc / (s * s)
    return out


def test_vs_oracle_random():
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (24, 32, 5)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 44.0],
            [0.0, 0.0, 128.0, 96.0],   # whole image
            [30.0, 20.0, 50.0, 30.0],  # small
            [-10.0, -10.0, 20.0, 20.0],  # partially outside
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.asarray(feats), jnp.asarray(boxes), spatial_scale=0.25,
                  output_size=7, sampling_ratio=2)
    )
    want = np_roi_align(feats, boxes, 0.25, 7, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_constant_feature_preserved():
    # pooling a constant map inside the image must return that constant
    feats = np.full((16, 16, 3), 2.5, np.float32)
    boxes = np.array([[2.0, 2.0, 12.0, 12.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes),
                               spatial_scale=1.0, output_size=4, sampling_ratio=2))
    np.testing.assert_allclose(got, 2.5, atol=1e-5)


def test_chunking_invariance():
    rng = np.random.default_rng(1)
    feats = rng.normal(0, 1, (20, 20, 4)).astype(np.float32)
    xy = rng.uniform(0, 10, (10, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(2, 8, (10, 2))], 1).astype(np.float32)
    a = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), roi_chunk=4))
    b = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), roi_chunk=16))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_multilevel_routing():
    rng = np.random.default_rng(2)
    levels = {3: jnp.asarray(rng.normal(0, 1, (80, 120, 4)).astype(np.float32)),
              4: jnp.asarray(rng.normal(0, 1, (40, 60, 4)).astype(np.float32))}
    strides = {3: 8, 4: 16}
    boxes = np.array(
        [[10, 10, 110, 110],      # sqrt(area)=100 -> lvl 3 (floor(4+log2(100/224)))
         [0, 0, 500, 500]],       # sqrt(area)=500 -> lvl 4
        np.float32,
    )
    out = np.asarray(
        roi_align_multilevel(levels, jnp.asarray(boxes), strides, output_size=7)
    )
    # each box equals single-level roi_align at its routed level
    want0 = np.asarray(roi_align(levels[3], jnp.asarray(boxes[:1]), 1 / 8, 7))
    want1 = np.asarray(roi_align(levels[4], jnp.asarray(boxes[1:]), 1 / 16, 7))
    np.testing.assert_allclose(out[0], want0[0], atol=1e-5)
    np.testing.assert_allclose(out[1], want1[0], atol=1e-5)


def test_pallas_matches_xla():
    """Pallas kernel (interpret on CPU) vs the XLA separable-matmul path."""
    from waymo_2d_tracking_tpu.ops.roi_align import pallas_roi_align

    rng = np.random.default_rng(3)
    feats = rng.normal(0, 1, (16, 24, 8)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 44.0],
            [0.0, 0.0, 96.0, 64.0],
            [-8.0, -8.0, 30.0, 30.0],
            [50.0, 30.0, 70.0, 44.0],
        ],
        np.float32,
    )
    want = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes),
                                spatial_scale=0.25, output_size=7,
                                sampling_ratio=2))
    got = np.asarray(pallas_roi_align(jnp.asarray(feats), jnp.asarray(boxes),
                                      spatial_scale=0.25, output_size=7,
                                      sampling_ratio=2, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_batched_matches_per_image():
    from waymo_2d_tracking_tpu.ops.roi_align import roi_align_batched

    rng = np.random.default_rng(11)
    n, h, w, c = 3, 24, 32, 8
    feats = rng.standard_normal((n, h, w, c)).astype(np.float32)
    r = 10
    xy = rng.uniform(0, 100, size=(n, r, 2))
    wh = rng.uniform(8, 60, size=(n, r, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)

    got = np.asarray(
        roi_align_batched(jnp.asarray(feats), jnp.asarray(boxes),
                          spatial_scale=0.25, output_size=7, roi_chunk=4)
    )
    assert got.shape == (n, r, 7, 7, c)
    for i in range(n):
        want = np.asarray(
            roi_align(jnp.asarray(feats[i]), jnp.asarray(boxes[i]),
                      spatial_scale=0.25, output_size=7)
        )
        np.testing.assert_allclose(got[i], want, atol=1e-5, rtol=1e-5,
                                   err_msg=f"img {i}")


def test_roi_align_multilevel_batched_matches_per_image():
    from waymo_2d_tracking_tpu.ops.roi_align import (
        roi_align_multilevel,
        roi_align_multilevel_batched,
    )

    rng = np.random.default_rng(5)
    n = 2
    levels = {3: jnp.asarray(rng.standard_normal((n, 16, 24, 4)).astype(np.float32)),
              4: jnp.asarray(rng.standard_normal((n, 8, 12, 4)).astype(np.float32))}
    strides = {3: 8, 4: 16}
    # one small box (routes to P3), one large (routes to P4)
    boxes = np.array([[[8, 8, 40, 40], [0, 0, 180, 120]],
                      [[16, 16, 60, 52], [4, 4, 190, 126]]], np.float32)
    got = np.asarray(
        roi_align_multilevel_batched(levels, jnp.asarray(boxes), strides,
                                     output_size=5)
    )
    for i in range(n):
        want = np.asarray(
            roi_align_multilevel({k: v[i] for k, v in levels.items()},
                                 jnp.asarray(boxes[i]), strides, output_size=5)
        )
        np.testing.assert_allclose(got[i], want, atol=1e-5, rtol=1e-5)
