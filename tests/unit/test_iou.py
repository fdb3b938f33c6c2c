"""Unit tests for ops/iou.py (C12) — closed-form cases + numpy oracle."""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.ops.iou import pairwise_iou, box_area


def np_pairwise_iou(a, b):
    """Oracle: plain numpy loop implementation."""
    out = np.zeros((len(a), len(b)))
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            ix1, iy1 = max(p[0], q[0]), max(p[1], q[1])
            ix2, iy2 = min(p[2], q[2]), min(p[3], q[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            area_p = max(p[2] - p[0], 0) * max(p[3] - p[1], 0)
            area_q = max(q[2] - q[0], 0) * max(q[3] - q[1], 0)
            union = area_p + area_q - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_identity_box():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert np.allclose(pairwise_iou(b, b), [[1.0]])


def test_disjoint_and_half_overlap():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[20.0, 20.0, 30.0, 30.0], [0.0, 0.0, 5.0, 10.0]])
    got = np.asarray(pairwise_iou(a, b))
    assert np.allclose(got, [[0.0, 0.5]])


def test_degenerate_boxes():
    a = jnp.array([[5.0, 5.0, 5.0, 5.0]])  # zero area
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    got = np.asarray(pairwise_iou(a, b))
    assert np.allclose(got, [[0.0]])
    assert float(box_area(a)[0]) == 0.0


def test_random_vs_numpy_oracle():
    rng = np.random.default_rng(0)
    for _ in range(5):
        xy = rng.uniform(0, 100, size=(12, 2))
        wh = rng.uniform(1, 50, size=(12, 2))
        a = np.concatenate([xy, xy + wh], axis=1)
        xy = rng.uniform(0, 100, size=(7, 2))
        wh = rng.uniform(1, 50, size=(7, 2))
        b = np.concatenate([xy, xy + wh], axis=1)
        got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_pairwise_iou(a, b), atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 50, size=(3, 4, 4)).astype(np.float32)
    a[..., 2:] += a[..., :2]
    b = rng.uniform(0, 50, size=(3, 6, 4)).astype(np.float32)
    b[..., 2:] += b[..., :2]
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (3, 4, 6)
    for k in range(3):
        np.testing.assert_allclose(got[k], np_pairwise_iou(a[k], b[k]), atol=1e-5)
