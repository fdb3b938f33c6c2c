"""Unit tests for ops/topk.py (C9) — Pallas threshold kernel vs lax.top_k."""
import numpy as np
import jax.numpy as jnp
import jax

from waymo_2d_tracking_tpu.ops.topk import pallas_topk_threshold, topk, topk_mask


def test_threshold_matches_sorted_kth():
    rng = np.random.default_rng(0)
    for n, k in [(100, 10), (1000, 100), (5000, 1000), (64, 64)]:
        s = rng.normal(0, 1, n).astype(np.float32)
        kth, n_above = pallas_topk_threshold(jnp.asarray(s), k, interpret=True)
        expected = np.sort(s)[::-1][k - 1]
        assert float(kth) == expected, (n, k)
        assert int(n_above) == (s > expected).sum()


def test_threshold_with_ties():
    s = np.array([5.0, 3.0, 5.0, 5.0, 1.0, 3.0, 0.0, 2.0], np.float32)
    kth, n_above = pallas_topk_threshold(jnp.asarray(s), 4, interpret=True)
    assert float(kth) == 3.0
    assert int(n_above) == 3  # three 5.0s above


def test_mask_exact_k_with_ties():
    s = np.array([5.0, 3.0, 5.0, 5.0, 1.0, 3.0, 0.0, 2.0], np.float32)
    m = np.asarray(topk_mask(jnp.asarray(s), 4, interpret=True))
    assert m.sum() == 4
    # ties at 3.0 broken by lowest index: index 1 selected, index 5 not
    assert m.tolist() == [True, True, True, True, False, False, False, False]


def test_mask_matches_lax_topk_set():
    rng = np.random.default_rng(1)
    s = rng.normal(0, 1, 2048).astype(np.float32)  # distinct values w.h.p.
    m = np.asarray(topk_mask(jnp.asarray(s), 256, interpret=True))
    _, idx = jax.lax.top_k(jnp.asarray(s), 256)
    assert set(np.flatnonzero(m).tolist()) == set(np.asarray(idx).tolist())


def test_mask_2d_shape_preserved():
    rng = np.random.default_rng(2)
    s = rng.normal(0, 1, (32, 64)).astype(np.float32)
    m = np.asarray(topk_mask(jnp.asarray(s), 10, interpret=True))
    assert m.shape == (32, 64)
    assert m.sum() == 10


def test_topk_exact_and_approx():
    rng = np.random.default_rng(3)
    s = rng.normal(0, 1, 4096).astype(np.float32)
    v_exact, i_exact = topk(jnp.asarray(s), 128, method="exact")
    np.testing.assert_array_equal(np.asarray(v_exact), np.sort(s)[::-1][:128])
    v_approx, _ = topk(jnp.asarray(s), 128, method="approx")
    # approx recall: most of the true top-128 present
    recall = np.isin(np.asarray(v_approx), np.sort(s)[::-1][:128]).mean()
    assert recall > 0.9


def test_threshold_snap_verified_on_large_magnitude_range():
    """Adversarial case for the snap (ADVICE r1): a huge score range leaves
    representable values inside the final binary-search window, so an
    unverified snap returns a value BELOW the true k-th; the verify-and-
    restart outer loop must converge to the exact k-th value."""
    import jax.numpy as jnp
    from waymo_2d_tracking_tpu.ops.topk import pallas_topk_threshold, topk_mask

    s = jnp.asarray([1e9, -1e9, 0.0, 1e-4, 1e-4, -3e8, 2e8], jnp.float32)
    kth, n_above = pallas_topk_threshold(s, k=3, interpret=True)
    # true 3rd largest is 1e-4 (1e9, 2e8, 1e-4, 1e-4, 0, ...)
    assert float(kth) == np.float32(1e-4)
    assert int(n_above) == 2
    mask = np.asarray(topk_mask(s, 3, interpret=True))
    assert mask.sum() == 3
    assert mask[0] and mask[6] and mask[3]
