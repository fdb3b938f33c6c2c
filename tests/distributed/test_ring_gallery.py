"""Ring-sharded gallery scoring (parallel/ring.py) vs dense oracle on the
8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.parallel.ring import ring_gallery_topmatch
from waymo_2d_tracking_tpu.parallel.sharding import make_mesh


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_matches_dense_oracle():
    rng = np.random.default_rng(0)
    q = _norm(rng.normal(0, 1, (16, 32))).astype(np.float32)   # 2 per device
    g = _norm(rng.normal(0, 1, (64, 32))).astype(np.float32)   # 8 per device
    valid = rng.uniform(size=64) > 0.2

    mesh = make_mesh()
    best_sim, best_idx = ring_gallery_topmatch(
        jnp.asarray(q), jnp.asarray(g), jnp.asarray(valid), mesh
    )
    best_sim = np.asarray(best_sim)
    best_idx = np.asarray(best_idx)

    dense = q @ g.T
    dense[:, ~valid] = -np.inf
    np.testing.assert_allclose(best_sim, dense.max(axis=1), atol=1e-5)
    # argmax may differ under exact ties; compare achieved similarity instead
    np.testing.assert_allclose(
        dense[np.arange(16), best_idx], dense.max(axis=1), atol=1e-5
    )


def test_all_invalid_returns_minus_one():
    rng = np.random.default_rng(1)
    q = _norm(rng.normal(0, 1, (8, 16))).astype(np.float32)
    g = _norm(rng.normal(0, 1, (32, 16))).astype(np.float32)
    mesh = make_mesh()
    _sim, idx = ring_gallery_topmatch(
        jnp.asarray(q), jnp.asarray(g), jnp.zeros(32, bool), mesh
    )
    assert (np.asarray(idx) == -1).all()


def test_query_self_match():
    """Queries drawn from the gallery must find themselves (sim ~ 1)."""
    rng = np.random.default_rng(2)
    g = _norm(rng.normal(0, 1, (64, 32))).astype(np.float32)
    picks = np.arange(0, 64, 4)
    q = g[picks]
    mesh = make_mesh()
    sim, idx = ring_gallery_topmatch(
        jnp.asarray(q), jnp.asarray(g), jnp.ones(64, bool), mesh
    )
    np.testing.assert_allclose(np.asarray(sim), 1.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), picks)
