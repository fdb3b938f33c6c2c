"""Ring-sharded appearance-gallery scoring (SURVEY.md §5 long-context).

The tracker's per-track gallery fits one chip at segment scale, but a
long-horizon cross-segment re-ID memory (every appearance of every lost
track over a whole drive) can exceed one chip's HBM. The mechanism is the
ring-attention-shaped (but attention-free) pattern: shard the gallery over
the mesh 'data' axis; to score Q query embeddings against the full gallery,
rotate the query block around the ring with ``jax.lax.ppermute`` while each
device scores it against its resident shard, carrying a running max — after
``axis_size`` steps every query has seen every gallery entry with only
(Q, E)-sized transfers on ICI, never materializing the full (Q, N) matrix
on any one chip.

Collectives come from ``shard_map`` + XLA (no custom transport — C28).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

from waymo_2d_tracking_tpu.parallel.sharding import DATA_AXIS


def _ring_score_local(queries, gallery_shard, gallery_valid, axis_name):
    """Per-device body: rotate queries around the ring, track best match.

    queries (Q, E) identical on every device at call time? No — each device
    starts with ITS OWN query block (queries are sharded too); blocks travel
    the ring so the result for each block accumulates over all shards.

    Returns (best_sim (Q_local,), best_idx_global (Q_local,)) for the local
    query block, where best_idx_global indexes the concatenated gallery.
    """
    n_dev = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    shard_size = gallery_shard.shape[0]

    neg = jnp.float32(-2.0)

    def step(carry, k):
        block, best_sim, best_idx = carry
        # score the visiting block against MY shard. The block currently
        # here originated at device (me - k) mod n.
        sims = block @ gallery_shard.T
        sims = jnp.where(gallery_valid[None, :], sims, neg)
        local_best = jnp.max(sims, axis=1)
        local_arg = jnp.argmax(sims, axis=1) + me * shard_size
        take = local_best > best_sim
        best_sim = jnp.where(take, local_best, best_sim)
        best_idx = jnp.where(take, local_arg, best_idx)
        # pass the block (and its running best) to the next device
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        block = jax.lax.ppermute(block, axis_name, perm)
        best_sim = jax.lax.ppermute(best_sim, axis_name, perm)
        best_idx = jax.lax.ppermute(best_idx, axis_name, perm)
        return (block, best_sim, best_idx), None

    q = queries.shape[0]

    def _varying(x):
        # shard_map: constants are device-invariant; after ppermute the
        # carry becomes axis-varying — mark the init accordingly
        try:
            return jax.lax.pcast(x, (axis_name,), to="varying")
        except (AttributeError, TypeError):
            return jax.lax.pvary(x, (axis_name,))

    init = (
        queries,
        _varying(jnp.full((q,), neg, jnp.float32)),
        _varying(jnp.full((q,), -1, jnp.int32)),
    )
    (block, best_sim, best_idx), _ = jax.lax.scan(
        step, init, jnp.arange(n_dev)
    )
    # after n_dev hops each block is back home with its full-ring best
    return best_sim, best_idx


def ring_gallery_topmatch(
    queries: jnp.ndarray,    # (Q, E) L2-normalized, Q divisible by mesh size
    gallery: jnp.ndarray,    # (N, E) L2-normalized, N divisible by mesh size
    gallery_valid: jnp.ndarray,  # (N,) bool
    mesh: Mesh,
):
    """Best cosine match of each query against a ring-sharded gallery.

    Returns (best_sim (Q,), best_idx (Q,)) with best_idx indexing the
    global gallery (-1 when nothing valid was seen).
    """
    fn = shard_map(
        functools.partial(_ring_score_local, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )
    best_sim, best_idx = fn(
        queries.astype(jnp.float32), gallery.astype(jnp.float32), gallery_valid
    )
    best_idx = jnp.where(best_sim <= -2.0, -1, best_idx)
    return best_sim, best_idx
