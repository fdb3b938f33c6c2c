"""Top-k candidate selection (component C9).

The reference uses ATen's CUDA ``topk`` (SURVEY.md §2.1). On TPU there are
three viable strategies, all provided here:

- ``jax.lax.top_k``          — XLA's exact sort-network top-k (baseline).
- ``jax.lax.approx_max_k``   — TPU-hardware-aware bucketed approximate top-k;
                               the right call for detector candidate pruning
                               where exact order below the cut doesn't matter.
- ``pallas_topk_threshold``  — the Pallas deliverable: exact k-th-value
                               threshold via binary search over VMEM
                               (O(iters·N) streaming reads, no sort), plus a
                               tie-aware selection mask. Useful when only the
                               *set* of top-k is needed (masking candidates
                               before NMS) — selection without ordering.
                               Exactness for arbitrary value ranges comes from
                               a snap-and-verify outer loop (see kernel).

``topk`` picks the strategy; the detector's per-level candidate selection
uses ``DetectorConfig.topk_method`` ('exact' by default — measured on TPU
v5e, ``approx_max_k`` gave no speedup at the detector's N=28800 per-level
sizes, see docs/DESIGN.md).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _threshold_kernel(scores_ref, thr_ref, cnt_ref, *, k: int, iters: int):
    """Binary-search the k-th largest value. scores (1, N) f32 in VMEM.

    Outputs: thr (1, 1) f32 — value v such that count(scores > v) < k
    <= count(scores >= v); cnt (1, 1) i32 — count(scores > thr).

    Exactness: the invariant count(s >= lo) >= k holds throughout, so the
    snap kth = min{s >= lo} always satisfies count(s >= kth) >= k; but when
    ``iters`` halvings leave representable data values inside (lo, true-kth)
    — possible for large-magnitude score ranges — the snap can land BELOW the
    true k-th value. The outer loop verifies count(s > kth) < k and on
    failure restarts the search from lo = kth (a real data value, so each
    failed round strictly advances through the finite set of distinct scores;
    ~1 round in practice, hard-capped).
    """
    s = scores_ref[:]
    lo0 = jnp.min(s) - 1.0
    hi0 = jnp.max(s)

    def halve(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        c = jnp.sum((s >= mid).astype(jnp.float32))
        # c >= k: threshold can move up to mid; else down.
        take = c >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    def outer_cond(carry):
        _lo, _hi, _kth, verified, rounds = carry
        return jnp.logical_and(jnp.logical_not(verified), rounds < 16)

    def outer_body(carry):
        lo, hi, _kth, _v, rounds = carry
        lo, hi = jax.lax.fori_loop(0, iters, halve, (lo, hi))
        kth = jnp.min(jnp.where(s >= lo, s, jnp.full_like(s, jnp.inf)))
        verified = jnp.sum((s > kth).astype(jnp.float32)) < k
        return kth, hi, kth, verified, rounds + 1

    _, _, kth, _, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (lo0, hi0, lo0, jnp.bool_(False), jnp.int32(0)),
    )
    thr_ref[0, 0] = kth
    cnt_ref[0, 0] = jnp.sum((s > kth).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_topk_threshold(
    scores: jnp.ndarray, k: int, interpret: bool | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-th-largest value of ``scores`` (any shape, flattened) + the
    count of entries strictly above it. Returns (kth_value (), n_above ())."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flat = scores.reshape(1, -1).astype(jnp.float32)
    n = flat.shape[1]
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    thr, cnt = pl.pallas_call(
        functools.partial(_threshold_kernel, k=k, iters=40),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(flat)
    return thr[0, 0], cnt[0, 0]


def topk_mask(scores: jnp.ndarray, k: int, interpret: bool | None = None) -> jnp.ndarray:
    """Boolean mask selecting exactly the top-k entries (ties broken by
    lowest flat index), via the Pallas threshold kernel + XLA tie ranking."""
    kth, n_above = pallas_topk_threshold(scores, k, interpret=interpret)
    flat = scores.reshape(-1)
    above = flat > kth
    ties = flat == kth
    tie_rank = jnp.cumsum(ties.astype(jnp.int32)) - 1
    need = k - n_above
    sel = jnp.logical_or(above, jnp.logical_and(ties, tie_rank < need))
    return sel.reshape(scores.shape)


def topk(
    scores: jnp.ndarray, k: int, method: str = "exact"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k values + flat indices, descending.

    method: 'exact' (lax.top_k sort network) or 'approx'
    (lax.approx_max_k — TPU bucketed; recall ~0.95+, the detector's choice
    for candidate pruning where the tail order is irrelevant).
    """
    flat = scores.reshape(-1)
    if method == "approx":
        vals, idx = jax.lax.approx_max_k(flat, k)
    else:
        vals, idx = jax.lax.top_k(flat, k)
    return vals, idx
