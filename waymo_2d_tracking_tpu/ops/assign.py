"""On-device linear assignment via eps-scaled auction (component C14).

The reference calls ``scipy.optimize.linear_sum_assignment`` (compiled C,
host-side, per frame — BASELINE.json north-star names scipy explicitly).
A shortest-augmenting-path (JV) solver is branchy and sequential — exactly
what XLA hates — so here we use Bertsekas' auction algorithm instead: each
round, every unassigned row simultaneously bids on its best column
(vectorized argmax + one-hot scatter-max, pure VPU work), prices rise, and
``lax.while_loop`` iterates until all rows hold a column. eps-scaling phases
(prices persist, assignments reset) give near-optimal total cost within
``N * eps_min`` of the true optimum — the unit tests verify this bound
against scipy on random matrices including degenerate ties.

Rectangular / masked / gated problems are padded to a static square N x N.
The padding benefit is ``-(N * c_max + 1)`` — large enough that a maximum-
cardinality matching always dominates (matching scipy's semantics of
assigning every row of the short side), yet small enough that the auction's
price war over real columns terminates in O(range/eps) total price rise,
which eps-scaling then makes cheap. (A fixed huge constant here makes
unbalanced problems iterate ~1e10 times; found the hard way.)

Fixed shapes throughout, so the op nests inside ``jit`` / ``lax.scan`` /
``shard_map``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # only for masking bids within one iteration


def _auction_phase(
    benefit: jnp.ndarray,
    prices: jnp.ndarray,
    row_live: jnp.ndarray,
    eps: jnp.ndarray,
    max_iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One eps phase of the Jacobi (all-bid-at-once) auction.

    benefit: (N, N) maximization payoff. prices: (N,) carried across phases.
    row_live: (N,) rows that participate (all rows here; kept for generality).
    Returns (row_to_col (N,) int32, updated prices).
    """
    n = benefit.shape[0]
    cols = jnp.arange(n, dtype=jnp.int32)

    def cond(carry):
        row_to_col, _owner, _p, it = carry
        unassigned = jnp.logical_and(row_to_col < 0, row_live)
        return jnp.logical_and(it < max_iters, jnp.any(unassigned))

    def body(carry):
        row_to_col, owner, p, it = carry
        unassigned = jnp.logical_and(row_to_col < 0, row_live)        # (N,)

        v = benefit - p[None, :]                                      # (N, N)
        j_best = jnp.argmax(v, axis=1).astype(jnp.int32)              # (N,)
        v1 = jnp.max(v, axis=1)
        v_no_best = jnp.where(cols[None, :] == j_best[:, None], _NEG_INF, v)
        v2 = jnp.max(v_no_best, axis=1)
        bid_price = p[j_best] + (v1 - v2) + eps                       # (N,)

        # Each unassigned row bids on exactly its best column: build the
        # (rows x cols) bid grid, take per-column max bid + winner.
        bids = jnp.where(
            jnp.logical_and(cols[None, :] == j_best[:, None], unassigned[:, None]),
            bid_price[:, None],
            _NEG_INF,
        )
        col_best_bid = jnp.max(bids, axis=0)                          # (N,)
        col_winner = jnp.argmax(bids, axis=0).astype(jnp.int32)       # (N,)
        has_bid = col_best_bid > _NEG_INF * 0.5

        p = jnp.where(has_bid, col_best_bid, p)
        new_owner = jnp.where(has_bid, col_winner, owner)             # col -> row

        # Rebuild row_to_col from ownership (a row wins at most one column
        # per iteration since it bids on a single j_best).
        safe_rows = jnp.where(new_owner >= 0, new_owner, 0)
        vals = jnp.where(new_owner >= 0, cols, -1)
        new_row_to_col = jnp.full((n,), -1, dtype=jnp.int32).at[safe_rows].max(vals)
        return new_row_to_col, new_owner, p, it + 1

    init = (
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.full((n,), -1, dtype=jnp.int32),
        prices,
        jnp.int32(0),
    )
    row_to_col, _owner, prices, _it = jax.lax.while_loop(cond, body, init)
    return row_to_col, prices


def _round_up_128(x: int) -> int:
    """Static benefit-matrix side for the Pallas kernel.

    Round 3: problems up to 64x64 run at n=64 — Mosaic handles the
    (64, 64) f32 block fine, and the auction measured 0.645 vs 1.088
    ms/frame in-scan at tracker shapes (S=D=64, masks+gates), 1.69x —
    near-parity with greedy (0.620) while keeping scipy-equal optimality
    (tools/perf_auction64.py; scipy-exact on the chip at n=64). Larger
    problems keep the conservative 128-multiple padding."""
    if x <= 64:
        return 64
    return ((max(x, 128) + 127) // 128) * 128


def _auction_kernel(eps0_ref, benefit_ref, out_ref, *, eps_scale: float,
                    eps_min: float, max_iters: int, n: int, r: int):
    """Whole eps-scaled auction in one Pallas program.

    State lives as f32 row/column vectors ((1,n) col-indexed, (n,1)
    row-indexed); indices are f32 (exact below 2^24); argmax/argmin are
    min-index-of-max reductions (Mosaic-friendly, no i1 reshapes).

    ``r`` restricts bidding to the first r rows. NOTE: r < n is UNSOUND with
    the phase-reset eps-scaling used here — padding rows are load-bearing for
    correctness: each phase reset empties the assignment while keeping
    prices, and a column whose stale price exceeds every live row's
    willingness would be orphaned forever; the padding rows (indifferent
    across all columns) always bid on the cheapest column and therefore
    reclaim orphans. Verified empirically: restricting bidding to real rows
    sent every row to padding columns on rectangular problems. All callers
    pass r = n; the parameter stays for a future asymmetric-auction variant
    (Bertsekas' forward-reverse) that would make r < n sound.
    """
    b = benefit_ref[:]                                             # (n, n)
    eps0 = eps0_ref[0, 0]
    # Mosaic's tpu.iota is integer-only; cast after
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).astype(jnp.float32)
    big = jnp.float32(1e30)
    nf = jnp.float32(n)
    # (n, 1) mask of live (real) rows; padding rows are born "assigned"
    row_live = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
        < jnp.float32(r)
    )

    def phase(p, eps):
        def cond(carry):
            rtc, _owner, _p, it = carry
            return jnp.logical_and(it < max_iters, jnp.min(rtc) < 0.0)

        def body(carry):
            rtc, owner, p, it = carry        # rtc (n,1), owner (1,n), p (1,n)
            v = b - p                                              # (n, n)
            v1 = jnp.max(v, axis=1, keepdims=True)                 # (n, 1)
            jbest = jnp.min(
                jnp.where(v >= v1, col_iota, nf), axis=1, keepdims=True
            )                                                      # (n, 1)
            onehot = col_iota == jbest                             # (n, n)
            v2 = jnp.max(jnp.where(onehot, -big, v), axis=1, keepdims=True)
            b_best = jnp.sum(jnp.where(onehot, b, 0.0), axis=1, keepdims=True)
            bid = b_best - v2 + eps                                # (n, 1)

            unassigned = rtc < 0.0                                 # (n, 1)
            bids = jnp.where(
                jnp.logical_and(onehot, unassigned), bid, -big
            )                                                      # (n, n)
            col_best = jnp.max(bids, axis=0, keepdims=True)        # (1, n)
            winner = jnp.min(
                jnp.where(bids >= col_best, row_iota, nf), axis=0, keepdims=True
            )                                                      # (1, n)
            has_bid = col_best > -big * 0.5
            p = jnp.where(has_bid, col_best, p)
            owner = jnp.where(has_bid, winner, owner)

            # rebuild rtc from ownership; padding rows pinned to "assigned"
            m = owner == row_iota                                  # (n, n)
            rtc = jnp.min(jnp.where(m, col_iota, nf), axis=1, keepdims=True)
            rtc = jnp.where(rtc >= nf, -1.0, rtc)
            rtc = jnp.where(row_live, rtc, 0.0)
            return rtc, owner, p, it + 1

        init = (
            jnp.where(row_live, -1.0, 0.0).astype(jnp.float32),
            jnp.full((1, n), -1.0, jnp.float32),
            p,
            jnp.int32(0),
        )
        rtc, _owner, p, _it = jax.lax.while_loop(cond, body, init)
        return rtc, p

    def outer_cond(carry):
        _rtc, _p, eps = carry
        return eps > 0.0

    def outer_body(carry):
        _rtc, p, eps = carry
        e = jnp.maximum(eps, eps_min)
        rtc, p = phase(p, e)
        next_eps = jnp.where(e <= eps_min * 1.000001, 0.0, eps * eps_scale)
        return rtc, p, next_eps

    init = (
        jnp.full((n, 1), -1.0, jnp.float32),
        jnp.zeros((1, n), jnp.float32),
        eps0,
    )
    rtc, _p, _eps = jax.lax.while_loop(outer_cond, outer_body, init)
    out_ref[:] = rtc


def _pallas_auction(
    benefit: jnp.ndarray, eps0, *, eps_scale: float, eps_min: float,
    max_iters: int, r: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Run the auction kernel on an (n, n) benefit. Returns (n,) int32.

    r: number of real (bidding) rows; rows r..n are padding (see kernel)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = benefit.shape[0]
    if r is None:
        r = n
    eps0_arr = jnp.reshape(eps0.astype(jnp.float32), (1, 1))
    out = pl.pallas_call(
        functools.partial(
            _auction_kernel, eps_scale=eps_scale, eps_min=eps_min,
            max_iters=max_iters, n=n, r=r,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(eps0_arr, benefit)
    return out[:, 0].astype(jnp.int32)


def _build_benefit(cost, valid, n_out: int, eps_min: float):
    """Square padded maximization benefit + dynamic eps0 for the auction.

    Returns (benefit (n_out, n_out) f32, eps0 scalar f32).
    """
    r, c = cost.shape
    costf = cost.astype(jnp.float32)
    c_max = jnp.maximum(jnp.max(jnp.where(valid, costf, 0.0)), 0.0)
    c_min = jnp.minimum(jnp.min(jnp.where(valid, costf, 0.0)), 0.0)
    # Padding benefit: worse than any chain of valid assignments so that
    # maximum cardinality always wins, but only by the necessary margin.
    pad = -(jnp.float32(n_out) * (c_max - c_min) + 1.0) + c_min

    benefit = jnp.full((n_out, n_out), 0.0, dtype=jnp.float32)
    benefit = benefit.at[:r, :c].set(jnp.where(valid, -costf, 0.0))
    mask_nn = jnp.zeros((n_out, n_out), dtype=bool).at[:r, :c].set(valid)
    benefit = jnp.where(mask_nn, benefit, pad)

    # Tie-break perturbation: with many exactly-equal entries (padding rows,
    # all-forbidden frames) every row argmaxes the SAME column and the Jacobi
    # auction serializes to one assignment per iteration (O(N) sequential
    # steps — measured 14ms/frame in the tracker). A row-rotated nudge makes
    # row i prefer column (i + k) among ties, so uniform blocks resolve in
    # one round. Magnitude (n-1)*tiny < eps_min/4 keeps the optimality bound.
    idx = jnp.arange(n_out, dtype=jnp.float32)
    rot = jnp.mod(idx[None, :] - idx[:, None], float(n_out))
    tiny = jnp.float32(eps_min) / (4.0 * n_out)
    benefit = benefit - rot * tiny

    # eps0 spans the full benefit range INCLUDING the pad gap. Tried the
    # real-range-only eps0 (fewer phases) in round 2: standalone it looked
    # ~equal, but inside the tracker scan it measured 2.7x SLOWER per frame
    # (1.13 vs 0.43 ms) — the coarse early phases pre-condition prices across
    # the pad gap cheaply (huge eps => one bid per row), and without them the
    # fine phases pay the equalization in many small increments.
    brange = (c_max - pad) - c_min
    eps0 = jnp.maximum(brange * 0.5, jnp.float32(eps_min))
    return benefit, eps0


def greedy_assign(
    cost: jnp.ndarray,
    row_mask: Optional[jnp.ndarray] = None,
    col_mask: Optional[jnp.ndarray] = None,
    forbid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy (lowest-cost-first) matching, fully on device.

    NOT optimal assignment: repeatedly takes the globally cheapest valid
    (row, col) pair and removes both — the classic fast tracker association
    (the matching CenterTrack-style trackers use). Bounded sequential depth
    min(R, C) via ``lax.while_loop`` with an early exit when no valid pair
    remains; each iteration is one flat argmin + two mask updates (pure VPU),
    so at tracker sizes it is several times cheaper than the eps-scaled
    auction. Use via ``TrackerConfig.assignment='greedy'`` (speed presets);
    ``'auction'`` (scipy-equal, SORT parity) stays the default.

    Same contract as :func:`auction_assign`.
    """
    r, c = cost.shape
    if row_mask is None:
        row_mask = jnp.ones((r,), dtype=bool)
    if col_mask is None:
        col_mask = jnp.ones((c,), dtype=bool)
    valid = jnp.logical_and(row_mask[:, None], col_mask[None, :])
    if forbid is not None:
        valid = jnp.logical_and(valid, jnp.logical_not(forbid))

    big = jnp.float32(1e30)
    work = jnp.where(valid, cost.astype(jnp.float32), big)
    k_max = min(r, c)

    def cond(carry):
        work, _rtc, _ctr, it = carry
        return jnp.logical_and(it < k_max, jnp.min(work) < big * 0.5)

    def body(carry):
        work, rtc, ctr, it = carry
        flat = jnp.argmin(work.reshape(-1)).astype(jnp.int32)
        i, j = flat // c, flat % c
        rtc = rtc.at[i].set(j)
        ctr = ctr.at[j].set(i)
        rows = jnp.arange(r, dtype=jnp.int32)
        cols = jnp.arange(c, dtype=jnp.int32)
        work = jnp.where(
            jnp.logical_or((rows == i)[:, None], (cols == j)[None, :]),
            big, work,
        )
        return work, rtc, ctr, it + 1

    init = (
        work,
        jnp.full((r,), -1, jnp.int32),
        jnp.full((c,), -1, jnp.int32),
        jnp.int32(0),
    )
    _work, rtc, ctr, _it = jax.lax.while_loop(cond, body, init)
    return rtc, ctr


def auction_assign(
    cost: jnp.ndarray,
    row_mask: Optional[jnp.ndarray] = None,
    col_mask: Optional[jnp.ndarray] = None,
    forbid: Optional[jnp.ndarray] = None,
    *,
    eps_scale: float = 0.2,
    eps_min: float = 1e-3,
    max_iters: int = 4096,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-cost assignment of rows to columns, fully on device.

    Args:
      cost: (R, C) float32 cost matrix (lower = better). Finite entries.
      row_mask: (R,) bool, False rows are padding and never matched.
      col_mask: (C,) bool, False cols are padding and never matched.
      forbid: (R, C) bool, True pairs are never matched (gating).
      eps_scale: eps-scaling factor per phase (eps <- eps * eps_scale).
      eps_min: final phase eps; total cost is within N*eps_min of optimal.
      max_iters: bidding-iteration cap per eps phase (safety valve; if hit,
        remaining rows return unmatched).

    Returns:
      (row_to_col (R,) int32 with -1 for unmatched,
       col_to_row (C,) int32 with -1 for unmatched).
      Pairs are only reported matched if both sides are valid and the pair is
      not forbidden — matches routed through padding are filtered out.
    """
    r, c = cost.shape
    if row_mask is None:
        row_mask = jnp.ones((r,), dtype=bool)
    if col_mask is None:
        col_mask = jnp.ones((c,), dtype=bool)

    valid = jnp.logical_and(row_mask[:, None], col_mask[None, :])
    if forbid is not None:
        valid = jnp.logical_and(valid, jnp.logical_not(forbid))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        # single-kernel auction: loop iterations at VMEM latency instead of
        # XLA while_loop dispatch overhead (~5-10x at tracker sizes)
        n = _round_up_128(max(r, c))
        benefit, eps0 = _build_benefit(cost, valid, n, eps_min)

        def _solve(args):
            b, e = args
            return _pallas_auction(
                b, e, eps_scale=eps_scale, eps_min=eps_min,
                max_iters=max_iters,
            )

        def _empty(args):
            # no feasible pair anywhere (empty/occluded frame): skip the
            # kernel — everything is unmatched by construction
            return jnp.full((n,), -1, dtype=jnp.int32)

        row_to_col = jax.lax.cond(
            jnp.any(valid), _solve, _empty, (benefit, eps0)
        )
    else:
        n = max(r, c)
        benefit, eps0 = _build_benefit(cost, valid, n, eps_min)
        row_live = jnp.ones((n,), dtype=bool)

        def outer_cond(carry):
            _rtc, _p, eps = carry
            return eps > eps_min

        def outer_body(carry):
            _rtc, p, eps = carry
            rtc, p = _auction_phase(benefit, p, row_live, eps, max_iters)
            return rtc, p, jnp.maximum(eps * eps_scale, jnp.float32(eps_min) * 0.5)

        rtc0 = jnp.full((n,), -1, dtype=jnp.int32)
        p0 = jnp.zeros((n,), dtype=jnp.float32)
        row_to_col, prices, _eps = jax.lax.while_loop(
            outer_cond, outer_body, (rtc0, p0, eps0)
        )
        # Polish once at exactly eps_min (the loop exits when eps <= eps_min).
        row_to_col, _ = _auction_phase(
            benefit, prices, row_live, jnp.float32(eps_min), max_iters
        )

    # Filter assignments that ran through padding/forbidden entries.
    rows = jnp.arange(n, dtype=jnp.int32)[:r]
    rtc = row_to_col[:r]
    safe_cols = jnp.clip(rtc, 0, c - 1)
    pair_ok = jnp.logical_and(
        jnp.logical_and(rtc >= 0, rtc < c),
        valid[rows, safe_cols],
    )
    rtc = jnp.where(pair_ok, rtc, -1)

    # Invert to col_to_row.
    safe = jnp.where(rtc >= 0, rtc, 0)
    vals = jnp.where(rtc >= 0, rows, -1)
    col_to_row = jnp.full((c,), -1, dtype=jnp.int32).at[safe].max(vals)
    return rtc, col_to_row
