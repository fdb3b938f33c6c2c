"""Unit tests for ops/assign.py (C14) — auction vs scipy optimality.

SURVEY.md §7 hard-parts: "prove cost-optimality equal to scipy on random
matrices incl. degenerate ties". The auction guarantee is total cost within
N * eps_min of optimal; tests assert that bound (and exactness on
well-separated integer costs).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from waymo_2d_tracking_tpu.ops.assign import auction_assign

EPS_MIN = 1e-3


def total_cost(cost, row_to_col):
    return sum(cost[i, j] for i, j in enumerate(row_to_col) if j >= 0)


def check_vs_scipy(cost, row_mask=None, col_mask=None, tol_scale=1.0):
    rtc, ctr = jax.jit(
        lambda c: auction_assign(c, row_mask=None if row_mask is None else jnp.asarray(row_mask),
                                 col_mask=None if col_mask is None else jnp.asarray(col_mask),
                                 eps_min=EPS_MIN, max_iters=4096)
    )(jnp.asarray(cost))
    rtc = np.asarray(rtc)
    ctr = np.asarray(ctr)

    # structural checks: it is a matching, inverse-consistent
    used = [j for j in rtc if j >= 0]
    assert len(used) == len(set(used)), "column used twice"
    for i, j in enumerate(rtc):
        if j >= 0:
            assert ctr[j] == i
    # masked rows/cols never matched
    if row_mask is not None:
        assert all(rtc[i] == -1 for i in range(len(rtc)) if not row_mask[i])
    if col_mask is not None:
        assert all(ctr[j] == -1 for j in range(len(ctr)) if not col_mask[j])

    # optimality vs scipy on the valid submatrix
    r_idx = np.arange(cost.shape[0]) if row_mask is None else np.flatnonzero(row_mask)
    c_idx = np.arange(cost.shape[1]) if col_mask is None else np.flatnonzero(col_mask)
    sub = cost[np.ix_(r_idx, c_idx)]
    ri, ci = linear_sum_assignment(sub)
    opt = sub[ri, ci].sum()
    got = total_cost(cost, rtc)
    n = max(cost.shape)
    # same cardinality (max matching) and near-optimal cost
    assert sum(1 for j in rtc if j >= 0) == len(ri)
    assert got <= opt + n * EPS_MIN * tol_scale + 1e-5, (got, opt)
    return rtc


def test_square_random():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 16, 64):
        cost = rng.uniform(0, 2, size=(n, n)).astype(np.float32)
        check_vs_scipy(cost)


def test_rectangular_both_ways():
    rng = np.random.default_rng(1)
    check_vs_scipy(rng.uniform(0, 2, size=(10, 4)).astype(np.float32))
    check_vs_scipy(rng.uniform(0, 2, size=(4, 10)).astype(np.float32))


def test_degenerate_ties():
    # all-equal costs: any perfect matching is optimal
    check_vs_scipy(np.ones((8, 8), dtype=np.float32))
    # block ties
    cost = np.kron(np.arange(4).reshape(2, 2), np.ones((4, 4))).astype(np.float32)
    check_vs_scipy(cost)


def test_integer_costs_exact():
    # integer costs with eps_min < 1/N: auction is exactly optimal
    rng = np.random.default_rng(2)
    cost = rng.integers(0, 10, size=(12, 12)).astype(np.float32)
    rtc = check_vs_scipy(cost)
    ri, ci = linear_sum_assignment(cost)
    assert total_cost(cost, np.asarray(rtc)) == cost[ri, ci].sum()


def test_masks():
    rng = np.random.default_rng(3)
    cost = rng.uniform(0, 2, size=(8, 8)).astype(np.float32)
    row_mask = np.array([1, 1, 0, 1, 0, 1, 1, 0], dtype=bool)
    col_mask = np.array([1, 0, 1, 1, 1, 0, 1, 1], dtype=bool)
    check_vs_scipy(cost, row_mask, col_mask)


def test_forbid_gating():
    cost = np.array([[0.1, 0.9], [0.2, 0.8]], dtype=np.float32)
    forbid = jnp.asarray(np.array([[True, False], [False, False]]))
    rtc, _ = auction_assign(jnp.asarray(cost), forbid=forbid, eps_min=EPS_MIN)
    rtc = np.asarray(rtc)
    # row 0 can't take col 0; optimal is 0->1, 1->0
    assert rtc[0] == 1 and rtc[1] == 0


def test_all_forbidden_returns_unmatched():
    cost = np.ones((4, 4), dtype=np.float32)
    forbid = jnp.ones((4, 4), dtype=bool)
    rtc, ctr = auction_assign(jnp.asarray(cost), forbid=forbid, eps_min=EPS_MIN)
    assert np.all(np.asarray(rtc) == -1)
    assert np.all(np.asarray(ctr) == -1)


def test_inside_vmap_and_scan():
    # the op must nest inside scan (per-frame use) — smoke test shapes
    rng = np.random.default_rng(4)
    costs = jnp.asarray(rng.uniform(0, 2, size=(3, 6, 6)).astype(np.float32))

    def step(carry, c):
        rtc, _ = auction_assign(c, eps_min=EPS_MIN)
        return carry, rtc

    _, out = jax.lax.scan(step, 0, costs)
    assert out.shape == (3, 6)
    for k in range(3):
        used = [j for j in np.asarray(out[k]) if j >= 0]
        assert len(used) == len(set(used))


@pytest.mark.slow
def test_pallas_kernel_matches_xla_path():
    """The in-kernel Pallas auction (interpret mode on CPU) must produce an
    equally-optimal assignment to the XLA while_loop path."""
    rng = np.random.default_rng(7)
    for r, c in [(16, 16), (20, 8), (8, 20)]:
        cost = rng.uniform(0, 2, size=(r, c)).astype(np.float32)
        rtc_x, _ = auction_assign(jnp.asarray(cost), eps_min=EPS_MIN,
                                  max_iters=4096, use_pallas=False)
        rtc_p, _ = auction_assign(jnp.asarray(cost), eps_min=EPS_MIN,
                                  max_iters=4096, use_pallas=True)
        ri, ci = linear_sum_assignment(cost)
        opt = cost[ri, ci].sum()
        for name, rtc in [("xla", np.asarray(rtc_x)), ("pallas", np.asarray(rtc_p))]:
            used = [j for j in rtc if j >= 0]
            assert len(used) == len(set(used)) == len(ri), (name, rtc)
            got = total_cost(cost, rtc)
            n = 128  # pallas pads to 128
            assert got <= opt + n * EPS_MIN + 1e-4, (name, got, opt)


@pytest.mark.slow
def test_pallas_kernel_n64_tracker_shapes():
    """Round 3: problems up to 64x64 run the kernel at n=64 (1.69x faster,
    tools/perf_auction64.py). Optimality and masking semantics must hold at
    the smaller padding, including rectangular and gated cases."""
    from waymo_2d_tracking_tpu.ops.assign import _round_up_128

    assert _round_up_128(64) == 64 and _round_up_128(8) == 64
    assert _round_up_128(65) == 128 and _round_up_128(200) == 256
    rng = np.random.default_rng(11)
    for r, c in [(64, 64), (64, 40), (40, 64), (64, 1)]:
        cost = rng.uniform(0, 2, size=(r, c)).astype(np.float32)
        row_mask = rng.uniform(size=r) < 0.8
        forbid = rng.uniform(size=(r, c)) < 0.1
        rtc_p, ctr_p = auction_assign(
            jnp.asarray(cost), row_mask=jnp.asarray(row_mask),
            forbid=jnp.asarray(forbid), eps_min=EPS_MIN,
            max_iters=4096, use_pallas=True,
        )
        rtc = np.asarray(rtc_p)
        used = [j for j in rtc if j >= 0]
        assert len(used) == len(set(used))
        assert all(rtc[i] == -1 for i in range(r) if not row_mask[i])
        assert all(not forbid[i, j] for i, j in enumerate(rtc) if j >= 0)
        # optimality vs scipy on the feasible submatrix
        big = 1e6
        sub = np.where(forbid, big, cost)[row_mask]
        ri, ci = linear_sum_assignment(sub)
        keep = sub[ri, ci] < big / 2
        opt = sub[ri, ci][keep].sum()
        got = total_cost(cost, rtc)
        assert sum(1 for j in rtc if j >= 0) == int(keep.sum())
        assert got <= opt + 64 * EPS_MIN + 1e-4, (r, c, got, opt)


# ----------------------------------------------------------- greedy matching

def _greedy_oracle(cost, valid):
    """Pure-numpy greedy lowest-cost-first matching."""
    work = np.where(valid, cost.astype(np.float64), np.inf)
    r, c = cost.shape
    rtc = np.full(r, -1, np.int64)
    ctr = np.full(c, -1, np.int64)
    for _ in range(min(r, c)):
        if not np.isfinite(work).any():
            break
        i, j = np.unravel_index(np.argmin(work), work.shape)
        rtc[i], ctr[j] = j, i
        work[i, :] = np.inf
        work[:, j] = np.inf
    return rtc, ctr


def test_greedy_matches_numpy_oracle():
    from waymo_2d_tracking_tpu.ops.assign import greedy_assign

    rng = np.random.default_rng(7)
    for r, c, p_forbid in ((8, 8, 0.0), (12, 5, 0.5), (5, 12, 0.5),
                           (32, 32, 0.8), (16, 16, 1.0)):
        cost = rng.uniform(0, 3, (r, c)).astype(np.float32)
        row_mask = rng.uniform(size=r) < 0.8
        col_mask = rng.uniform(size=c) < 0.8
        forbid = rng.uniform(size=(r, c)) < p_forbid
        valid = row_mask[:, None] & col_mask[None, :] & ~forbid
        want_rtc, want_ctr = _greedy_oracle(cost, valid)
        got_rtc, got_ctr = greedy_assign(
            jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask),
            jnp.asarray(forbid),
        )
        np.testing.assert_array_equal(np.asarray(got_rtc), want_rtc)
        np.testing.assert_array_equal(np.asarray(got_ctr), want_ctr)


@pytest.mark.slow
def test_greedy_tracker_quality_close_to_auction():
    """Tracker with assignment='greedy' must stay within a small MOTA/IDF1
    delta of the auction on the synthetic golden clip (the speed presets
    trade optimal assignment for per-frame cost; the trade must be small)."""
    import dataclasses

    from waymo_2d_tracking_tpu.config import TrackerConfig
    from waymo_2d_tracking_tpu.data.synthetic import (
        SyntheticClipConfig, generate_clip,
    )
    from waymo_2d_tracking_tpu.eval.mot import (
        evaluate_mot, gt_to_frames, track_outputs_to_frames,
    )
    from waymo_2d_tracking_tpu.tracker import Tracker

    clip = SyntheticClipConfig(num_frames=120, seed=3)
    dets, gt = generate_clip(clip)
    base = TrackerConfig(max_tracks=64, max_detections=64, embed_dim=128,
                         appearance_weight=0.3)
    res = {}
    for method in ("auction", "greedy"):
        tr = Tracker(dataclasses.replace(base, assignment=method))
        _state, outs = tr.run(dets)
        res[method] = evaluate_mot(
            gt_to_frames(gt), track_outputs_to_frames(outs, clip.num_frames)
        )
    a, g = res["auction"], res["greedy"]
    assert g.mota >= a.mota - 0.02, (g.as_dict(), a.as_dict())
    assert g.idf1 >= a.idf1 - 0.03, (g.as_dict(), a.as_dict())
