"""Round-3 auction timing (VERDICT r2 item 2): per-frame assignment cost at
64 slots with ReID, in-scan (memory rules: lax.scan inside ONE jit, A/B in
one process, min over repeats).

A: auction, benefit padded to n=128 (round-2 committed behavior)
B: auction, benefit padded to n=64  (Mosaic min-tile experiment)
C: greedy (reference point, 0.31 ms/frame round 2)

Tracker-like shapes: S=64 track slots vs D=64 detection slots, ~70% valid,
IoU+cosine-style cost in [0, 1], 10% forbidden pairs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.ops import assign

T = 64          # frames per scan
S = D = 64


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0.0, 1.0, (T, S, D)).astype(np.float32)
    row_mask = rng.uniform(size=(T, S)) < 0.7
    col_mask = rng.uniform(size=(T, D)) < 0.7
    forbid = rng.uniform(size=(T, S, D)) < 0.1
    return (jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask),
            jnp.asarray(forbid))


def scan_fn(kind):
    def step(carry, x):
        cost, rm, cm, fb = x
        if kind == "greedy":
            rtc, ctr = assign.greedy_assign(cost, row_mask=rm, col_mask=cm,
                                            forbid=fb)
        else:
            rtc, ctr = assign.auction_assign(
                cost, row_mask=rm, col_mask=cm, forbid=fb,
                eps_min=1e-2, use_pallas=True,
            )
        return carry + jnp.sum(jnp.maximum(rtc, 0)), (rtc, ctr)

    def run(inputs):
        total, _outs = jax.lax.scan(step, jnp.int32(0), inputs)
        return total

    return jax.jit(run)


def time_one(fn, inputs, repeats=8):
    out = fn(inputs)
    _ = np.asarray(out)       # sync (block_until_ready lies over the tunnel)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(inputs)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / T * 1e3     # ms per frame


if __name__ == "__main__":
    inputs = make_inputs(0)
    round_up_64 = lambda x: ((max(x, 64) + 63) // 64) * 64   # noqa: E731
    round_up_128 = assign._round_up_128

    results = {}
    fns = {}
    assign._round_up_128 = round_up_128
    fns["auction_n128"] = scan_fn("auction")
    _ = fns["auction_n128"](inputs)          # compile under n128
    assign._round_up_128 = round_up_64
    fns["auction_n64"] = scan_fn("auction")
    _ = fns["auction_n64"](inputs)           # compile under n64
    fns["greedy"] = scan_fn("greedy")
    _ = fns["greedy"](inputs)

    # interleave A/B/C timing rounds to decorrelate contention
    for name in ("auction_n128", "auction_n64", "greedy"):
        results[name] = round(time_one(fns[name], inputs), 4)
    print(json.dumps({"ms_per_frame": results}))
