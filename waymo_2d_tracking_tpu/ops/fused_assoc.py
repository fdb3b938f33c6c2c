"""Fused stage-1 association kernel: cost + gating + auction in one Pallas
call (tracker perf roadmap item, docs/DESIGN.md §5).

``track_step``'s stage-1 is a chain of ~35 small XLA ops per scanned frame
(box conversion, IoU matrix, cosine matmul, gate masks, benefit build) ending
in the auction kernel. At (S, D) <= (128, 128) every tensor fits VMEM many
times over, so the whole chain fuses into one kernel: the IoU/cosine math
follows ops/nms.py's planar broadcast pattern, the cosine cost is one
``pl.dot`` on the MXU, and the auction loop is the same eps-scaled Jacobi
machinery as ops/assign.py's kernel.

Semantics are IDENTICAL to (stage1_cost -> auction_assign): equivalence is
tested against that composition. Enabled by TrackerConfig.fused_stage1.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(
    # scalar prefetch
    lam_ref, eps_minmax_ref,
    # tensors (all pre-padded to n rows/cols outside the kernel — Mosaic
    # has no dynamic_update_slice, so no in-kernel re-embedding)
    tmean_ref,      # (n, 8) track Kalman means (cxcywh in [:4])
    tembed_ref,     # (n, E)
    tclass_ref,     # (1, n) f32
    tmask_ref,      # (1, n) f32 active-track mask (0 on padding)
    dbox_ref,       # (n, 4) xyxy
    dembed_ref,     # (E, n) transposed det embeds
    dclass_ref,     # (1, n) f32
    dmask_ref,      # (1, n) f32 valid-det mask (0 on padding)
    # outputs
    rtc_ref,        # (n, 1) f32 row->col
    *,
    n: int,
    iou_threshold: float, appearance_gate: float,
    eps_scale: float, max_iters: int,
):
    lam = lam_ref[0, 0]
    eps_min = eps_minmax_ref[0, 0]

    # ---- track boxes from Kalman means: planar (S, 1) columns
    cx = tmean_ref[:, 0:1]
    cy = tmean_ref[:, 1:2]
    w = tmean_ref[:, 2:3]
    h = tmean_ref[:, 3:4]
    tx1 = cx - 0.5 * w
    ty1 = cy - 0.5 * h
    tx2 = cx + 0.5 * w
    ty2 = cy + 0.5 * h
    tarea = jnp.maximum(tx2 - tx1, 0.0) * jnp.maximum(ty2 - ty1, 0.0)  # (n,1)

    # ---- det boxes as (1, D) rows
    dx1 = dbox_ref[:, 0:1].reshape(1, n)
    dy1 = dbox_ref[:, 1:2].reshape(1, n)
    dx2 = dbox_ref[:, 2:3].reshape(1, n)
    dy2 = dbox_ref[:, 3:4].reshape(1, n)
    darea = jnp.maximum(dx2 - dx1, 0.0) * jnp.maximum(dy2 - dy1, 0.0)   # (1,n)

    ix1 = jnp.maximum(tx1, dx1)
    iy1 = jnp.maximum(ty1, dy1)
    ix2 = jnp.minimum(tx2, dx2)
    iy2 = jnp.minimum(ty2, dy2)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)   # (S,D)
    union = tarea + darea - inter
    iou = inter / jnp.maximum(union, 1e-7)

    cost = 1.0 - iou
    ok = (iou >= iou_threshold).astype(jnp.float32)                      # (n,n)

    # cosine distance via MXU; zero-weight when lam == 0
    cos = 1.0 - jnp.dot(tembed_ref[:], dembed_ref[:],
                        preferred_element_type=jnp.float32)              # (n,n)
    use_app = (lam > 0.0).astype(jnp.float32)
    cost2 = (1.0 - lam) * cost + lam * cos
    ok2 = ok * jnp.where(cos <= appearance_gate, 1.0, 1.0 - use_app)

    cost = use_app * cost2 + (1.0 - use_app) * cost
    ok = use_app * ok2 + (1.0 - use_app) * ok

    same_class = (tclass_ref[:].reshape(n, 1) == dclass_ref[:]).astype(jnp.float32)
    valid = ok * same_class * tmask_ref[:].reshape(n, 1) * dmask_ref[:]  # (n,n)

    # ---- benefit construction (mirrors assign._build_benefit)
    c_max = jnp.maximum(jnp.max(jnp.where(valid > 0, cost, 0.0)), 0.0)
    c_min = jnp.minimum(jnp.min(jnp.where(valid > 0, cost, 0.0)), 0.0)
    nf = jnp.float32(n)
    pad = -(nf * (c_max - c_min) + 1.0) + c_min

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).astype(jnp.float32)

    benefit = jnp.where(valid > 0, -cost, pad)                           # (n,n)

    rot = jnp.mod(col_iota - row_iota, nf)
    tiny = eps_min / (4.0 * nf)
    benefit = benefit - rot * tiny

    eps0 = jnp.maximum(((c_max - pad) - c_min) * 0.5, eps_min)
    big = jnp.float32(1e30)

    def phase(p, eps):
        def cond(carry):
            rtc, _owner, _p, it = carry
            return jnp.logical_and(it < max_iters, jnp.min(rtc) < 0.0)

        def body(carry):
            rtc, owner, p, it = carry
            v = benefit - p
            v1 = jnp.max(v, axis=1, keepdims=True)
            jbest = jnp.min(jnp.where(v >= v1, col_iota, nf), axis=1, keepdims=True)
            onehot = col_iota == jbest
            v2 = jnp.max(jnp.where(onehot, -big, v), axis=1, keepdims=True)
            b_best = jnp.sum(jnp.where(onehot, benefit, 0.0), axis=1, keepdims=True)
            bid = b_best - v2 + eps
            unassigned = rtc < 0.0
            bids = jnp.where(jnp.logical_and(onehot, unassigned), bid, -big)
            col_best = jnp.max(bids, axis=0, keepdims=True)
            winner = jnp.min(jnp.where(bids >= col_best, row_iota, nf),
                             axis=0, keepdims=True)
            has_bid = col_best > -big * 0.5
            p = jnp.where(has_bid, col_best, p)
            owner = jnp.where(has_bid, winner, owner)
            m = owner == row_iota
            rtc = jnp.min(jnp.where(m, col_iota, nf), axis=1, keepdims=True)
            rtc = jnp.where(rtc >= nf, -1.0, rtc)
            return rtc, owner, p, it + 1

        init = (jnp.full((n, 1), -1.0, jnp.float32),
                jnp.full((1, n), -1.0, jnp.float32), p, jnp.int32(0))
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

    init = (jnp.full((n, 1), -1.0, jnp.float32),
            jnp.zeros((1, n), jnp.float32), eps0)
    rtc, _p, _eps = jax.lax.while_loop(outer_cond, outer_body, init)

    # ---- filter pairs that ran through padding/forbidden
    chosen = col_iota == rtc                                             # (n,n)
    pair_ok = jnp.max(jnp.where(chosen, valid, 0.0), axis=1, keepdims=True)
    rtc_ref[:] = jnp.where(pair_ok > 0.0, rtc, -1.0)


def _round_up_128(x: int) -> int:
    return ((max(x, 128) + 127) // 128) * 128


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "appearance_gate", "eps_scale",
                     "eps_min", "max_iters", "interpret"),
)
def fused_stage1_assign(
    track_mean: jnp.ndarray,    # (S, 8)
    track_embed: jnp.ndarray,   # (S, E)
    track_class: jnp.ndarray,   # (S,) int
    track_mask: jnp.ndarray,    # (S,) bool
    det_boxes: jnp.ndarray,     # (D, 4) xyxy
    det_embed: jnp.ndarray,     # (D, E)
    det_class: jnp.ndarray,     # (D,) int
    det_mask: jnp.ndarray,      # (D,) bool
    appearance_weight: float | jnp.ndarray = 0.0,
    *,
    iou_threshold: float = 0.3,
    appearance_gate: float = 0.4,
    eps_scale: float = 0.2,
    eps_min: float = 1e-2,
    max_iters: int = 4096,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-kernel stage-1 association. Returns (row_to_col (S,), col_to_row
    (D,)) int32 with -1 unmatched — same contract as stage1_cost +
    auction_assign."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s = track_mean.shape[0]
    d = det_boxes.shape[0]
    n = _round_up_128(max(s, d))
    e = track_embed.shape[1]

    lam = jnp.reshape(jnp.asarray(appearance_weight, jnp.float32), (1, 1))
    eps_arr = jnp.full((1, 1), eps_min, jnp.float32)

    def pad_rows(x, rows):
        return jnp.pad(x.astype(jnp.float32), ((0, rows - x.shape[0]),) +
                       ((0, 0),) * (x.ndim - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rtc = pl.pallas_call(
        functools.partial(
            _fused_kernel, n=n,
            iou_threshold=iou_threshold, appearance_gate=appearance_gate,
            eps_scale=eps_scale, max_iters=max_iters,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        lam, eps_arr,
        pad_rows(track_mean, n),
        pad_rows(track_embed, n),
        pad_rows(track_class.astype(jnp.float32).reshape(s, 1), n).reshape(1, n),
        pad_rows(track_mask.astype(jnp.float32).reshape(s, 1), n).reshape(1, n),
        pad_rows(det_boxes, n),
        pad_rows(det_embed, n).T,
        pad_rows(det_class.astype(jnp.float32).reshape(d, 1), n).reshape(1, n),
        pad_rows(det_mask.astype(jnp.float32).reshape(d, 1), n).reshape(1, n),
    )
    row_to_col = rtc[:s, 0].astype(jnp.int32)
    row_to_col = jnp.where(row_to_col >= d, -1, row_to_col)

    rows = jnp.arange(s, dtype=jnp.int32)
    safe = jnp.where(row_to_col >= 0, row_to_col, 0)
    vals = jnp.where(row_to_col >= 0, rows, -1)
    col_to_row = jnp.full((d,), -1, dtype=jnp.int32).at[safe].max(vals)
    return row_to_col, col_to_row
