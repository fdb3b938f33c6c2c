"""Non-maximum suppression as a Pallas TPU kernel (component C8).

The reference uses the torchvision/mmcv CUDA ``nms`` extension (SURVEY.md
§2.1); the BASELINE north-star names NMS as a Pallas kernel explicitly.

Greedy NMS has a sequential dependency (a box is kept iff no higher-scored
*kept* box overlaps it), which maps badly to wide vector hardware if done
box-by-box. This kernel uses the block-parallel formulation (the
PSRR-MaxpoolNMS / ASAP-NMS family, and TF's padded TPU NMS): boxes arrive
score-sorted; process blocks of 128 in order:

  1. cross-block: suppress the block against all *kept* boxes of previous
     blocks in one vectorized (B, N) IoU pass;
  2. in-block: resolve the sequential dependency by fixpoint iteration of
     alive[i] = valid[i] and not any(j < i, alive[j], iou[j,i] > thr) —
     converges to the exact greedy solution in at most chain-depth
     iterations (typically 2-4), checked by a ``lax.while_loop``.

The result is bit-exact greedy NMS (oracle-tested against a numpy loop).

Layout note: boxes enter the kernel as four planar (1, N) coordinate arrays
(x1/y1/x2/y2) rather than packed (N, 4) — lane-major planes broadcast
cleanly on the VPU, and Mosaic cannot lower the fancy-indexing gathers a
packed pairwise-IoU needs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, out_ref, *,
                iou_threshold: float, n: int):
    """Single-program kernel: sequential over blocks, vectorized within."""
    num_blocks = n // _BLOCK
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, n), dimension=1)
    in_ids = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), dimension=0)
    in_jds = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), dimension=1)

    x1a, y1a = x1_ref[:], y1_ref[:]                                  # (1, N)
    x2a, y2a = x2_ref[:], y2_ref[:]
    area_all = jnp.maximum(x2a - x1a, 0.0) * jnp.maximum(y2a - y1a, 0.0)

    # out_ref doubles as the kept-mask accumulator (f32 0/1), shape (1, N).
    out_ref[:] = jnp.zeros((1, n), jnp.float32)

    def iou_cols(bx1, by1, bx2, by2, barea):
        """IoU of block boxes (given as (B, 1) columns) vs all boxes -> (B, N)."""
        ix1 = jnp.maximum(bx1, x1a)      # (B, 1) vs (1, N) -> (B, N)
        iy1 = jnp.maximum(by1, y1a)
        ix2 = jnp.minimum(bx2, x2a)
        iy2 = jnp.minimum(by2, y2a)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = barea + area_all - inter
        return inter / jnp.maximum(union, 1e-7)

    def block_body(t, _):
        # All masks are f32 0/1 with max-reductions: Mosaic cannot reshape
        # 1-bit (i1) vectors ("insertion of minor dim only for 32-bit types").
        start = t * _BLOCK
        ds = pl.ds(start, _BLOCK)
        bx1 = x1_ref[:, ds].reshape(_BLOCK, 1)                       # (B, 1)
        by1 = y1_ref[:, ds].reshape(_BLOCK, 1)
        bx2 = x2_ref[:, ds].reshape(_BLOCK, 1)
        by2 = y2_ref[:, ds].reshape(_BLOCK, 1)
        blk_valid = valid_ref[:, ds]                                 # (1, B) f32
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)

        iou_all = iou_cols(bx1, by1, bx2, by2, barea)                # (B, N)

        # 1. cross-block suppression vs previously kept boxes
        kept_prev = out_ref[:]                                       # (1, N) f32
        prev_cols = (col_ids < start).astype(jnp.float32)            # (B, N)
        hits = (iou_all > iou_threshold).astype(jnp.float32) * kept_prev * prev_cols
        sup = jnp.max(hits, axis=1).reshape(1, _BLOCK)               # (1, B) f32
        not_sup = 1.0 - sup
        alive0 = blk_valid * not_sup                                 # (1, B) f32

        # 2. in-block greedy via fixpoint iteration: (B, B) IoU of the block
        # against itself, from (B, 1) columns vs (1, B) rows (Mosaic cannot
        # dynamic_slice the (B, N) value, so recompute — it's one tile).
        ix1 = jnp.maximum(bx1, x1_ref[:, ds])
        iy1 = jnp.maximum(by1, y1_ref[:, ds])
        ix2 = jnp.minimum(bx2, x2_ref[:, ds])
        iy2 = jnp.minimum(by2, y2_ref[:, ds])
        inter_b = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union_b = barea + barea.reshape(1, _BLOCK) - inter_b
        iou_blk = inter_b / jnp.maximum(union_b, 1e-7)
        # m[j, i] = 1: higher-scored j (j < i) suppresses i
        m = jnp.logical_and(in_ids < in_jds, iou_blk > iou_threshold).astype(
            jnp.float32
        )

        def fix_cond(carry):
            _alive, changed, it = carry
            return jnp.logical_and(changed, it < _BLOCK)

        def fix_body(carry):
            alive, _changed, it = carry                              # (1, B) f32
            # suppressed[i] = max_j alive[j] * m[j, i]
            suppressed = jnp.max(alive.reshape(_BLOCK, 1) * m, axis=0).reshape(
                1, _BLOCK
            )
            new_alive = blk_valid * (1.0 - suppressed) * not_sup
            changed = jnp.max(jnp.abs(new_alive - alive)) > 0.0
            return new_alive, changed, it + 1

        alive, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (alive0, jnp.bool_(True), jnp.int32(0))
        )
        out_ref[:, ds] = alive
        return 0

    jax.lax.fori_loop(0, num_blocks, block_body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_interpret(interpret):
    """Pallas compiles only on TPU; everywhere else fall back to the
    interpreter so the same code runs in CPU CI and tests."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_mask_batched(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.6,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask, batched over images via the kernel grid.

    boxes (B, N, 4) MUST be score-sorted descending within each image;
    valid (B, N) bool/float. Returns (B, N) bool keep mask. One kernel
    program per image — no Python loop over the batch (the per-image chunk
    postprocess of round 1 serialized B chains and bloated compile time).
    """
    interpret = _auto_interpret(interpret)
    b, n = boxes.shape[0], boxes.shape[1]
    n_pad = _round_up(max(n, _BLOCK), _BLOCK)
    # planes are (B, 1, n_pad); the grid iterates B with the batch dim
    # squeezed out of the block (None), so each program sees the (1, n_pad)
    # refs the kernel body is written for. (A (1, n_pad) block over a
    # (B, n_pad) array violates Mosaic's sublane divisibility rule — caught
    # on real TPU, invisible in interpret mode.)
    planes = []
    for k in range(4):
        planes.append(
            jnp.zeros((b, 1, n_pad), jnp.float32).at[:, 0, :n].set(
                boxes[:, :, k].astype(jnp.float32)
            )
        )
    valid_p = jnp.zeros((b, 1, n_pad), jnp.float32).at[:, 0, :n].set(
        valid.astype(jnp.float32)
    )

    row_spec = pl.BlockSpec(
        (None, 1, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold, n=n_pad),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        in_specs=[row_spec] * 5,
        out_specs=row_spec,
        interpret=interpret,
    )(*planes, valid_p)
    return out[:, 0, :n] > 0.0


def pallas_nms_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.6,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask. boxes (N, 4) MUST be score-sorted descending.

    valid: (N,) bool/float mask of real entries. Returns (N,) bool keep mask.
    """
    return pallas_nms_mask_batched(
        boxes[None], valid[None], iou_threshold, interpret=interpret
    )[0]


def nms_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.6,
    max_outputs: int = 128,
    score_threshold: float = 0.0,
    interpret: bool | None = None,
):
    """Batched full NMS: per-image sort, suppress, return top ``max_outputs``.

    boxes (B, N, 4), scores (B, N). Returns (boxes (B, K, 4), scores (B, K),
    indices (B, K) into the input, valid (B, K) bool) with K = max_outputs,
    padded with zeros / -1. All sorts/gathers are batched XLA ops; the
    suppression runs as one gridded Pallas call.
    """
    n = boxes.shape[-2]
    order_scores, order = jax.lax.top_k(scores, n)                 # (B, N)
    sorted_boxes = jnp.take_along_axis(boxes, order[..., None], axis=-2)
    valid = order_scores > score_threshold
    keep = pallas_nms_mask_batched(
        sorted_boxes, valid, iou_threshold, interpret=interpret
    )

    sel_scores = jnp.where(keep, order_scores, -jnp.inf)
    top_scores, sel = jax.lax.top_k(sel_scores, max_outputs)       # (B, K)
    out_valid = jnp.isfinite(top_scores)
    out_boxes = jnp.where(
        out_valid[..., None],
        jnp.take_along_axis(sorted_boxes, sel[..., None], axis=-2),
        0.0,
    )
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    out_idx = jnp.where(
        out_valid, jnp.take_along_axis(order, sel, axis=-1), -1
    )
    return out_boxes, out_scores, out_idx, out_valid


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.6,
    max_outputs: int = 128,
    score_threshold: float = 0.0,
    interpret: bool | None = None,
):
    """Full NMS: sort by score, suppress, return top ``max_outputs``.

    boxes (N, 4), scores (N,). Returns (boxes (K, 4), scores (K,),
    indices (K,) into the input, valid (K,) bool) with K = max_outputs,
    padded with zeros / -1.
    """
    b, s, i, v = nms_batched(
        boxes[None], scores[None], iou_threshold, max_outputs,
        score_threshold, interpret=interpret,
    )
    return b[0], s[0], i[0], v[0]


def reference_nms_mask(boxes, valid, iou_threshold):
    """Pure-JAX sequential greedy NMS (oracle / CPU fallback). Same contract
    as pallas_nms_mask; O(N) sequential steps — for tests, not production."""
    n = boxes.shape[0]
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-7)

    def body(i, keep):
        sup = jnp.any(
            jnp.logical_and(
                jnp.logical_and(keep, iou[:, i] > iou_threshold),
                jnp.arange(n) < i,
            )
        )
        return keep.at[i].set(jnp.logical_and(valid[i], jnp.logical_not(sup)))

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
