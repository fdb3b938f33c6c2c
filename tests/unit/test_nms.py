"""Unit tests for ops/nms.py (C8) — Pallas kernel vs numpy greedy oracle.

CPU CI runs the kernel with interpret=True (SURVEY.md §4); the compiled-TPU
path is exercised by bench/verify outside pytest.
"""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.ops.nms import (
    nms,
    pallas_nms_mask,
    reference_nms_mask,
)


def np_greedy_nms(boxes, valid, thr):
    """Oracle: textbook greedy NMS over score-sorted boxes."""
    n = len(boxes)
    keep = np.zeros(n, bool)
    for i in range(n):
        if not valid[i]:
            continue
        ok = True
        for j in range(i):
            if keep[j]:
                ix1, iy1 = max(boxes[i][0], boxes[j][0]), max(boxes[i][1], boxes[j][1])
                ix2, iy2 = min(boxes[i][2], boxes[j][2]), min(boxes[i][3], boxes[j][3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                a_i = max(boxes[i][2] - boxes[i][0], 0) * max(boxes[i][3] - boxes[i][1], 0)
                a_j = max(boxes[j][2] - boxes[j][0], 0) * max(boxes[j][3] - boxes[j][1], 0)
                union = a_i + a_j - inter
                if union > 0 and inter / union > thr:
                    ok = False
                    break
        keep[i] = ok
    return keep


def random_sorted_boxes(rng, n, spread=200.0):
    """Random boxes, already 'score-sorted' (order is the score order)."""
    xy = rng.uniform(0, spread, size=(n, 2))
    wh = rng.uniform(10, 80, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_simple_suppression():
    boxes = jnp.asarray(
        np.array(
            [
                [0, 0, 10, 10],      # kept (highest score)
                [1, 1, 11, 11],      # overlaps 0 heavily -> suppressed
                [100, 100, 110, 110],  # kept
            ],
            np.float32,
        )
    )
    keep = pallas_nms_mask(boxes, jnp.ones(3, bool), 0.5, interpret=True)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_vs_oracle_random_small():
    rng = np.random.default_rng(0)
    for trial in range(4):
        boxes = random_sorted_boxes(rng, 50, spread=150.0)  # dense overlaps
        valid = np.ones(50, bool)
        got = np.asarray(
            pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
        )
        np.testing.assert_array_equal(got, np_greedy_nms(boxes, valid, 0.5))


def test_vs_oracle_multiblock():
    # > 128 boxes forces the cross-block path
    rng = np.random.default_rng(1)
    boxes = random_sorted_boxes(rng, 300, spread=400.0)
    valid = np.ones(300, bool)
    got = np.asarray(
        pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    np.testing.assert_array_equal(got, np_greedy_nms(boxes, valid, 0.5))


def test_suppression_chain_revival():
    # 0 suppresses 1, 1 suppresses 2 (but 0 does not suppress 2):
    # greedy keeps {0, 2} — exercises the fixpoint revival logic
    boxes = jnp.asarray(
        np.array(
            [[0, 0, 10, 10], [6, 0, 16, 10], [12, 0, 22, 10]], np.float32
        )
    )
    keep = pallas_nms_mask(boxes, jnp.ones(3, bool), 0.2, interpret=True)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_invalid_entries_never_kept():
    rng = np.random.default_rng(2)
    boxes = random_sorted_boxes(rng, 40)
    valid = rng.uniform(size=40) > 0.4
    got = np.asarray(
        pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    assert not got[~valid].any()
    np.testing.assert_array_equal(got, np_greedy_nms(boxes, valid, 0.5))


def test_reference_jax_matches_oracle():
    rng = np.random.default_rng(3)
    boxes = random_sorted_boxes(rng, 60, spread=150.0)
    valid = np.ones(60, bool)
    got = np.asarray(reference_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(got, np_greedy_nms(boxes, valid, 0.5))


def test_nms_wrapper_sorts_and_selects():
    rng = np.random.default_rng(4)
    n = 200
    boxes = random_sorted_boxes(rng, n, spread=500.0)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    out_boxes, out_scores, out_idx, out_valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=32, interpret=True
    )
    out_scores = np.asarray(out_scores)
    out_valid = np.asarray(out_valid)
    out_idx = np.asarray(out_idx)
    # scores descending among valid
    v = out_scores[out_valid]
    assert np.all(np.diff(v) <= 0)
    # oracle on sorted order
    order = np.argsort(-scores, kind="stable")
    keep = np_greedy_nms(boxes[order], np.ones(n, bool), 0.5)
    expected_idx = order[keep][:32]
    np.testing.assert_array_equal(out_idx[out_valid], expected_idx[: out_valid.sum()])


def test_batched_mask_matches_per_image_oracle():
    from waymo_2d_tracking_tpu.ops.nms import pallas_nms_mask_batched

    rng = np.random.default_rng(7)
    b, n = 5, 130  # crosses the 128 block boundary
    boxes = np.stack([random_sorted_boxes(rng, n) for _ in range(b)])
    valid = rng.uniform(size=(b, n)) > 0.1
    got = np.asarray(
        pallas_nms_mask_batched(jnp.asarray(boxes), jnp.asarray(valid), 0.5,
                                interpret=True)
    )
    for i in range(b):
        np.testing.assert_array_equal(
            got[i], np_greedy_nms(boxes[i], valid[i], 0.5), err_msg=f"img {i}"
        )


def test_nms_batched_matches_single_loop():
    from waymo_2d_tracking_tpu.ops.nms import nms_batched

    rng = np.random.default_rng(3)
    b, n = 4, 96
    boxes = np.stack([random_sorted_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0.01, 1.0, size=(b, n)).astype(np.float32)
    got = nms_batched(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                      max_outputs=32, score_threshold=0.05, interpret=True)
    for i in range(b):
        want = nms(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5,
                   max_outputs=32, score_threshold=0.05, interpret=True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g)[i], np.asarray(w),
                                       err_msg=f"img {i}")
