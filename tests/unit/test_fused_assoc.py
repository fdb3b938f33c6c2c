"""Fused stage-1 kernel vs the unfused (stage1_cost -> auction_assign) path."""
import numpy as np
import pytest
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.ops.assign import auction_assign
from waymo_2d_tracking_tpu.ops.fused_assoc import fused_stage1_assign
from waymo_2d_tracking_tpu.tracker import cost as cost_mod
from waymo_2d_tracking_tpu.tracker import init_state
from waymo_2d_tracking_tpu.types import Detections


def make_problem(rng, s=24, d=16, e=8, live_frac=0.6):
    state = init_state(TrackerConfig(max_tracks=s, max_detections=d, embed_dim=e))
    n_live = int(s * live_frac)
    mean = np.zeros((s, 8), np.float32)
    mean[:, :2] = rng.uniform(50, 400, (s, 2))
    mean[:, 2:4] = rng.uniform(20, 80, (s, 2))
    embed = rng.normal(0, 1, (s, e)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    state = state.replace(
        mean=jnp.asarray(mean),
        embed=jnp.asarray(embed),
        classes=jnp.asarray(rng.integers(0, 3, s).astype(np.int32)),
        status=jnp.asarray((np.arange(s) < n_live) * 2).astype(jnp.int8),
    )
    track_mask = jnp.asarray(np.arange(s) < n_live)

    # detections near some of the tracks (so there are real matches)
    dbox = np.zeros((d, 4), np.float32)
    src = rng.permutation(s)[:d]
    centers = mean[src, :2] + rng.normal(0, 5, (d, 2))
    sizes = mean[src, 2:4] * rng.uniform(0.9, 1.1, (d, 2))
    dbox[:, :2] = centers - sizes / 2
    dbox[:, 2:] = centers + sizes / 2
    dembed = embed[src] + rng.normal(0, 0.1, (d, e)).astype(np.float32)
    dembed /= np.linalg.norm(dembed, axis=1, keepdims=True)
    dets = Detections(
        boxes=jnp.asarray(dbox),
        scores=jnp.asarray(rng.uniform(0.6, 1.0, d).astype(np.float32)),
        classes=jnp.asarray(rng.integers(0, 3, d).astype(np.int32)),
        embeds=jnp.asarray(dembed),
        valid=jnp.asarray(rng.uniform(size=d) > 0.2),
    )
    return state, dets, track_mask


def pair_cost(c1, f1, rtc):
    c1 = np.asarray(c1)
    f1 = np.asarray(f1)
    total, count = 0.0, 0
    for i, j in enumerate(np.asarray(rtc)):
        if j >= 0:
            assert not f1[i, j], "matched a forbidden pair"
            total += c1[i, j]
            count += 1
    return total, count


@pytest.mark.slow
def test_fused_matches_unfused():
    rng = np.random.default_rng(0)
    for lam in (0.0, 0.3):
        for trial in range(3):
            cfg = TrackerConfig(max_tracks=24, max_detections=16, embed_dim=8,
                                appearance_weight=lam, appearance_gate=0.5,
                                iou_threshold=0.2)
            state, dets, track_mask = make_problem(rng)
            det_valid = dets.valid

            c1, f1 = cost_mod.stage1_cost(state, dets, det_valid, track_mask, cfg)
            rtc_ref, _ = auction_assign(
                c1, row_mask=track_mask, col_mask=det_valid, forbid=f1,
                eps_scale=0.2, eps_min=1e-2, max_iters=4096, use_pallas=False,
            )
            rtc_fused, ctr_fused = fused_stage1_assign(
                state.mean, state.embed, state.classes, track_mask,
                dets.boxes, dets.embeds, dets.classes, det_valid,
                appearance_weight=lam,
                iou_threshold=cfg.iou_threshold,
                appearance_gate=cfg.appearance_gate,
                eps_min=1e-2, interpret=True,
            )
            cost_ref, n_ref = pair_cost(c1, f1, rtc_ref)
            cost_fused, n_fused = pair_cost(c1, f1, rtc_fused)
            # same matching cardinality and near-equal total cost
            assert n_fused == n_ref, (lam, trial, n_fused, n_ref)
            assert abs(cost_fused - cost_ref) <= 128 * 2e-2 + 1e-4, (
                lam, trial, cost_fused, cost_ref)
            # inverse map consistent
            ctr = np.asarray(ctr_fused)
            for i, j in enumerate(np.asarray(rtc_fused)):
                if j >= 0:
                    assert ctr[j] == i


def test_fused_empty_inputs():
    rng = np.random.default_rng(1)
    state, dets, track_mask = make_problem(rng)
    rtc, ctr = fused_stage1_assign(
        state.mean, state.embed, state.classes,
        jnp.zeros_like(track_mask),                    # no live tracks
        dets.boxes, dets.embeds, dets.classes, dets.valid,
        interpret=True,
    )
    assert (np.asarray(rtc) == -1).all()
    assert (np.asarray(ctr) == -1).all()


@pytest.mark.slow
def test_tracker_with_fused_stage1_matches_quality():
    """Full tracker with fused_stage1=True tracks the synthetic clip with
    the same quality as the unfused path."""
    from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
    from waymo_2d_tracking_tpu.eval.mot import (
        evaluate_mot, gt_to_frames, track_outputs_to_frames,
    )
    from waymo_2d_tracking_tpu.tracker import Tracker

    dets, gt = generate_clip(SyntheticClipConfig(num_frames=60, num_objects=8,
                                                 max_detections=32, embed_dim=16))
    results = {}
    for fused in (False, True):
        cfg = TrackerConfig(max_tracks=32, max_detections=32, embed_dim=16,
                            appearance_weight=0.3, fused_stage1=fused)
        _, outs = Tracker(cfg).run(dets)
        m = evaluate_mot(gt_to_frames({k: v[:60] if hasattr(v, '__getitem__') and k != 'ids' and k != 'classes' else v for k, v in gt.items()}),
                         track_outputs_to_frames(outs, 60))
        results[fused] = m
    assert abs(results[True].mota - results[False].mota) < 0.03, (
        results[True].as_dict(), results[False].as_dict())
    assert results[True].mota > 0.75
