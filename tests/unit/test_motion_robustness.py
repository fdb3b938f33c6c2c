"""NSA Kalman (score-adaptive R) and buffered IoU (C-BIoU) — opt-in knobs.

NSA (StrongSORT): measurement noise scaled by (1 - score) so a confident
detection corrects the state harder. BIoU (C-BIoU): boxes expanded before
the stage-1 IoU so fast movers stay associable when consecutive frames no
longer overlap. Both default OFF and must leave default behavior untouched.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import KalmanConfig, TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import scripted_detections
from waymo_2d_tracking_tpu.tracker import Tracker, kalman


def test_nsa_high_score_trusts_measurement_more():
    cfg = KalmanConfig(nsa=True)
    meas0 = jnp.array([100.0, 100.0, 50.0, 50.0])
    mean, cov = kalman.init_track(meas0, cfg)
    mean, cov = kalman.predict(mean, cov, cfg)
    meas = jnp.array([120.0, 100.0, 50.0, 50.0])
    m_hi, _ = kalman.update(mean, cov, meas, cfg, score=jnp.float32(0.99))
    m_lo, _ = kalman.update(mean, cov, meas, cfg, score=jnp.float32(0.1))
    err_hi = abs(float(m_hi[0]) - 120.0)
    err_lo = abs(float(m_lo[0]) - 120.0)
    assert err_hi < err_lo  # high score -> posterior closer to measurement
    # and the 0.99-score posterior is essentially ON the measurement
    assert err_hi < 1.0


def test_nsa_off_ignores_score():
    cfg = KalmanConfig()  # nsa=False
    meas0 = jnp.array([100.0, 100.0, 50.0, 50.0])
    mean, cov = kalman.init_track(meas0, cfg)
    meas = jnp.array([110.0, 100.0, 50.0, 50.0])
    m_a, c_a = kalman.update(mean, cov, meas, cfg, score=jnp.float32(0.9))
    m_b, c_b = kalman.update(mean, cov, meas, cfg, score=jnp.float32(0.2))
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))


def _fast_mover_clip(num_frames=12, v=100.0, w=80.0):
    # one object sprinting right at v px/frame: consecutive boxes (width w)
    # never overlap, so plain IoU can never associate frame to frame
    frames = []
    for t in range(num_frames):
        x = 50.0 + v * t
        frames.append([([x, 100.0, x + w, 100.0 + w], 0.9, 0)])
    return scripted_detections(frames)


def _unique_emitted_ids(outs):
    ids = np.asarray(outs.track_id)[np.asarray(outs.valid)]
    return set(ids.tolist())


def test_biou_keeps_fast_movers_associated():
    dets = _fast_mover_clip()
    base = TrackerConfig(
        max_tracks=16, max_detections=1, embed_dim=0,
        n_init=3, max_age=3, iou_threshold=0.3,
    )
    state_plain, outs_plain = Tracker(base).run(dets)
    _, outs_biou = Tracker(
        dataclasses.replace(base, iou_buffer=0.8)
    ).run(dets)
    # plain IoU: every frame births a fresh tentative that dies unmatched the
    # next frame — 12 ids allocated, nothing ever confirms, output is only
    # the n_init warmup frames
    assert int(state_plain.next_id) == 12
    assert len(_unique_emitted_ids(outs_plain)) >= 3
    assert int(np.asarray(outs_plain.valid).sum()) <= base.n_init
    # buffered IoU: one identity for the whole sprint, emitted every frame
    assert _unique_emitted_ids(outs_biou) == {0}
    assert int(np.asarray(outs_biou.valid).sum()) == 12


def test_biou_zero_is_exact_parity():
    # iou_buffer=0 must be bit-identical to the default path
    dets = _fast_mover_clip(v=10.0)  # overlapping boxes, normal regime
    base = TrackerConfig(max_tracks=16, max_detections=1, embed_dim=0)
    _, a = Tracker(base).run(dets)
    _, b = Tracker(dataclasses.replace(base, iou_buffer=0.0)).run(dets)
    np.testing.assert_array_equal(np.asarray(a.track_id), np.asarray(b.track_id))
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
