"""Scenario-table tests for the tracker lifecycle + track_step (C15-C17)."""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.data.synthetic import scripted_detections
from waymo_2d_tracking_tpu.tracker import Tracker
from waymo_2d_tracking_tpu.types import SLOT_CONFIRMED


def make_tracker(**kw):
    defaults = dict(
        max_tracks=16, max_detections=8, embed_dim=0, n_init=2, max_age=2,
        iou_threshold=0.2, score_threshold=0.3, birth_score_threshold=0.5,
    )
    defaults.update(kw)
    return Tracker(TrackerConfig(**defaults))


def box(x, y, w=40.0, h=40.0):
    return np.array([x, y, x + w, y + h], np.float32)


def run(tracker, frames):
    dets = scripted_detections(frames)
    state, outs = tracker.run(dets)
    return state, outs


def emitted_ids(outs, t):
    v = np.asarray(outs.valid[t])
    ids = np.asarray(outs.track_id[t])
    return sorted(ids[v].tolist())


def test_single_object_persistent_id():
    frames = [[(box(100 + 5 * t, 100), 0.9, 0)] for t in range(10)]
    tracker = make_tracker()
    state, outs = run(tracker, frames)
    ids_per_frame = [emitted_ids(outs, t) for t in range(10)]
    # one id throughout, stable
    flat = {i for ids in ids_per_frame for i in ids}
    assert flat == {0}
    # emitted every frame (warm-up rule covers frames before confirmation)
    assert all(len(ids) == 1 for ids in ids_per_frame)


def test_two_objects_two_ids():
    frames = [
        [(box(100, 100), 0.9, 0), (box(400, 400), 0.9, 0)] for _ in range(8)
    ]
    tracker = make_tracker()
    state, outs = run(tracker, frames)
    assert emitted_ids(outs, 7) == [0, 1]
    # ids stable across frames
    for t in range(2, 8):
        assert emitted_ids(outs, t) == [0, 1]


def test_track_death_after_max_age():
    frames = [[(box(100, 100), 0.9, 0)] for _ in range(5)] + [[] for _ in range(6)]
    tracker = make_tracker(max_age=2)
    state, outs = run(tracker, frames)
    # after the object disappears, no emissions
    for t in range(5, 11):
        assert emitted_ids(outs, t) == []
    # slot eventually freed: all statuses empty
    assert np.all(np.asarray(state.status) == 0)


def test_new_id_after_long_gap():
    frames = (
        [[(box(100, 100), 0.9, 0)] for _ in range(5)]
        + [[] for _ in range(6)]
        + [[(box(100, 100), 0.9, 0)] for _ in range(5)]
    )
    tracker = make_tracker(max_age=2)
    state, outs = run(tracker, frames)
    before = {i for t in range(5) for i in emitted_ids(outs, t)}
    after = {i for t in range(11, 16) for i in emitted_ids(outs, t)}
    assert before == {0}
    assert after and before.isdisjoint(after)  # identity NOT preserved without re-ID


def test_tentative_dies_on_first_miss():
    # 1 hit then gone: should never emit after (with n_init=2 nothing confirmed)
    frames = [[(box(100, 100), 0.9, 0)], [], [], []]
    tracker = make_tracker(n_init=2)
    state, outs = run(tracker, frames)
    assert np.all(np.asarray(state.status) == 0)
    assert emitted_ids(outs, 2) == []


def test_low_score_detections_ignored():
    frames = [[(box(100, 100), 0.2, 0)] for _ in range(5)]
    tracker = make_tracker(score_threshold=0.3)
    state, outs = run(tracker, frames)
    for t in range(5):
        assert emitted_ids(outs, t) == []


def test_class_mismatch_not_associated():
    # same location, class flips each frame -> two separate id families
    frames = [[(box(100, 100), 0.9, t % 2)] for t in range(8)]
    tracker = make_tracker()
    state, outs = run(tracker, frames)
    # no track accumulates consecutive hits -> nothing confirmed
    statuses = np.asarray(state.status)
    assert not np.any(statuses == SLOT_CONFIRMED)


def test_crossing_objects_keep_ids():
    # two objects crossing paths; motion continuity should keep ids
    frames = []
    for t in range(21):
        frames.append(
            [
                (box(100 + 10 * t, 100 + 10 * t), 0.9, 0),   # obj A: down-right
                (box(300 - 10 * t, 100 + 10 * t), 0.9, 0),   # obj B: down-left
            ]
        )
    tracker = make_tracker(iou_threshold=0.1)
    state, outs = run(tracker, frames)
    first = emitted_ids(outs, 2)
    last = emitted_ids(outs, 20)
    assert len(first) == 2 and first == last


def test_occlusion_within_max_age_keeps_id():
    frames = (
        [[(box(100 + 5 * t, 100), 0.9, 0)] for t in range(5)]
        + [[], []]  # 2-frame occlusion, within max_age
        + [[(box(100 + 5 * t, 100), 0.9, 0)] for t in range(7, 12)]
    )
    tracker = make_tracker(max_age=3)
    state, outs = run(tracker, frames)
    before = {i for t in range(5) for i in emitted_ids(outs, t)}
    after = {i for t in range(7, 12) for i in emitted_ids(outs, t)}
    assert before == after == {0}


def test_table_overflow_drops_lowest_priority_births():
    # more detections than slots: highest-priority (earliest det index) win
    tracker = make_tracker(max_tracks=4, max_detections=8)
    frames = [
        [(box(100 * i, 100 * i), 0.9, 0) for i in range(1, 7)] for _ in range(3)
    ]
    state, outs = run(tracker, frames)
    statuses = np.asarray(state.status)
    assert np.sum(statuses != 0) == 4  # table full, deterministic
    ids = np.asarray(state.track_id)
    assert sorted(ids[statuses != 0].tolist()) == [0, 1, 2, 3]


def test_next_id_monotonic_and_dense():
    frames = [
        [(box(100, 100), 0.9, 0)],
        [(box(100, 100), 0.9, 0), (box(400, 400), 0.9, 0)],
        [(box(100, 100), 0.9, 0), (box(400, 400), 0.9, 0), (box(700, 700), 0.9, 0)],
    ]
    tracker = make_tracker()
    state, _ = run(tracker, frames)
    assert int(state.next_id) == 3


def test_motion_gate_blocks_implausible_jump():
    """With Mahalanobis motion gating on, a detection teleporting far from
    the Kalman prediction but still IoU-overlapping must NOT extend the
    track; with the gate off it does. Uses a huge box so a big jump keeps
    IoU well above the test's iou_threshold.

    The statistic is the DeepSORT projected-innovation form (S = HPH^T + R,
    round 5): for a track converged on a stationary 400px box, a 160px
    diagonal jump measures d^2 = 35.1 (robustly above the chi2-95% 4-dof
    gate 9.4877, IoU ~= 0.22) while an 80px jump measures d^2 = 8.77 —
    inside the gate by design, since with R = (0.05 h)^2 in S an offset of
    ~20% of box height is within ordinary measurement noise. The companion
    test below pins both numbers."""
    big = (0.0, 0.0, 400.0, 400.0)
    jumped = (160.0, 160.0, 560.0, 560.0)  # IoU ~0.22, d^2 = 35.1
    frames = [[(np.array(big, np.float32), 0.9, 0)]] * 4 + [
        [(np.array(jumped, np.float32), 0.9, 0)]
    ]

    _, outs_base = run(
        make_tracker(n_init=1, iou_threshold=0.05, motion_gate=0.0), frames
    )
    _, outs_gated = run(
        make_tracker(n_init=1, iou_threshold=0.05, motion_gate=9.4877), frames
    )
    # ungated: the jump is associated, same id persists
    assert emitted_ids(outs_base, 4) == emitted_ids(outs_base, 3)
    # gated: association forbidden -> no confirmed emission on the jump frame
    # (the new birth is tentative; the old track is missing)
    assert emitted_ids(outs_gated, 4) != emitted_ids(outs_gated, 3)


def test_gating_distance_projected_innovation_statistic():
    """Pins the round-5 gating_distance semantics (S = HPH^T + R, the
    DeepSORT ``project()`` convention) on the canonical stationary-box
    scenario, so any future rescale of the statistic fails HERE with the
    numbers in hand rather than indirectly through lifecycle behavior:

    - 160px jump on a converged 400px box -> d^2 = 35.1 (blocked at 9.4877)
    - 80px jump  on the same track        -> d^2 = 8.77 (admitted: ~20% of
      box height is inside measurement noise once R is in S)
    - scale-free: d^2 depends only on jump/height (40px on a 100px box
      equals 160px on a 400px box)
    """
    from waymo_2d_tracking_tpu.config import KalmanConfig
    from waymo_2d_tracking_tpu.tracker import kalman

    cfg = KalmanConfig()

    def converged_d2(h, jump):
        meas0 = jnp.array([[h / 2.0, h / 2.0, h, h]], jnp.float32)
        mean, cov = kalman.init_track(meas0, cfg)
        for _ in range(3):
            mean, cov = kalman.predict(mean, cov, cfg)
            mean, cov = kalman.update(mean, cov, meas0, cfg)
        mean, cov = kalman.predict(mean, cov, cfg)
        probe = meas0 + jnp.array([[jump, jump, 0.0, 0.0]], jnp.float32)
        d2 = kalman.gating_distance(mean, cov, probe[None], cfg)
        return float(np.asarray(d2).reshape(-1)[0])

    chi2_95_4dof = 9.4877
    d2_block = converged_d2(400.0, 160.0)
    d2_admit = converged_d2(400.0, 80.0)
    assert abs(d2_block - 35.09) < 0.5
    assert abs(d2_admit - 8.77) < 0.3
    assert d2_block > chi2_95_4dof > d2_admit
    # scale-free in jump/height
    assert abs(converged_d2(100.0, 40.0) - d2_block) < 0.5


def test_birth_iou_suppression():
    """A duplicate detection overlapping a live track (IoU above
    birth_iou_threshold but below the detector NMS threshold, so NMS kept
    it) must NOT birth a twin track; a clean far-away detection must. With
    the knob off (default 1.0) the duplicate births — exact SORT parity."""
    b = box(100, 100, 40, 40)
    dup = box(110, 100, 40, 40)   # IoU ~0.58 with b
    far = box(400, 400, 40, 40)
    frames = [
        [(b, 0.9, 0)],
        [(b, 0.9, 0)],
        # duplicate + clean newcomer arrive together
        [(b, 0.9, 0), (dup, 0.85, 0), (far, 0.85, 0)],
        [(b, 0.9, 0), (dup, 0.85, 0), (far, 0.85, 0)],
    ]

    state_off, _ = run(make_tracker(birth_iou_threshold=1.0), frames)
    live_off = np.asarray(state_off.status) != 0
    assert int(np.sum(live_off)) == 3  # twin track born (parity behavior)

    state_on, _ = run(make_tracker(birth_iou_threshold=0.5), frames)
    live_on = np.asarray(state_on.status) != 0
    assert int(np.sum(live_on)) == 2  # duplicate suppressed, far det born


def test_birth_iou_suppression_is_class_gated():
    """Review r4: the duplicate-birth knob mops up after PER-CLASS NMS, so
    a cross-class overlap is a genuinely new object (a cyclist emerging
    over a tracked vehicle), not an NMS duplicate — it must birth even
    with birth_iou_threshold enabled."""
    b = box(100, 100, 40, 40)
    dup = box(110, 100, 40, 40)   # IoU ~0.58 with b
    frames = [
        [(b, 0.9, 0)],
        [(b, 0.9, 0)],
        [(b, 0.9, 0), (dup, 0.85, 1)],   # other-class newcomer overlaps
        [(b, 0.9, 0), (dup, 0.85, 1)],
    ]
    state, _ = run(make_tracker(birth_iou_threshold=0.5), frames)
    live = np.asarray(state.status) != 0
    assert int(np.sum(live)) == 2  # both tracked: overlap is cross-class
