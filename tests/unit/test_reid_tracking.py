"""Config-3/5 tracker behavior: appearance cost fusion and long-horizon
re-ID recovery (C11/C13 wiring + SLOT_LOST lifecycle)."""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import TrackerConfig
from waymo_2d_tracking_tpu.tracker import Tracker
from waymo_2d_tracking_tpu.types import Detections


def make_dets(frames, embed_dim=8):
    """frames: list of list of (box4, score, cls, embed_vec or None)."""
    d = max(max((len(f) for f in frames), default=1), 1)
    t = len(frames)
    boxes = np.zeros((t, d, 4), np.float32)
    scores = np.zeros((t, d), np.float32)
    classes = np.zeros((t, d), np.int32)
    embeds = np.zeros((t, d, embed_dim), np.float32)
    valid = np.zeros((t, d), bool)
    for i, frame in enumerate(frames):
        for j, (box, sc, cl, e) in enumerate(frame):
            boxes[i, j] = box
            scores[i, j] = sc
            classes[i, j] = cl
            if e is not None:
                embeds[i, j] = e / np.linalg.norm(e)
            valid[i, j] = True
    return Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
        classes=jnp.asarray(classes), embeds=jnp.asarray(embeds),
        valid=jnp.asarray(valid),
    )


def box(x, y, w=40.0, h=40.0):
    return np.array([x, y, x + w, y + h], np.float32)


E = np.eye(8, dtype=np.float32)  # orthogonal embeddings


def emitted(outs, t):
    v = np.asarray(outs.valid[t])
    return dict(zip(np.asarray(outs.track_id[t])[v].tolist(),
                    np.asarray(outs.boxes[t])[v].tolist()))


def test_appearance_breaks_iou_tie():
    """Two identical-geometry detections crossing: appearance keeps ids."""
    cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                        appearance_weight=0.5, appearance_gate=0.9,
                        iou_threshold=0.05, n_init=2, max_age=2)
    tracker = Tracker(cfg)
    # objects approach, overlap heavily at the middle frame, then separate.
    frames = []
    for t in range(9):
        xa = 100 + 10 * t      # A moves right
        xb = 180 - 10 * t      # B moves left
        frames.append([
            (box(xa, 100), 0.9, 0, E[0]),
            (box(xb, 100), 0.9, 0, E[1]),
        ])
    _, outs = tracker.run(make_dets(frames))
    # match each final det to an id; A ends at 180, B ends at 100
    last = emitted(outs, 8)
    first = emitted(outs, 1)
    assert set(last) == set(first) == {0, 1}


def test_reid_recovery_restores_id_after_long_gap():
    cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                        appearance_weight=0.3, appearance_gate=0.4,
                        n_init=2, max_age=2, reid_recovery=True,
                        max_lost_age=20)
    tracker = Tracker(cfg)
    frames = (
        [[(box(100, 100), 0.9, 0, E[0])] for _ in range(5)]
        + [[] for _ in range(8)]                       # long occlusion
        + [[(box(300, 300), 0.9, 0, E[0])] for _ in range(5)]  # reappears elsewhere
    )
    _, outs = tracker.run(make_dets(frames))
    before = {i for t in range(5) for i in emitted(outs, t)}
    after = {i for t in range(14, 18) for i in emitted(outs, t)}
    assert before == {0}
    assert after == {0}, f"identity lost across occlusion: {after}"


def test_no_recovery_for_different_appearance():
    cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                        appearance_weight=0.3, appearance_gate=0.4,
                        n_init=2, max_age=2, reid_recovery=True,
                        max_lost_age=20)
    tracker = Tracker(cfg)
    frames = (
        [[(box(100, 100), 0.9, 0, E[0])] for _ in range(5)]
        + [[] for _ in range(8)]
        + [[(box(300, 300), 0.9, 0, E[1])] for _ in range(5)]  # different object
    )
    _, outs = tracker.run(make_dets(frames))
    before = {i for t in range(5) for i in emitted(outs, t)}
    after = {i for t in range(14, 18) for i in emitted(outs, t)}
    assert before == {0}
    assert after and 0 not in after, "recovered across a failed appearance gate"


def test_lost_track_eventually_dies():
    cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                        n_init=2, max_age=2, reid_recovery=True, max_lost_age=5)
    tracker = Tracker(cfg)
    frames = [[(box(100, 100), 0.9, 0, E[0])] for _ in range(5)] + [[]] * 12
    state, _ = tracker.run(make_dets(frames))
    assert np.all(np.asarray(state.status) == 0)


def test_gallery_recovers_older_appearance():
    """With a K>1 gallery, a track whose appearance drifted A->B can still be
    recovered by its older appearance A after occlusion; with K=1 EMA-only
    scoring (drifted fully to B) the same scenario fails the gate."""
    def run_with(gallery_size):
        cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                            appearance_weight=0.3, appearance_gate=0.35,
                            n_init=2, max_age=2, reid_recovery=True,
                            max_lost_age=30, gallery_size=gallery_size,
                            embed_ema=0.4)  # fast drift
        tracker = Tracker(cfg)
        a, b = E[0], E[1]
        drift_frames = 14
        frames = [
            # appearance slerps A -> B gradually so stage-1 keeps matching
            [(box(100 + 5 * t, 100), 0.9, 0,
              np.cos(np.pi / 2 * t / drift_frames) * a
              + np.sin(np.pi / 2 * t / drift_frames) * b)]
            for t in range(drift_frames + 1)
        ] + [[] for _ in range(8)] + [
            [(box(400, 400), 0.9, 0, a)] for _ in range(4)     # reappears as A
        ]
        _, outs = tracker.run(make_dets(frames))
        t_back = drift_frames + 1 + 8
        before = {i for t in range(4) for i in emitted(outs, t)}
        after = {i for t in range(t_back + 1, t_back + 4) for i in emitted(outs, t)}
        return before, after

    before, after = run_with(gallery_size=10)
    assert before == {0} and after == {0}, (before, after)

    before1, after1 = run_with(gallery_size=1)
    # EMA drifted to B: appearance A fails the 0.3 gate -> new id
    assert before1 == {0} and 0 not in after1, (before1, after1)


def test_recovery_momentum_keeps_fast_mover_after_occlusion():
    """A fast mover recovered after occlusion: plain re-init starts at zero
    velocity, so the very next frames un-overlap the prediction and the
    track drops out again; recovery_momentum sets velocity from the
    observed displacement across the gap and the id is emitted every
    post-recovery frame."""
    def run_with(momentum):
        cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                            appearance_weight=0.3, appearance_gate=0.4,
                            n_init=2, max_age=2, reid_recovery=True,
                            max_lost_age=20, recovery_momentum=momentum)
        # trackable 10 px/frame before the occlusion, accelerates to
        # 30 px/frame behind it (boxes 40 wide: a 30 px one-frame
        # prediction error fails the 0.3 IoU gate)
        def p(t):
            return 100.0 + 10.0 * t if t <= 4 else 140.0 + 30.0 * (t - 4)
        frames = (
            [[(box(p(t), 100), 0.9, 0, E[0])] for t in range(5)]
            + [[] for _ in range(5)]                     # occlusion, 5 frames
            + [[(box(p(t), 100), 0.9, 0, E[0])] for t in range(10, 15)]
        )
        _, outs = Tracker(cfg).run(make_dets(frames))
        return outs

    outs_m = run_with(True)
    # id 0 emitted on EVERY post-recovery frame: velocity was re-estimated
    # from the displacement across the gap (~27 px/frame vs true 30)
    for t in range(10, 15):
        assert 0 in emitted(outs_m, t), f"id 0 missing at frame {t}"

    outs_p = run_with(False)
    # both paths recover id 0 AT frame 10; zero-velocity re-init then loses
    # the accelerated mover on later frames
    assert 0 in emitted(outs_p, 10)
    missing = [t for t in range(11, 15) if 0 not in emitted(outs_p, t)]
    assert missing, "zero-velocity re-init unexpectedly held the fast mover"


def test_recovery_momentum_off_is_default_parity():
    """recovery_momentum=False must be bit-identical to the pre-knob path."""
    cfg = TrackerConfig(max_tracks=8, max_detections=4, embed_dim=8,
                        appearance_weight=0.3, appearance_gate=0.4,
                        n_init=2, max_age=2, reid_recovery=True,
                        max_lost_age=20)
    frames = (
        [[(box(100 + 10 * t, 100), 0.9, 0, E[0])] for t in range(5)]
        + [[] for _ in range(4)]
        + [[(box(100 + 10 * t, 100), 0.9, 0, E[0])] for t in range(9, 14)]
    )
    _, a = Tracker(cfg).run(make_dets(frames))
    import dataclasses as _dc
    _, b = Tracker(_dc.replace(cfg, recovery_momentum=False)).run(
        make_dets(frames))
    np.testing.assert_array_equal(np.asarray(a.track_id), np.asarray(b.track_id))
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
