"""Property/fuzz tests: structural invariants under random inputs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import DetectorConfig, TrackerConfig
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.tracker import Tracker
from waymo_2d_tracking_tpu.types import Detections


def random_det_stream(rng, t, d, embed_dim):
    boxes = rng.uniform(0, 500, (t, d, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 100, (t, d, 2))
    e = rng.normal(0, 1, (t, d, max(embed_dim, 1))).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    return Detections(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(rng.uniform(0, 1, (t, d)).astype(np.float32)),
        classes=jnp.asarray(rng.integers(0, 3, (t, d)).astype(np.int32)),
        embeds=jnp.asarray(e),
        valid=jnp.asarray(rng.uniform(size=(t, d)) > 0.3),
    )


def check_state_invariants(state):
    status = np.asarray(state.status)
    tid = np.asarray(state.track_id)
    assert set(np.unique(status)) <= {0, 1, 2, 3}
    # empty slots have no id; live slots have unique non-negative ids
    assert (tid[status == 0] == -1).all()
    live_ids = tid[status != 0]
    assert (live_ids >= 0).all()
    assert len(live_ids) == len(set(live_ids.tolist()))
    assert np.isfinite(np.asarray(state.mean)).all()
    assert np.isfinite(np.asarray(state.cov)).all()


def check_output_invariants(outs):
    valid = np.asarray(outs.valid)
    ids = np.asarray(outs.track_id)
    for t in range(valid.shape[0]):
        frame_ids = ids[t][valid[t]]
        assert (frame_ids >= 0).all()
        assert len(frame_ids) == len(set(frame_ids.tolist())), f"dup ids frame {t}"


@pytest.mark.slow
def test_tracker_fuzz_invariants():
    rng = np.random.default_rng(0)
    for trial, kw in enumerate([
        dict(embed_dim=0),
        dict(embed_dim=16, appearance_weight=0.4),
        dict(embed_dim=16, appearance_weight=0.4, reid_recovery=True,
             gallery_size=3),
        dict(max_tracks=8, max_detections=24),  # heavy slot pressure
    ]):
        cfg = TrackerConfig(
            max_tracks=kw.pop("max_tracks", 24),
            max_detections=kw.pop("max_detections", 16),
            n_init=2, max_age=2, **kw,
        )
        tracker = Tracker(cfg)
        dets = random_det_stream(rng, 25, cfg.max_detections, cfg.embed_dim)
        state, outs = tracker.run(dets)
        check_state_invariants(state)
        check_output_invariants(outs)
        assert int(state.next_id) >= 0


@pytest.mark.slow
def test_detector_odd_image_sizes():
    """No hidden divisibility assumptions: odd H/W through all FPN levels."""
    cfg = DetectorConfig(
        backbone="resnet18slim", image_size=(100, 172), fpn_channels=32,
        head_depth=1, pre_nms_topk=16, max_detections=8, embed_dim=0,
        dtype="float32", score_threshold=0.01,
    )
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 100, 172, 3))
    dets = runner.detect(params, images)
    assert dets.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()
