"""Inference fan-out over the mesh (C28 / SURVEY.md §2.2 per-segment
sharding): a camera/frame batch sharded across the 'data' axis produces the
same detections as an unsharded run — segments are embarrassingly parallel
and XLA partitions the batched forward without any custom comm code."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.parallel import sharding as shd

CFG = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=0,
    dtype="float32", score_threshold=0.01,
)


@pytest.mark.slow
def test_sharded_batch_detection_matches_unsharded():
    mesh = shd.make_mesh()
    runner = DetectorRunner(CFG)
    params = runner.init_params(jax.random.PRNGKey(0), batch_size=8)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 96, 3))

    plain = runner.detect(params, images)

    params_r = shd.replicate(params, mesh)
    images_s = jax.device_put(images, shd.batch_sharding(mesh))
    assert len(images_s.addressable_shards) == 8
    sharded = runner.detect(params_r, images_s)

    np.testing.assert_allclose(
        np.asarray(plain.boxes), np.asarray(sharded.boxes), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(plain.valid), np.asarray(sharded.valid)
    )


def test_multi_segment_tracker_fanout_vmap():
    """Independent per-segment tracker states advance under one vmapped step
    over a sharded segment axis (the per-segment inference fan-out shape)."""
    from waymo_2d_tracking_tpu.config import TrackerConfig
    from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
    from waymo_2d_tracking_tpu.tracker import init_state, track_step

    cfg = TrackerConfig(max_tracks=16, max_detections=16, embed_dim=0)
    n_seg = 8
    clips = [
        generate_clip(SyntheticClipConfig(num_frames=6, num_objects=3,
                                          max_detections=16, embed_dim=1,
                                          seed=s))[0]
        for s in range(n_seg)
    ]
    dets = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *clips)  # (SEG, T, ...)

    mesh = shd.make_mesh()
    dets = jax.tree.map(lambda x: jax.device_put(x, shd.batch_sharding(mesh)), dets)

    states = jax.tree.map(
        lambda x: jnp.stack([x] * n_seg), init_state(cfg)
    )

    @jax.jit
    def run(states, dets):
        def seg_scan(state, det_seq):
            return jax.lax.scan(lambda c, d: track_step(c, d, cfg), state, det_seq)

        return jax.vmap(seg_scan)(states, dets)

    final, outs = run(states, dets)
    assert outs.valid.shape == (n_seg, 6, 16)
    # each segment tracked its own objects
    per_seg = np.asarray(outs.valid).any(axis=(1, 2))
    assert per_seg.all()
