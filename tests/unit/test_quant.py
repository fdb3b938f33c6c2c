"""Int8 PTQ unit tests (VERDICT r3 item 1a; models/quant.py).

Decision measurement behind the feature: tools/perf_int8.py — e2e
headline float vs int8 on the chip. The QuantConv contract tested here:
'off' is bit-identical to nn.Conv, 'calib' records a running absmax,
'int8' serves within PTQ tolerance of float, and uncalibrated int8
serving is an ERROR everywhere (ADVICE r3 high).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from waymo_2d_tracking_tpu.config import (
    Config,
    DetectorConfig,
    PipelineConfig,
    TrackerConfig,
)
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.models.quant import (
    QuantConv,
    is_calibrated,
    make_conv,
    quantize_symmetric,
)

SLIM_INT8 = Config(
    detector=DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, pre_nms_topk=32, max_detections=8, embed_dim=16,
        reid_channels=32, dtype="float32", score_threshold=0.01,
        quant="int8",
    ),
    tracker=TrackerConfig(max_tracks=16, max_detections=8, embed_dim=16,
                          score_threshold=0.0, birth_score_threshold=0.0,
                          n_init=1),
    pipeline=PipelineConfig(chunk_frames=2),
)


def _conv_pair(mode):
    kw = dict(features=8, kernel_size=(3, 3), dtype=jnp.float32)
    return make_conv("off", **kw), make_conv(mode, **kw)


def test_quantconv_off_mode_is_plain_nn_conv():
    conv = make_conv("off", features=8, kernel_size=(3, 3))
    assert isinstance(conv, nn.Conv)


def test_quantconv_calib_float_path_bit_identical():
    """'calib' mode's conv output is bit-identical to nn.Conv (it only adds
    absmax recording on the side)."""
    ref, calib = _conv_pair("calib")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 24, 4)),
                    jnp.float32)
    p_ref = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(p_ref, x)
    variables = {"params": p_ref["params"]}
    y_calib, upd = calib.apply(variables, x, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_calib))
    absmax = float(jax.tree_util.tree_leaves(upd["quant"])[0])
    assert absmax == pytest.approx(float(jnp.max(jnp.abs(x))))


def test_calibration_accumulates_running_max():
    _, calib = _conv_pair("calib")
    x1 = jnp.full((1, 8, 8, 4), 2.0, jnp.float32)
    x2 = jnp.full((1, 8, 8, 4), 5.0, jnp.float32)
    x3 = jnp.full((1, 8, 8, 4), 3.0, jnp.float32)
    variables = calib.init(jax.random.PRNGKey(0), x1)
    for x in (x1, x2, x3):
        _, upd = calib.apply(variables, x, mutable=["quant"])
        variables = {**variables, "quant": upd["quant"]}
    absmax = float(jax.tree_util.tree_leaves(variables["quant"])[0])
    assert absmax == pytest.approx(5.0)


def test_int8_conv_close_to_float():
    """w8a8 conv with a calibrated scale stays within per-tensor PTQ error
    of the float conv (~1% of the activation range at these magnitudes)."""
    ref, q = _conv_pair("int8")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 4)), jnp.float32)
    p = ref.init(jax.random.PRNGKey(1), x)
    y_ref = np.asarray(ref.apply(p, x))
    variables = {
        "params": p["params"],
        "quant": {"act_absmax": jnp.max(jnp.abs(x))},
    }
    y_q = np.asarray(q.apply(variables, x))
    scale = np.abs(y_ref).max()
    assert np.abs(y_q - y_ref).max() < 0.02 * scale


def test_quantize_symmetric_saturates():
    x = jnp.asarray([-300.0, -1.0, 0.0, 0.5, 300.0])
    q = np.asarray(quantize_symmetric(x, jnp.asarray(1.0)))
    np.testing.assert_array_equal(q, [-127, -1, 0, 0, 127])
    assert q.dtype == np.int8


def test_is_calibrated_states():
    params = {"params": {"w": jnp.ones(3)}}
    assert not is_calibrated(params)                      # no collection
    params["quant"] = {"c": {"act_absmax": jnp.zeros(())}}
    assert not is_calibrated(params)                      # zero absmax
    params["quant"] = {"c": {"act_absmax": jnp.ones(())}}
    assert is_calibrated(params)


@pytest.fixture(scope="module")
def int8_runner_and_params():
    runner = DetectorRunner(SLIM_INT8.detector, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0), batch_size=2)
    return runner, params


def test_uncalibrated_int8_detect_raises(int8_runner_and_params):
    """The guard models/quant.py documents: serving uncalibrated int8 is an
    ERROR, not silent wrong-scale output (ADVICE r3 high/medium)."""
    runner, params = int8_runner_and_params
    images = jnp.zeros((2, 64, 96, 3), jnp.float32)
    with pytest.raises(RuntimeError, match="calibrat"):
        runner.detect(params, images)


def test_calibrated_int8_detect_close_to_float(int8_runner_and_params):
    runner, params = int8_runner_and_params
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    calibrated = runner.calibrate(params, images)
    assert is_calibrated(calibrated)
    dets_q = runner.detect(calibrated, images)  # guard passes

    float_runner = DetectorRunner(
        dataclasses.replace(SLIM_INT8.detector, quant="off"),
        interpret=True,
    )
    dets_f = float_runner.detect(params, images)
    # same candidate structure; scores within PTQ tolerance
    assert dets_q.boxes.shape == dets_f.boxes.shape
    assert float(jnp.max(jnp.abs(dets_q.scores - dets_f.scores))) < 0.1


def test_online_tracker_auto_calibrates(int8_runner_and_params):
    """OnlineTracker serves int8 without manual calibration — the first
    real frame calibrates (the round-3 silent-garbage path, ADVICE r3)."""
    from waymo_2d_tracking_tpu.pipeline.online import OnlineTracker

    _, params = int8_runner_and_params
    sess = OnlineTracker(SLIM_INT8, params=params)
    frame = np.random.default_rng(1).integers(
        0, 255, (64, 96, 3), dtype=np.uint8)
    sess.step(frame, 1000)       # must not raise; calibrates internally
    assert sess._calibrated
    assert is_calibrated(sess.params)
    sess.step(frame, 2000)       # steady state


def test_multicam_pipeline_auto_calibrates(int8_runner_and_params):
    from waymo_2d_tracking_tpu.pipeline.multicam import MultiCamPipeline

    _, params = int8_runner_and_params
    pipe = MultiCamPipeline(SLIM_INT8, num_cams=2, params=params)
    frames = np.random.default_rng(2).integers(
        0, 255, (3, 2, 64, 96, 3), dtype=np.uint8)
    states, outputs, _ = pipe.run(frames)
    assert pipe._calibrated
    assert is_calibrated(pipe.params)
    assert outputs.valid.shape[0] == 3


def test_export_refuses_uncalibrated_int8(int8_runner_and_params, tmp_path):
    from waymo_2d_tracking_tpu.io_out.export_tf import make_detect_fn

    _, params = int8_runner_and_params
    with pytest.raises(RuntimeError, match="calibrat"):
        make_detect_fn(SLIM_INT8.detector, params, platform="cpu")


def test_calibration_survives_zero_valid_detections():
    """Review r4: an online int8 session calibrates on exactly ONE first
    frame. If that frame has no detections above score_threshold (dark or
    empty scene), the ReID pooled-feature masking must NOT zero the whole
    calibration batch — absmax 0 would read as 'uncalibrated' and the
    serving guard would crash a legitimate stream. The fallback keeps the
    unmasked RoIAlign artifacts for that degenerate case."""
    cfg = dataclasses.replace(SLIM_INT8.detector, score_threshold=0.999999)
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    calibrated = runner.calibrate(params, images)
    assert is_calibrated(calibrated)
    runner.detect(calibrated, images)  # guard passes, no raise
