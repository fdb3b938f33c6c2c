"""TF SavedModel export (io_out/export_tf.py + export-savedmodel CLI).

The exported artifact must reproduce DetectorRunner.detect outputs after a
full save -> tf.saved_model.load round trip, with no JAX in the loop.
"""
import json

import jax
import numpy as np
import pytest

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.detector import DetectorRunner

pytestmark = pytest.mark.slow  # imports TF and compiles the detect step

DET = DetectorConfig(
    backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
    head_depth=1, embed_dim=16, dtype="float32",
)


def test_savedmodel_round_trip_matches_runner(tmp_path):
    from waymo_2d_tracking_tpu.io_out.export_tf import (
        export_savedmodel,
        load_and_run,
    )

    runner = DetectorRunner(DET)
    variables = runner.init_params(jax.random.PRNGKey(0))
    images = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 96, 3)).astype(np.float32)

    info = export_savedmodel(DET, variables, str(tmp_path / "sm"),
                             batch_size=2, platform="cpu")
    assert info["image_size"] == [64, 96]

    got = load_and_run(str(tmp_path / "sm"), images)
    want = runner.detect(variables, images)
    np.testing.assert_array_equal(got["valid"], np.asarray(want.valid))
    np.testing.assert_array_equal(got["classes"], np.asarray(want.classes))
    np.testing.assert_allclose(got["boxes"], np.asarray(want.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got["scores"], np.asarray(want.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["embeds"], np.asarray(want.embeds),
                               rtol=1e-4, atol=1e-4)


def test_cli_export_savedmodel_random_init(tmp_path, capsys):
    from waymo_2d_tracking_tpu import cli

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        "detector:\n"
        "  backbone: resnet18slim\n"
        "  image_size: [64, 96]\n"
        "  fpn_channels: 32\n"
        "  head_depth: 1\n"
        "  embed_dim: 16\n"
        "  dtype: float32\n"
    )
    out = str(tmp_path / "sm")
    cli.main(["export-savedmodel", "--config", str(cfg_yaml),
              "--out", out, "--batch", "1"])
    info = json.loads(capsys.readouterr().out)
    assert info["platform"] == "cpu" and info["batch_size"] == 1

    from waymo_2d_tracking_tpu.io_out.export_tf import load_and_run

    images = np.zeros((1, 64, 96, 3), np.float32)
    got = load_and_run(out, images)
    assert got["boxes"].shape[0] == 1 and got["valid"].dtype == np.bool_


def test_savedmodel_centernet_head_family(tmp_path):
    """Both head families export: centernet decode path serializes too."""
    from waymo_2d_tracking_tpu.io_out.export_tf import (
        export_savedmodel,
        load_and_run,
    )

    det = DetectorConfig(
        backbone="resnet18slim", image_size=(64, 96), fpn_channels=32,
        head_depth=1, embed_dim=16, dtype="float32",
        head_family="centernet",
    )
    runner = DetectorRunner(det)
    variables = runner.init_params(jax.random.PRNGKey(0))
    images = np.random.default_rng(1).uniform(
        0, 1, (1, 64, 96, 3)).astype(np.float32)
    export_savedmodel(det, variables, str(tmp_path / "sm"), batch_size=1)
    got = load_and_run(str(tmp_path / "sm"), images)
    want = runner.detect(variables, images)
    np.testing.assert_allclose(got["boxes"], np.asarray(want.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(got["valid"], np.asarray(want.valid))
