"""Weight-import tool tests (train/port_torch.py): torchvision-style state
dicts map into our flax variables with correct layout transposes, the s2d
stem conversion, and an orbax save/restore round trip. torchvision itself is
absent in this env, so the state dict is built by hand with its key naming
(the numeric conventions are already pinned by the torch-twin parity test in
test_detector.py)."""
import numpy as np
import jax
import pytest

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.train.port_torch import (
    import_weights,
    torch_to_flax_variables,
)

CFG = DetectorConfig(
    backbone="resnet18", image_size=(64, 96), fpn_channels=32,
    head_depth=2, pre_nms_topk=32, max_detections=8, embed_dim=0,
    dtype="float32",
    # conv7 pins the 1:1 kernel-layout mapping this test asserts; the
    # s2d default path is covered by test_s2d_stem_conversion_on_import
    stem="conv7",
)

_R18_STAGES = (2, 2, 2, 2)


def _make_torch_sd(rng):
    """Hand-built torchvision-resnet18-style state dict (numpy values)."""
    import torch

    sd = {}

    def conv(key, cout, cin, k):
        sd[key] = torch.from_numpy(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        )

    def bn(prefix, c):
        for suffix, val in [
            ("weight", rng.standard_normal(c)),
            ("bias", rng.standard_normal(c)),
            ("running_mean", rng.standard_normal(c)),
            ("running_var", rng.uniform(0.5, 2.0, c)),
        ]:
            sd[f"{prefix}.{suffix}"] = torch.from_numpy(val.astype(np.float32))

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage in range(4):
        w = 64 * (2 ** stage)
        for b in range(_R18_STAGES[stage]):
            p = f"layer{stage + 1}.{b}"
            conv(f"{p}.conv1.weight", w, cin if b == 0 else w, 3)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2.weight", w, w, 3)
            bn(f"{p}.bn2", w)
            if b == 0 and stage > 0:
                conv(f"{p}.downsample.0.weight", w, cin, 1)
                bn(f"{p}.downsample.1", w)
            if b == 0:
                cin = w
    return sd


def test_backbone_mapping_layout_and_stats(tmp_path):
    import torch

    rng = np.random.default_rng(0)
    sd_t = _make_torch_sd(rng)
    torch.save(sd_t, tmp_path / "r18.pth")

    runner = DetectorRunner(CFG, interpret=True)
    template = runner.init_params(jax.random.PRNGKey(0))

    from waymo_2d_tracking_tpu.train.port_torch import load_torch_state_dict

    sd = load_torch_state_dict(str(tmp_path / "r18.pth"))
    var, report = torch_to_flax_variables(sd, template, CFG)

    # stem: (64, 3, 7, 7) -> (7, 7, 3, 64)
    np.testing.assert_allclose(
        var["params"]["backbone"]["stem_conv"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    # a deep block conv + its running stats
    np.testing.assert_allclose(
        var["params"]["backbone"]["stage3_block1"]["conv2"]["kernel"],
        np.transpose(sd["layer3.1.conv2.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        var["batch_stats"]["backbone"]["stage2_block0"]["bn1"]["mean"],
        sd["layer2.0.bn1.running_mean"],
    )
    np.testing.assert_allclose(
        var["batch_stats"]["backbone"]["stage2_block0"]["downsample_bn"]["var"],
        sd["layer2.0.downsample.1.running_var"],
    )
    # every backbone torch key landed
    backbone_keys = [k for k in sd if k.startswith(("conv1", "bn1", "layer"))]
    assert set(backbone_keys) <= set(report["imported"])
    assert not report["skipped_shape"]


def test_s2d_stem_conversion_on_import():
    import dataclasses

    from waymo_2d_tracking_tpu.models.resnet import convert_stem_to_s2d

    rng = np.random.default_rng(1)
    sd = {k: v.numpy() for k, v in _make_torch_sd(rng).items()}
    cfg = dataclasses.replace(CFG, stem="s2d")
    runner = DetectorRunner(cfg, interpret=True)
    template = runner.init_params(jax.random.PRNGKey(0))
    var, _ = torch_to_flax_variables(sd, template, cfg)
    want = np.asarray(
        convert_stem_to_s2d(np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    )
    np.testing.assert_allclose(
        var["params"]["backbone"]["stem_conv"]["kernel"], want, atol=1e-6
    )


def test_import_weights_end_to_end_orbax_roundtrip(tmp_path):
    import torch
    import orbax.checkpoint as ocp

    rng = np.random.default_rng(2)
    torch.save(_make_torch_sd(rng), tmp_path / "r18.pth")
    out = tmp_path / "params"
    report = import_weights(str(tmp_path / "r18.pth"), str(out), cfg=CFG)
    assert report["n_imported"] >= 100
    restored = ocp.StandardCheckpointer().restore(str(out))
    runner = DetectorRunner(CFG, interpret=True)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 3))
    dets = runner.detect(restored, images)  # forward runs with imported params
    assert np.isfinite(np.asarray(dets.scores)).all()
