"""Detector tests (C5-C7): shapes, determinism, and torch-twin parity.

The parity test ports flax ResNet weights into an independently-written
CPU-torch twin (torch is the oracle; torchvision is absent in this env) and
checks the backbone forward to ~1e-4 — catching layout/stride/padding bugs
(SURVEY.md §4 "Numerics").
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.detector import DetectorRunner
from waymo_2d_tracking_tpu.models.resnet import ResNet

SLIM = DetectorConfig(
    backbone="resnet18slim", image_size=(128, 192), fpn_channels=64,
    head_depth=2, pre_nms_topk=64, max_detections=16, embed_dim=32,
    dtype="float32",
)


@pytest.fixture(scope="module")
def runner_and_params():
    runner = DetectorRunner(SLIM, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    return runner, params


def test_output_shapes_and_masks(runner_and_params):
    runner, params = runner_and_params
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 192, 3))
    dets = runner.detect(params, images)
    d = SLIM.max_detections
    assert dets.boxes.shape == (2, d, 4)
    assert dets.scores.shape == (2, d)
    assert dets.embeds.shape == (2, d, SLIM.embed_dim)
    v = np.asarray(dets.valid)
    # scores descending within valid, invalid slots zeroed
    s = np.asarray(dets.scores)
    for i in range(2):
        vs = s[i][v[i]]
        assert np.all(np.diff(vs) <= 0)
        assert np.all(s[i][~v[i]] == 0)
    # valid embeds L2-normalized
    e = np.asarray(dets.embeds)
    norms = np.linalg.norm(e[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_batch_item_independence(runner_and_params):
    runner, params = runner_and_params
    im1 = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 192, 3))
    im2 = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 192, 3))
    both = jnp.concatenate([im1, im2], axis=0)
    d_both = runner.detect(params, both)
    d_1 = runner.detect(params, im1)
    # XLA fuses differently per batch size: tiny numeric drift is expected
    np.testing.assert_allclose(
        np.asarray(d_both.boxes[0]), np.asarray(d_1.boxes[0]), atol=0.05, rtol=1e-2
    )


def test_boxes_inside_reasonable_range(runner_and_params):
    runner, params = runner_and_params
    images = jax.random.uniform(jax.random.PRNGKey(4), (1, 128, 192, 3))
    dets = runner.detect(params, images)
    v = np.asarray(dets.valid[0])
    b = np.asarray(dets.boxes[0])[v]
    assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])


# ---------------------------------------------------------------- torch twin


def _torch_bottleneck(torch, nn_t, cin, width, stride):
    class Bottleneck(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn_t.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn_t.BatchNorm2d(width, eps=1e-5)
            self.conv2 = nn_t.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn_t.BatchNorm2d(width, eps=1e-5)
            self.conv3 = nn_t.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn_t.BatchNorm2d(width * 4, eps=1e-5)
            self.need_proj = cin != width * 4 or stride != 1
            if self.need_proj:
                self.down_conv = nn_t.Conv2d(cin, width * 4, 1, stride=stride, bias=False)
                self.down_bn = nn_t.BatchNorm2d(width * 4, eps=1e-5)

        def forward(self, x):
            r = x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            if self.need_proj:
                r = self.down_bn(self.down_conv(x))
            return torch.relu(y + r)

    return Bottleneck()


def _port_conv(t_conv, f_kernel):
    import torch

    # flax (H, W, Cin, Cout) -> torch (Cout, Cin, H, W)
    t_conv.weight.data = torch.from_numpy(
        np.asarray(f_kernel, np.float32).transpose(3, 2, 0, 1)
    )


def _port_bn(t_bn, f_scale, f_bias, f_mean, f_var):
    import torch

    t_bn.weight.data = torch.from_numpy(np.asarray(f_scale, np.float32))
    t_bn.bias.data = torch.from_numpy(np.asarray(f_bias, np.float32))
    t_bn.running_mean.data = torch.from_numpy(np.asarray(f_mean, np.float32))
    t_bn.running_var.data = torch.from_numpy(np.asarray(f_var, np.float32))


def test_backbone_parity_vs_torch_twin():
    import torch
    import torch.nn as nn_t

    stage_sizes = (1, 1, 1, 1)
    width = 16
    model = ResNet(stage_sizes=stage_sizes, width=width, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3))
    variables = model.init(rng, x)
    # force full-f32 convolutions: the default precision uses a bf16 fast
    # path (even on CPU) which is fine for production but not for parity
    with jax.default_matmul_precision("float32"):
        feats = model.apply(variables, x)

    params = variables["params"]
    stats = variables["batch_stats"]

    # build + port torch twin
    stem_conv = nn_t.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
    stem_bn = nn_t.BatchNorm2d(width, eps=1e-5)
    _port_conv(stem_conv, params["stem_conv"]["kernel"])
    _port_bn(stem_bn, params["stem_bn"]["scale"], params["stem_bn"]["bias"],
             stats["stem_bn"]["mean"], stats["stem_bn"]["var"])
    stem_bn.eval()  # else torch BN normalizes by batch stats, not running stats
    pool = nn_t.MaxPool2d(3, stride=2, padding=1)

    blocks = []
    cin = width
    for stage in range(4):
        w_s = width * (2 ** stage)
        stride = 1 if stage == 0 else 2
        blk = _torch_bottleneck(torch, nn_t, cin, w_s, stride)
        name = f"stage{stage + 1}_block0"
        p, s = params[name], stats[name]
        _port_conv(blk.conv1, p["conv1"]["kernel"])
        _port_conv(blk.conv2, p["conv2"]["kernel"])
        _port_conv(blk.conv3, p["conv3"]["kernel"])
        _port_bn(blk.bn1, p["bn1"]["scale"], p["bn1"]["bias"], s["bn1"]["mean"], s["bn1"]["var"])
        _port_bn(blk.bn2, p["bn2"]["scale"], p["bn2"]["bias"], s["bn2"]["mean"], s["bn2"]["var"])
        _port_bn(blk.bn3, p["bn3"]["scale"], p["bn3"]["bias"], s["bn3"]["mean"], s["bn3"]["var"])
        if blk.need_proj:
            _port_conv(blk.down_conv, p["downsample_conv"]["kernel"])
            _port_bn(blk.down_bn, p["downsample_bn"]["scale"], p["downsample_bn"]["bias"],
                     s["downsample_bn"]["mean"], s["downsample_bn"]["var"])
        blocks.append(blk)
        cin = w_s * 4

    with torch.no_grad():
        t = torch.from_numpy(np.asarray(x, np.float32).transpose(0, 3, 1, 2))
        t = pool(torch.relu(stem_bn(stem_conv(t))))
        torch_feats = {}
        for stage, blk in enumerate(blocks):
            blk.eval()
            t = blk(t)
            torch_feats[stage + 2] = t.numpy().transpose(0, 2, 3, 1)

    for lvl in (2, 3, 4, 5):
        np.testing.assert_allclose(
            np.asarray(feats[lvl], np.float32),
            torch_feats[lvl],
            atol=2e-4,
            rtol=1e-3,
            err_msg=f"level C{lvl}",
        )


@pytest.mark.slow
def test_backbone_family_shapes():
    """Every backbone variant produces a C2..C5 pyramid with right strides."""
    from waymo_2d_tracking_tpu.models import resnet as rn

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    for name, factory, c5 in [
        ("resnet18", rn.ResNet18, 512),
        ("resnet34", rn.ResNet34, 512),
        ("resnet50", rn.ResNet50, 2048),
    ]:
        m = factory(dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(1), x)
        feats = m.apply(v, x)
        assert feats[2].shape == (1, 16, 24, c5 // 8), name
        assert feats[5].shape == (1, 2, 3, c5), name


def test_decode_level_geometry():
    from waymo_2d_tracking_tpu.models.heads import decode_level

    # one location (0,0) at stride 8: center (4, 4); ltrb (1,2,3,4) in
    # stride units -> pixels (8,16,24,32) -> box (-4, -12, 28, 36)
    ltrb = jnp.asarray([[[[1.0, 2.0, 3.0, 4.0]]]])
    box = np.asarray(decode_level(ltrb, stride=8))[0, 0, 0]
    np.testing.assert_allclose(box, [4 - 8, 4 - 16, 4 + 24, 4 + 32])


def test_s2d_stem_weight_equivalence():
    """space-to-depth 4x4/s1 stem with converted weights must reproduce the
    7x7/s2 stem exactly (same arithmetic, reordered)."""
    from flax import linen as nn
    from waymo_2d_tracking_tpu.models.resnet import (
        convert_stem_to_s2d,
        space_to_depth_2x2,
    )

    rng = np.random.default_rng(0)
    k7 = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 3)).astype(np.float32))

    conv7 = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=jnp.float32)
    y7 = conv7.apply({"params": {"kernel": k7}}, x)

    k4 = convert_stem_to_s2d(k7)
    conv4 = nn.Conv(8, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)],
                    use_bias=False, dtype=jnp.float32)
    y4 = conv4.apply({"params": {"kernel": k4}}, space_to_depth_2x2(x))

    assert y4.shape == y7.shape
    with jax.default_matmul_precision("float32"):
        np.testing.assert_allclose(np.asarray(y4), np.asarray(y7),
                                   atol=1e-4, rtol=1e-4)


def test_s2d_resnet_runs():
    from waymo_2d_tracking_tpu.models.resnet import ResNet

    m = ResNet(stage_sizes=(1, 1, 1, 1), width=16, stem="s2d", dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(1), x)
    feats = m.apply(v, x)
    assert feats[2].shape == (1, 16, 24, 64)


def test_detector_config_s2d_stem_and_head_channels():
    """DetectorConfig.stem/head_channels are threaded through (round-2 wiring
    of the s2d stem — VERDICT r1 weak #2: it was dead code without a config
    field)."""
    import dataclasses

    cfg = dataclasses.replace(SLIM, stem="s2d", head_channels=32, embed_dim=0)
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    # s2d stem kernel is (4, 4, 12, width); conv7 would be (7, 7, 3, width)
    stem_k = params["params"]["backbone"]["stem_conv"]["kernel"]
    assert stem_k.shape[:3] == (4, 4, 12)
    # head tower width follows head_channels, not fpn_channels
    tower_k = params["params"]["heads"]["cls_tower"]["conv0"]["kernel"]
    assert tower_k.shape[-1] == 32
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 192, 3))
    dets = runner.detect(params, images)
    assert dets.boxes.shape == (1, cfg.max_detections, 4)


def test_detector_reid_multilevel_runs_and_valid_embeds():
    import dataclasses

    cfg = dataclasses.replace(SLIM, reid_multilevel=True)
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 192, 3))
    dets = runner.detect(params, images)
    v = np.asarray(dets.valid)
    e = np.asarray(dets.embeds)
    if v.any():
        norms = np.linalg.norm(e[v], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_detector_topk_method_approx_smoke():
    import dataclasses

    cfg = dataclasses.replace(SLIM, topk_method="approx", embed_dim=0)
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 192, 3))
    dets = runner.detect(params, images)
    assert np.asarray(dets.scores).shape == (1, cfg.max_detections)


def test_detector_reid_channels_slim_tower():
    """reid_channels thins the ReID tower (round-2 perf lever: at 256 the
    two 7x7 ReID convs are ~14 GFLOP/frame for 128 dets; see
    tools/flops_budget.py). 0 keeps the fpn_channels default."""
    import dataclasses

    cfg = dataclasses.replace(SLIM, reid_channels=32)
    runner = DetectorRunner(cfg, interpret=True)
    params = runner.init_params(jax.random.PRNGKey(0))
    k0 = params["params"]["reid"]["conv0"]["kernel"]
    assert k0.shape[-2:] == (SLIM.fpn_channels, 32)   # in from FPN, out slim
    k1 = params["params"]["reid"]["conv1"]["kernel"]
    assert k1.shape[-2:] == (32, 32)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 192, 3))
    dets = runner.detect(params, images)
    v = np.asarray(dets.valid)
    if v.any():
        norms = np.linalg.norm(np.asarray(dets.embeds)[v], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
